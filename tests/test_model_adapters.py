"""Pluggable LM adapters (harness/models.py): HF-torch causal scoring
parity, API adapters over an injected transport."""

import math

import numpy as np
import pytest

from llama3_quantization_tpu.eval.harness import (
    GPT3LM,
    HFCausalLM,
    MODEL_REGISTRY,
    TextSynthLM,
    simple_evaluate,
)


class CharTok:
    """Byte-level tokenizer stub with the HF-ish surface the adapter uses."""

    eos_token_id = 0

    def encode(self, s):
        return [1 + b for b in s.encode()][:64]

    def decode(self, toks):
        return bytes(max(0, t - 1) for t in toks if t != 0).decode(errors="ignore")


@pytest.fixture(scope="module")
def hf_lm():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=260, n_positions=128, n_embd=32, n_layer=2, n_head=2
    )
    return HFCausalLM(model=GPT2LMHeadModel(cfg), tokenizer=CharTok(), batch_size=4)


def test_hf_causal_loglikelihood_matches_manual(hf_lm):
    torch = pytest.importorskip("torch")
    ctx, cont = "abc", "de"
    (ll, greedy), = hf_lm.loglikelihood([(ctx, cont)])
    toks = hf_lm.tok_encode(ctx + cont)
    with torch.no_grad():
        logits = hf_lm.model(torch.tensor([toks[:-1]])).logits
        lp = torch.log_softmax(logits.float(), -1)
    n_cont = len(hf_lm.tok_encode(cont))
    want = sum(
        float(lp[0, i, toks[i + 1]]) for i in range(len(toks) - n_cont - 1, len(toks) - 1)
    )
    assert math.isfinite(ll)
    np.testing.assert_allclose(ll, want, rtol=1e-5, atol=1e-5)
    assert isinstance(greedy, bool)


def test_hf_causal_runs_task(hf_lm):
    docs = [
        {"goal": f"do {i}", "sol1": f"aa{i}", "sol2": f"bb{i}", "label": i % 2}
        for i in range(4)
    ]
    res = simple_evaluate(
        hf_lm, tasks=["piqa"], task_data={"piqa": {"train": docs, "validation": docs}},
        num_fewshot=0,
    )
    assert 0.0 <= res["results"]["piqa"]["acc"] <= 1.0


def test_hf_causal_greedy_until(hf_lm):
    (out,) = hf_lm.greedy_until([("ab", ["\n"])])
    assert isinstance(out, str)


def _gpt3_fake_http(url, payload, headers):
    assert headers["Authorization"].startswith("Bearer ")
    if payload.get("max_tokens") == 0:  # scoring call (echo=True)
        prompt = payload["prompt"]
        # pretend tokens are 2-char chunks
        tokens = [prompt[i : i + 2] for i in range(0, len(prompt), 2)]
        offsets, off = [], 0
        for t in tokens:
            offsets.append(off)
            off += len(t)
        return {
            "choices": [
                {
                    "logprobs": {
                        "tokens": tokens,
                        "text_offset": offsets,
                        "token_logprobs": [None] + [-0.5] * (len(tokens) - 1),
                        "top_logprobs": [None] + [{t: -0.5} for t in tokens[1:]],
                    }
                }
            ]
        }
    return {"choices": [{"text": "generated"}]}


def test_gpt3_adapter_scores_continuation_only():
    lm = GPT3LM(engine="davinci", api_key="k", http=_gpt3_fake_http)
    ((ll, greedy),) = lm.loglikelihood([("abcd", "efgh")])
    # continuation = 2 fake tokens at -0.5 each
    np.testing.assert_allclose(ll, -1.0)
    assert greedy is True
    (out,) = lm.greedy_until([("abcd", ["\n"])])
    assert out == "generated"


def test_textsynth_adapter():
    def fake_http(url, payload, headers):
        if url.endswith("/logprob"):
            assert payload == {"context": "ctx", "continuation": "cont"}
            return {"logprob": -2.5, "is_greedy": False}
        return {"text": "done"}

    lm = TextSynthLM(engine="gptj_6B", api_key="k", http=fake_http)
    assert lm.loglikelihood([("ctx", "cont")]) == [(-2.5, False)]
    assert lm.greedy_until([("x", "\n")]) == ["done"]
    with pytest.raises(NotImplementedError):
        lm.loglikelihood_rolling(["text"])


def test_registry_rows():
    for name in ("jax", "dummy", "hf-causal", "gpt2", "gpt3", "textsynth"):
        assert name in MODEL_REGISTRY


def test_hf_seq2seq_adapter():
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5ForConditionalGeneration

    from llama3_quantization_tpu.eval.harness import HFSeq2SeqLM

    torch.manual_seed(0)
    cfg = T5Config(
        vocab_size=260, d_model=32, d_ff=64, num_layers=2, num_heads=2, d_kv=16,
        decoder_start_token_id=0,
    )
    lm = HFSeq2SeqLM(model=T5ForConditionalGeneration(cfg), tokenizer=CharTok())
    (ll, greedy), = lm.loglikelihood([("translate: abc", "xyz")])
    assert math.isfinite(ll) and isinstance(greedy, bool)
    (roll,) = lm.loglikelihood_rolling(["some document"])
    assert math.isfinite(roll)
    (out,) = lm.greedy_until([("abc", ["\n"])])
    assert isinstance(out, str)
