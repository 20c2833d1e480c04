"""Harness plumbing tests with DummyLM + a real JAXLM on tiny models,
using injected (offline) task documents."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama3_quantization_tpu.eval.harness import (
    DummyLM,
    JAXLM,
    make_table,
    simple_evaluate,
)
from llama3_quantization_tpu.eval.harness.base import Request, rf
from llama3_quantization_tpu.eval.harness.lm import (
    get_rolling_token_windows,
    make_disjoint_window,
)
from llama3_quantization_tpu.eval.harness.tasks import TASK_REGISTRY


PIQA_DOCS = [
    {"goal": f"do thing {i}", "sol1": f"option a{i}", "sol2": f"option b{i}", "label": i % 2}
    for i in range(6)
]
ARC_DOCS = [
    {
        "id": str(i),
        "question": f"what is {i}+{i}?",
        "choices": {"text": [str(i), str(2 * i), str(3 * i)], "label": ["A", "B", "C"]},
        "answerKey": "B",
    }
    for i in range(5)
]
WINO_DOCS = [
    {
        "sentence": f"The trophy{i} doesn't fit in the case because _ is too big.",
        "option1": "the trophy",
        "option2": "the case",
        "answer": "1",
    }
    for i in range(4)
]
BOOLQ_DOCS = [
    {"passage": f"Fact {i} is stated.", "question": f"is fact {i} stated", "label": i % 2}
    for i in range(4)
]
MMLU_DOCS = [
    {"question": f"Q{i}", "choices": ["w", "x", "y", "z"], "answer": i % 4} for i in range(4)
]

TASK_DATA = {
    "piqa": {"train": PIQA_DOCS, "validation": PIQA_DOCS},
    "arc_easy": {"train": ARC_DOCS, "validation": ARC_DOCS, "test": ARC_DOCS},
    "winogrande": {"train": WINO_DOCS, "validation": WINO_DOCS},
    "boolq": {"train": BOOLQ_DOCS, "validation": BOOLQ_DOCS},
    "hendrycksTest-anatomy": {"test": MMLU_DOCS, "validation": MMLU_DOCS, "dev": MMLU_DOCS},
    "wikitext": {"train": ["doc one text here"], "test": ["a b c d e f g h i j k l"]},
}


def test_registry_has_study_tasks():
    for name in ["piqa", "arc_easy", "arc_challenge", "hellaswag", "winogrande", "wikitext"]:
        assert name in TASK_REGISTRY
    assert sum(1 for k in TASK_REGISTRY if k.startswith("hendrycksTest-")) == 57


def test_request_promises():
    r = rf.loglikelihood("ctx", "cont")
    assert r[0].index == 0 and r[1].index == 1
    with pytest.raises(NotImplementedError):
        Request("bogus", ())


def test_rolling_windows():
    toks = list(range(10))
    windows = [
        make_disjoint_window(w)
        for w in get_rolling_token_windows(toks, prefix_token=-1, max_seq_len=4, context_len=1)
    ]
    # all tokens predicted exactly once
    predicted = [t for _, pred in windows for t in pred]
    assert predicted == toks
    assert windows[0][0][0] == -1  # first window starts with prefix token


def test_dummy_eval_all_tasks():
    lm = DummyLM()
    res = simple_evaluate(
        lm,
        tasks=["piqa", "arc_easy", "winogrande", "boolq", "hendrycksTest-anatomy"],
        task_data=TASK_DATA,
        bootstrap_iters=10,
    )
    for t in ["piqa", "arc_easy", "winogrande", "boolq", "hendrycksTest-anatomy"]:
        assert "acc" in res["results"][t]
    table = make_table(res)
    assert "piqa" in table


def test_pattern_expansion():
    lm = DummyLM()
    res = simple_evaluate(
        lm,
        tasks="hendrycksTest-anatomy",
        task_data=TASK_DATA,
        bootstrap_iters=10,
    )
    assert "hendrycksTest-anatomy" in res["results"]


def test_unknown_task_raises():
    with pytest.raises(KeyError):
        simple_evaluate(DummyLM(), tasks=["nope_task"])


@pytest.fixture(scope="module")
def jaxlm():
    from llama3_quantization_tpu.eval.data import ByteTokenizer
    from llama3_quantization_tpu.models import TINY_LLAMA, init_params
    import dataclasses

    cfg = dataclasses.replace(TINY_LLAMA, vocab_size=300)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return JAXLM(params, cfg, ByteTokenizer(), batch_size=4, max_length=128)


def test_jaxlm_loglikelihood_consistency(jaxlm):
    """Sum of per-token logprobs must match direct forward computation."""
    from llama3_quantization_tpu.models.transformer import forward_logits

    ctx, cont = "hello wor", "ld"
    (ll, greedy), = jaxlm.loglikelihood([(ctx, cont)])
    ids = jaxlm.tok_encode(ctx + cont)
    toks = jnp.asarray(np.asarray(ids[:-1], dtype=np.int32)[None, :])
    logits = np.asarray(forward_logits(jaxlm.params, toks, jaxlm.cfg), dtype=np.float64)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    n_cont = len(jaxlm.tok_encode(cont))
    want = sum(logp[0, len(ids) - 1 - n_cont + i, ids[len(ids) - n_cont + i]] for i in range(n_cont))
    assert abs(ll - want) < 1e-2


def test_jaxlm_rolling(jaxlm):
    (ll,) = jaxlm.loglikelihood_rolling(["some long text to score here"])
    assert np.isfinite(ll) and ll < 0


def test_jaxlm_greedy_until(jaxlm):
    (out,) = jaxlm.greedy_until([("abc", ["\x00"])])
    assert isinstance(out, str)


def test_jaxlm_batch_order_stability(jaxlm):
    """Reorderer must restore original order across a mixed-length batch."""
    reqs = [("a" * (3 + 5 * i), "zz") for i in range(7)]
    res = jaxlm.loglikelihood(reqs)
    res_single = [jaxlm.loglikelihood([r])[0] for r in reqs]
    for (ll_a, _), (ll_b, _) in zip(res, res_single):
        assert abs(ll_a - ll_b) < 1e-2


def test_full_eval_with_jaxlm(jaxlm):
    res = simple_evaluate(
        jaxlm, tasks=["piqa", "wikitext"], task_data=TASK_DATA, bootstrap_iters=10
    )
    assert 0 <= res["results"]["piqa"]["acc"] <= 1
    assert res["results"]["wikitext"]["word_perplexity"] > 0


def test_decontamination_hook(tmp_path):
    """Docs overlapping stored training n-grams are excluded from the
    *_decontaminate metric variants."""
    import pickle

    from llama3_quantization_tpu.decontamination import word_ngrams

    # contaminate the first piqa doc's goal (> 13 words so a 13-gram exists)
    long_goal = " ".join(f"word{i}" for i in range(20))
    docs = [dict(PIQA_DOCS[0], goal=long_goal)] + PIQA_DOCS[1:]
    grams = word_ngrams(long_goal, 13)
    pkl = tmp_path / "train_grams.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(set(grams), f)

    lm = DummyLM()
    res = simple_evaluate(
        lm,
        tasks=["piqa"],
        task_data={"piqa": {"train": docs, "validation": docs}},
        bootstrap_iters=10,
        decontamination_ngrams_path=str(pkl),
    )
    r = res["results"]["piqa"]
    assert "acc_decontaminate" in r
    # one of six docs dropped from the decontaminated aggregate
    assert 0 <= r["acc_decontaminate"] <= 1


def test_extra_mc_tasks():
    copa_docs = [
        {"premise": "The man ate too much.", "question": "cause",
         "choice1": "He was hungry", "choice2": "He was full", "label": 0}
        for _ in range(3)
    ]
    obqa_docs = [
        {"id": str(i), "question_stem": f"q{i}",
         "choices": {"text": ["a", "b", "c", "d"], "label": ["A", "B", "C", "D"]},
         "answerKey": "B"} for i in range(3)
    ]
    sciq_docs = [
        {"question": f"why {i}", "support": "facts.",
         "distractor1": "x", "distractor2": "y", "distractor3": "z",
         "correct_answer": "w"} for i in range(3)
    ]
    res = simple_evaluate(
        DummyLM(),
        tasks=["copa", "openbookqa", "sciq"],
        task_data={
            "copa": {"train": copa_docs, "validation": copa_docs},
            "openbookqa": {"train": obqa_docs, "validation": obqa_docs, "test": obqa_docs},
            "sciq": {"train": sciq_docs, "validation": sciq_docs, "test": sciq_docs},
        },
        bootstrap_iters=10,
    )
    for t in ("copa", "openbookqa", "sciq"):
        assert "acc" in res["results"][t]


GLUE_SG_DATA = {
    "cola": {"train": [{"sentence": f"s{i}", "label": i % 2} for i in range(4)],
             "validation": [{"sentence": f"s{i}", "label": i % 2} for i in range(4)]},
    "sst": {"train": [{"sentence": f"mov{i}", "label": i % 2} for i in range(4)],
            "validation": [{"sentence": f"mov{i}", "label": i % 2} for i in range(4)]},
    "mrpc": {"train": [{"sentence1": f"a{i}", "sentence2": f"b{i}", "label": i % 2} for i in range(4)],
             "validation": [{"sentence1": f"a{i}", "sentence2": f"b{i}", "label": i % 2} for i in range(4)]},
    "qqp": {"train": [{"question1": f"q{i}", "question2": f"p{i}", "label": i % 2} for i in range(4)],
            "validation": [{"question1": f"q{i}", "question2": f"p{i}", "label": i % 2} for i in range(4)]},
    "mnli": {"train": [{"premise": f"p{i}", "hypothesis": f"h{i}", "label": i % 3} for i in range(6)],
             "validation_matched": [{"premise": f"p{i}", "hypothesis": f"h{i}", "label": i % 3} for i in range(6)]},
    "qnli": {"train": [{"question": f"q{i}", "sentence": f"s{i}", "label": i % 2} for i in range(4)],
             "validation": [{"question": f"q{i}", "sentence": f"s{i}", "label": i % 2} for i in range(4)]},
    "rte": {"train": [{"sentence1": f"a{i}", "sentence2": f"b{i}", "label": i % 2} for i in range(4)],
            "validation": [{"sentence1": f"a{i}", "sentence2": f"b{i}", "label": i % 2} for i in range(4)]},
    "wnli": {"train": [{"sentence1": f"a{i}", "sentence2": f"b{i}", "label": i % 2} for i in range(4)],
             "validation": [{"sentence1": f"a{i}", "sentence2": f"b{i}", "label": i % 2} for i in range(4)]},
    "cb": {"train": [{"premise": f"p{i}", "hypothesis": f"h{i}", "label": i % 3} for i in range(6)],
           "validation": [{"premise": f"p{i}", "hypothesis": f"h{i}", "label": i % 3} for i in range(6)]},
    "wic": {"train": [{"sentence1": f"the bank {i}", "sentence2": f"a bank {i}",
                       "start1": 4, "end1": 8, "label": i % 2} for i in range(4)],
            "validation": [{"sentence1": f"the bank {i}", "sentence2": f"a bank {i}",
                            "start1": 4, "end1": 8, "label": i % 2} for i in range(4)]},
    "wsc": {"train": [{"text": f"Ann told Sue that it {i}.", "span1_text": "Ann",
                       "span2_text": "it", "span2_index": 3, "label": i % 2} for i in range(4)],
            "validation": [{"text": f"Ann told Sue that it {i}.", "span1_text": "Ann",
                            "span2_text": "it", "span2_index": 3, "label": i % 2} for i in range(4)]},
    "multirc": {"train": [{"paragraph": f"P{i}", "question": f"Q{i // 2}", "answer": f"A{i}",
                           "label": i % 2, "idx": {"paragraph": 0, "question": i // 2}} for i in range(6)],
                "validation": [{"paragraph": f"P{i}", "question": f"Q{i // 2}", "answer": f"A{i}",
                                "label": i % 2, "idx": {"paragraph": 0, "question": i // 2}} for i in range(6)]},
}


def test_glue_superglue_dummy_eval():
    """All GLUE/SuperGLUE tasks run end-to-end on injected docs and emit
    their declared metrics."""
    lm = DummyLM()
    res = simple_evaluate(lm, tasks=sorted(GLUE_SG_DATA), task_data=GLUE_SG_DATA, num_fewshot=0)
    for name in GLUE_SG_DATA:
        assert name in res["results"], name
        for metric, value in res["results"][name].items():
            if metric.endswith("_stderr"):
                continue
            assert np.isfinite(value), (name, metric, value)
    assert "f1" in res["results"]["cb"]
    assert "mcc" in res["results"]["cola"]
    assert "f1" in res["results"]["mrpc"]


def test_f1_macro_perfect_and_degenerate():
    from llama3_quantization_tpu.eval.harness import metrics

    assert metrics.f1_macro([(0, 0), (1, 1), (2, 2)]) == 1.0
    assert metrics.f1_macro([(0, 1), (1, 0)]) == 0.0


def test_blimp_pile_translation_crows_dummy_eval():
    """New task families run end-to-end: minimal pairs, rolling perplexity,
    generative translation with sacrebleu aggregation, bias pairs."""
    data = {
        "blimp_adjunct_island": {
            "train": [{"sentence_good": f"good {i}.", "sentence_bad": f"bad {i}."}
                      for i in range(4)],
        },
        "pile_github": {
            "validation": [{"text": "def f():\n    return 1\n"}],
            "test": [{"text": "int main() { return 0; }"}],
        },
        "wmt14-fr-en": {
            "test": [{"translation": {"fr": f"bonjour {i}", "en": f"hello {i}"}}
                     for i in range(3)],
        },
        "crows_pairs_english": {
            "test": [{"sent_more": f"more {i}.", "sent_less": f"less {i}."}
                     for i in range(4)],
        },
    }
    res = simple_evaluate(DummyLM(), tasks=sorted(data), task_data=data, num_fewshot=0)
    r = res["results"]
    assert 0.0 <= r["blimp_adjunct_island"]["acc"] <= 1.0
    assert np.isfinite(r["pile_github"]["word_perplexity"])
    assert np.isfinite(r["pile_github"]["bits_per_byte"])
    assert r["wmt14-fr-en"]["bleu"] >= 0.0  # corpus bleu of "lol" predictions
    assert 0.0 <= r["crows_pairs_english"]["pct_stereotype"] <= 1.0


def test_task_registry_families_complete():
    from llama3_quantization_tpu.eval.harness.tasks import (
        BLIMP_PHENOMENA,
        PILE_SUBSETS,
        TASK_REGISTRY,
    )

    assert len(BLIMP_PHENOMENA) == 67
    assert len([k for k in TASK_REGISTRY if k.startswith("blimp_")]) == 67
    assert len([k for k in TASK_REGISTRY if k.startswith("pile_")]) == len(PILE_SUBSETS)
    for name in ("lambada_standard", "lambada_cloze", "wmt16-de-en", "crows_pairs_french"):
        assert name in TASK_REGISTRY
    # every registered class instantiates lazily without dataset access
    t = TASK_REGISTRY["blimp_wh_island"](data={"train": []})
    assert t.has_validation_docs()


def test_make_table_latex():
    res = {"results": {"piqa": {"acc": 0.5, "acc_stderr": 0.01}}, "versions": {"piqa": 0}}
    md = make_table(res)
    assert "|piqa|0|acc|0.5000|" in md
    tex = make_table(res, fmt="latex")
    assert r"\begin{tabular}" in tex and "piqa & 0 & acc & 0.5000" in tex


def test_jaxlm_no_bos_in_continuations():
    """BOS-adding tokenizers must not splice a BOS into scored
    continuations, and eot_token_id must come from the tokenizer."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from llama3_quantization_tpu.models import TINY_LLAMA, init_params

    class FakeBOSTok:
        vocab_size = 64
        eot_token_id = 2

        def encode(self, s, add_special_tokens=True):
            ids = [ord(c) % 64 for c in s]
            return np.asarray(([1] + ids) if add_special_tokens else ids, np.int32)

        def decode(self, ids):
            return "".join(chr(97 + int(i) % 26) for i in ids)

    params = init_params(TINY_LLAMA, jax.random.PRNGKey(0), dtype=jnp.float32)
    lm = JAXLM(params, TINY_LLAMA, FakeBOSTok(), batch_size=2)
    assert lm.eot_token_id == 2
    assert lm.tok_encode("ab") == [ord("a") % 64, ord("b") % 64]
    # empty context conditions on EOT, not token 0
    ll, _ = lm.loglikelihood([("", " x")])[0]
    assert np.isfinite(ll)
    # greedy_until reserves generation room in the position budget
    keep = max(lm.max_length - lm.max_gen_toks, lm.max_length // 2)
    assert keep >= lm.max_length // 2 > 0
