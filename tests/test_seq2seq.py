"""Native T5-family encoder-decoder trunk (models/seq2seq.py) — VERDICT
round-3 item 8: the reference's T0-3B / hf-seq2seq surface
(`/root/reference/models/LMClass.py:35-39`,
`lm_eval/models/huggingface.py:422-586`) reached TPU-natively.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llama3_quantization_tpu.models.seq2seq import (  # noqa: E402
    forward_logits_seq2seq,
    from_hf_seq2seq,
    greedy_generate_seq2seq,
    quantize_seq2seq_rtn,
)


def _tiny_t5(tie=False, gated=True):
    cfg = transformers.T5Config(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie,
        decoder_start_token_id=0,
        pad_token_id=0,
        eos_token_id=1,
    )
    torch.manual_seed(0)
    return transformers.T5ForConditionalGeneration(cfg).eval().float()


@pytest.mark.parametrize("tie,gated", [(False, True), (True, False)])
def test_t5_hf_parity(tmp_path, tie, gated):
    """fp32 teacher-forced logits match HF transformers for both the v1.1
    (gated-gelu, untied) and v1.0 (relu, tied) variants."""
    model = _tiny_t5(tie=tie, gated=gated)
    model.save_pretrained(str(tmp_path))
    params, cfg = from_hf_seq2seq(str(tmp_path))
    assert cfg.gated_act == gated and cfg.tie_word_embeddings == tie

    rng = np.random.default_rng(0)
    enc = rng.integers(2, cfg.vocab_size, (2, 12))
    enc[1, 9:] = 0  # padding on row 1 exercises the encoder mask
    dec = rng.integers(2, cfg.vocab_size, (2, 7))
    dec[:, 0] = cfg.decoder_start_token_id
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(enc),
            attention_mask=torch.tensor((enc != 0).astype(np.int64)),
            decoder_input_ids=torch.tensor(dec),
        ).logits.numpy()
    ours = np.asarray(
        forward_logits_seq2seq(params, jnp.asarray(enc), jnp.asarray(dec), cfg)
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_t5_greedy_matches_hf_generate(tmp_path):
    model = _tiny_t5(tie=False, gated=True)
    model.save_pretrained(str(tmp_path))
    params, cfg = from_hf_seq2seq(str(tmp_path))
    enc = np.array([[5, 9, 17, 3, 2, 11]], np.int64)
    n = 6
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(enc), max_new_tokens=n, do_sample=False,
            num_beams=1, eos_token_id=None, min_new_tokens=n,
        ).numpy()[0, 1:]
    ours = np.asarray(
        greedy_generate_seq2seq(params, jnp.asarray(enc, jnp.int32), n, cfg)
    )[0]
    np.testing.assert_array_equal(ours, ref)


def test_t5_rtn_quantization_degrades_monotonically(tmp_path):
    from llama3_quantization_tpu.quant import QuantSpec

    model = _tiny_t5()
    model.save_pretrained(str(tmp_path))
    params, cfg = from_hf_seq2seq(str(tmp_path))
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 10)), jnp.int32)
    dec = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 5)), jnp.int32)
    fp = forward_logits_seq2seq(params, enc, dec, cfg)
    errs = []
    for bits in (8, 4, 2):
        qp = quantize_seq2seq_rtn(params, cfg, QuantSpec(n_bits=bits, group_size=8))
        q = forward_logits_seq2seq(qp, enc, dec, cfg)
        errs.append(float(jnp.mean(jnp.abs(q - fp))))
    assert errs[0] < errs[1] < errs[2], errs


class _IdTok:
    """Tokenizer stub: strings are space-joined int ids."""

    def encode(self, s, add_special_tokens=False):
        return [int(x) for x in s.split()]

    def decode(self, toks):
        return " ".join(str(int(t)) for t in toks)


def test_seq2seq_jaxlm_requests(tmp_path):
    """The harness engine drives the native trunk: loglikelihood ranks the
    argmax continuation above an alternative, and greedy_until returns the
    teacher-forced greedy string."""
    from llama3_quantization_tpu.eval.harness.lm import Seq2SeqJAXLM

    model = _tiny_t5()
    model.save_pretrained(str(tmp_path))
    params, cfg = from_hf_seq2seq(str(tmp_path))
    lm = Seq2SeqJAXLM(params, cfg, _IdTok(), batch_size=4, max_length=32)

    ctx = "5 9 17 3"
    gen = greedy_generate_seq2seq(
        params, jnp.asarray([[5, 9, 17, 3]], jnp.int32), 3, cfg
    )
    best = " ".join(str(int(t)) for t in np.asarray(gen)[0])
    worse = " ".join(str((int(t) + 7) % cfg.vocab_size) for t in np.asarray(gen)[0])
    (ll_best, ok_best), (ll_worse, _) = lm.loglikelihood(
        [(ctx, " " + best), (ctx, " " + worse)]
    )
    assert ll_best > ll_worse
    assert ok_best  # greedy continuation is greedy-matched

    out = lm.greedy_until([(ctx, ["zzz"])])[0]
    assert out.split()[: 3] == best.split()[:3]


def test_cli_routes_t5_checkpoint(tmp_path, capsys):
    """The CLI detects a T5-family config.json and takes the seq2seq
    driver path (reference `models/LMClass.py:35-39`), applying RTN."""
    from llama3_quantization_tpu import cli

    model = _tiny_t5()
    model.save_pretrained(str(tmp_path))
    cli.main([
        "--model", str(tmp_path), "--quant_method", "rtn",
        "--wbits", "4", "--group_size", "8",
    ])
    err = capsys.readouterr().err
    assert "t5-seq2seq" in err
    assert "rtn W4 g8 applied (seq2seq)" in err


def test_cached_greedy_matches_reforward(tmp_path):
    """The KV-cached incremental decoder (init_seq2seq_state /
    decode_step_seq2seq) produces the same greedy stream as the O(T^2)
    re-forward decoder — and therefore as HF generate."""
    from llama3_quantization_tpu.models.seq2seq import (
        greedy_generate_seq2seq_cached,
    )

    for tie in (False, True):
        model = _tiny_t5(tie=tie)
        model.save_pretrained(str(tmp_path / ("t" if tie else "u")))
        params, cfg = from_hf_seq2seq(str(tmp_path / ("t" if tie else "u")))
        enc = jnp.asarray([[5, 9, 17, 3, 2, 11], [8, 4, 30, 0, 0, 0]], jnp.int32)
        n = 7
        ref = np.asarray(greedy_generate_seq2seq(params, enc, n, cfg))
        got = np.asarray(greedy_generate_seq2seq_cached(params, enc, n, cfg))
        np.testing.assert_array_equal(got, ref)


def test_seq2seq_tp_sharded_matches_single_device(tmp_path):
    """Megatron-sharded T5 (seq2seq_pspecs: col q/k/v/c*/wi*, row o/co/wo)
    reproduces the single-device teacher-forced logits under a dp x tp
    mesh — fp and RTN-quantized leaves."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from llama3_quantization_tpu.parallel import shard_params_seq2seq
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.models.seq2seq import quantize_seq2seq_rtn

    model = _tiny_t5()
    model.save_pretrained(str(tmp_path))
    params, cfg = from_hf_seq2seq(str(tmp_path))
    rng = np.random.default_rng(4)
    enc = jnp.asarray(rng.integers(2, cfg.vocab_size, (4, 10)), jnp.int32)
    dec = jnp.asarray(rng.integers(2, cfg.vocab_size, (4, 6)), jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))

    for qp in (params, quantize_seq2seq_rtn(params, cfg, QuantSpec(n_bits=8, group_size=8))):
        ref = forward_logits_seq2seq(qp, enc, dec, cfg)
        sharded = shard_params_seq2seq(qp, mesh)
        enc_s = jax.device_put(enc, NamedSharding(mesh, P("dp", None)))
        dec_s = jax.device_put(dec, NamedSharding(mesh, P("dp", None)))
        with mesh:
            out = jax.jit(
                lambda p, e, d: forward_logits_seq2seq(p, e, d, cfg)
            )(sharded, enc_s, dec_s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("gated", [True, False])
def test_t5_gptq_quantization(tmp_path, gated):
    """Round 5 (VERDICT r4 item 6): GPTQ covers the seq2seq trunk — the
    encoder+decoder Catcher streams Hessians per block, cross-attention
    k/v share one Hessian over the quantized-encoder output, and the
    quantized model's teacher-forced logits degrade gracefully (W4 gptq
    beats W2 rtn, and every block linear becomes a QuantizedTensor)."""
    from llama3_quantization_tpu import api
    from llama3_quantization_tpu.quant import QuantSpec
    from llama3_quantization_tpu.quant.qtensor import QuantizedTensor
    from llama3_quantization_tpu.quant.seq2seq_calibration import (
        _dec_names,
        _enc_names,
    )

    model = _tiny_t5(gated=gated)
    model.save_pretrained(str(tmp_path))
    params, cfg = from_hf_seq2seq(str(tmp_path))
    rng = np.random.default_rng(2)
    calib = rng.integers(2, cfg.vocab_size, (4, 16))
    spec = QuantSpec(n_bits=4, group_size=8)

    qp = api.quantize(params, cfg, method="gptq", spec=spec,
                      calib_tokens=calib, batch_size=2)
    for side, names in (("enc", _enc_names(cfg)), ("dec", _dec_names(cfg))):
        for m in names:
            leaf = qp[side]["layers"][m]
            assert isinstance(leaf, QuantizedTensor), (side, m)

    enc = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 10)), jnp.int32)
    dec = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 5)), jnp.int32)
    fp = forward_logits_seq2seq(params, enc, dec, cfg)
    q4 = forward_logits_seq2seq(qp, enc, dec, cfg)
    assert bool(jnp.isfinite(q4).all())
    err_gptq = float(jnp.mean(jnp.abs(q4 - fp)))
    rp2 = quantize_seq2seq_rtn(params, cfg, QuantSpec(n_bits=2, group_size=8))
    err_rtn2 = float(
        jnp.mean(jnp.abs(forward_logits_seq2seq(rp2, enc, dec, cfg) - fp))
    )
    assert err_gptq < err_rtn2, (err_gptq, err_rtn2)


def test_seq2seq_api_rejects_decoder_only_methods(tmp_path):
    from llama3_quantization_tpu import api
    from llama3_quantization_tpu.quant import QuantSpec

    model = _tiny_t5()
    model.save_pretrained(str(tmp_path))
    params, cfg = from_hf_seq2seq(str(tmp_path))
    with pytest.raises(ValueError, match="seq2seq supports"):
        api.quantize(params, cfg, method="awq", spec=QuantSpec(4, 8),
                     calib_tokens=np.zeros((2, 8), np.int64))


def test_cli_seq2seq_gptq_route(tmp_path, capsys):
    """Round 5: the CLI accepts --quant_method gptq for T5 checkpoints
    (synthetic calibration in the zero-egress environment)."""
    from llama3_quantization_tpu import cli

    model = _tiny_t5()
    model.save_pretrained(str(tmp_path))
    cli.main([
        "--model", str(tmp_path), "--quant_method", "gptq",
        "--wbits", "4", "--group_size", "8",
        "--calib_dataset", "synthetic", "--nsamples", "2", "--seqlen", "16",
    ])
    err = capsys.readouterr().err
    assert "gptq W4 g8 applied (seq2seq)" in err
