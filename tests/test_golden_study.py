"""Golden-number study fixtures.

Runs the full method-by-method study table (`tools/reproduce_study.py`)
on the tiny model with the vendored wikitext2-style corpus slice and
compares every number against `tests/fixtures/golden_study.json` — the
offline stand-in for the reference's validate-by-reproducing-the-paper
workflow (`/root/reference/README.md:43-69`). Any drift in the
quantization algorithms, the `eval/data.py` detokenizer/join/RNG stack,
the PPL window math, or the harness prompt pipeline shows up here as a
golden mismatch.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_study_table_matches_golden():
    import reproduce_study

    with open(reproduce_study.GOLDEN) as f:
        golden = json.load(f)
    table = reproduce_study.run_study()
    assert set(table) == set(golden)
    for m, row in table.items():
        for k, v in row.items():
            g = golden[m][k]
            if isinstance(v, str) or isinstance(v, int):
                # round-5 rows: the serving-engine stream digest/count
                # must match EXACTLY (greedy streams are deterministic)
                assert v == g, f"{m}.{k}: got {v}, golden {g}"
            else:
                assert abs(v - g) <= 2e-3 * max(1.0, abs(g)), (
                    f"{m}.{k}: got {v}, golden {g}"
                )


def test_study_via_hf_checkpoint_matches_golden(tmp_path):
    """The same golden numbers through the HF checkpoint path: save the
    tiny model in HF format (config.json + model.safetensors), reload via
    `from_hf_checkpoint`, quantize, evaluate. fp32 round-trips bit-exactly,
    so any divergence is a save/load bug — this leaves the real-weights
    RUNBOOK with only the external checkpoint files themselves untested."""
    import reproduce_study

    with open(reproduce_study.GOLDEN) as f:
        golden = json.load(f)
    subset = {m: reproduce_study.METHODS[m] for m in ("fp", "rtn", "gptq")}
    table = reproduce_study.run_study(subset, via_hf_checkpoint=str(tmp_path))
    for m, row in table.items():
        for k, v in row.items():
            g = golden[m][k]
            assert abs(v - g) <= 2e-3 * max(1.0, abs(g)), (
                f"{m}.{k}: got {v}, golden {g}"
            )


def test_quantization_perturbs_ppl():
    """Every method must actually change the model (guards against the
    silent-skip failure mode: irqlora on non-blockable shapes was a no-op
    until blocksize2 was sized to the tiny model)."""
    with open(os.path.join(REPO, "tests", "fixtures", "golden_study.json")) as f:
        golden = json.load(f)
    fp = golden["fp"]["ppl_wikitext2"]
    for m, row in golden.items():
        if m == "fp" or "ppl_wikitext2" not in row:
            continue  # seq2seq/serving rows carry no decoder PPL column
        assert row["ppl_wikitext2"] != fp, f"{m} left PPL bit-identical to fp"
