"""Cross-validation against the reference harness itself (VERDICT item 3).

Runs the reference's vendored lm-eval (`/root/reference/lm_eval`) in-process
on synthetic documents and the repo harness on the SAME documents with the
SAME deterministic fake LM, then asserts:

  1. identical request streams (request type, order, and exact arg strings
     — which covers fewshot contexts, prompt construction, and the
     seeded doc shuffle, `/root/reference/lm_eval/evaluator.py:177-210`);
  2. identical metric values (process_results + aggregation parity,
     `/root/reference/lm_eval/evaluator.py:242-279`).

The reference harness needs packages this image lacks (sqlitedict,
sacrebleu, ...); they are stubbed before import — none of the exercised
code paths touch them.
"""

from __future__ import annotations

import hashlib
import os
import random
import sys
import types

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lm_eval")), reason="reference repo absent"
)


# --------------------------------------------------------------------------
# reference import with stubs
# --------------------------------------------------------------------------

_ref_cache = {}


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []
    for a, v in attrs.items():
        setattr(m, a, v)
    sys.modules[name] = m
    return m


def ref_lm_eval():
    """Import the reference harness once, with dependency stubs."""
    if "mod" in _ref_cache:
        return _ref_cache["mod"]
    if "sqlitedict" not in sys.modules:
        _stub("sqlitedict", SqliteDict=object)
    if "sacrebleu" not in sys.modules:
        sub = _stub("sacrebleu.sacrebleu", smart_open=None, DATASETS={})
        _stub(
            "sacrebleu",
            corpus_bleu=None,
            corpus_chrf=None,
            corpus_ter=None,
            sacrebleu=sub,
            get_langpairs_for_testset=lambda t: [],
            get_available_testsets=lambda: [],
        )
    for name in ("omegaconf", "pycountry"):
        if name not in sys.modules:
            _stub(name, OmegaConf=object)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        import lm_eval.base  # noqa: F401
        import lm_eval.evaluator
        import lm_eval.tasks

    _ref_cache["mod"] = sys.modules["lm_eval"]
    return _ref_cache["mod"]


# --------------------------------------------------------------------------
# deterministic fake LM (shared response functions on both sides)
# --------------------------------------------------------------------------


def _h(*parts) -> int:
    return int.from_bytes(
        hashlib.sha256("\x1f".join(map(str, parts)).encode()).digest()[:8], "big"
    )


def det_loglikelihood(args):
    out = []
    for ctx, cont in args:
        h = _h("ll", ctx, cont)
        out.append((-(h % 1000) / 100.0 - 0.01, (h % 3) == 0))
    return out


def det_rolling(args):
    return [-(_h("roll", a[0]) % 10000) / 100.0 - 0.01 for a in args]


def det_greedy(args):
    out = []
    for a in args:
        ctx = a[0]
        h = _h("greedy", ctx)
        out.append(f"The answer is #### {h % 7}")
    return out


class RecordingLM:
    """Implements both harnesses' LM call surface; records request args."""

    def __init__(self):
        self.calls = {"loglikelihood": [], "loglikelihood_rolling": [], "greedy_until": []}

    def loglikelihood(self, requests):
        self.calls["loglikelihood"].extend(requests)
        return det_loglikelihood(requests)

    def loglikelihood_rolling(self, requests):
        self.calls["loglikelihood_rolling"].extend(requests)
        return det_rolling(requests)

    def greedy_until(self, requests):
        self.calls["greedy_until"].extend(requests)
        return det_greedy(requests)


# --------------------------------------------------------------------------
# synthetic documents (raw HF-row schema, shared verbatim by both sides)
# --------------------------------------------------------------------------


def _words(seed, n):
    rnd = random.Random(str(seed))
    vocab = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    return " ".join(rnd.choice(vocab) for _ in range(n))


def synthetic_docs(task: str):
    rnd = random.Random(hash(task) & 0xFFFF)

    if task == "piqa":
        mk = lambda i: {
            "goal": f"How do you {_words((task, i), 5)}?",
            "sol1": _words((task, i, 1), 6),
            "sol2": _words((task, i, 2), 6),
            "label": rnd.randint(0, 1),
        }
        return {"train": [mk(100 + i) for i in range(8)], "validation": [mk(i) for i in range(10)]}

    if task in ("arc_easy", "arc_challenge"):
        def mk(i):
            n = 3 + (i % 3)  # 3..5 choices
            return {
                "id": f"q{i}",
                "question": f"What is {_words((task, i), 4)}?",
                "choices": {
                    "text": [_words((task, i, j), 3) for j in range(n)],
                    "label": ["A", "B", "C", "D", "E"][:n],
                },
                "answerKey": ["A", "B", "C", "D", "E"][i % n] if i % 2 else str((i % n) + 1),
            }
        return {"train": [mk(100 + i) for i in range(8)],
                "validation": [mk(i) for i in range(10)],
                "test": [mk(200 + i) for i in range(10)]}

    if task == "hellaswag":
        mk = lambda i: {
            "activity_label": f"Act{i}",
            "ctx_a": _words((task, i, "a"), 6) + " [title] x",
            "ctx_b": _words((task, i, "b"), 3),
            "endings": [_words((task, i, j), 4) + ("[x]" if j == 1 else "") for j in range(4)],
            "label": str(i % 4),
        }
        return {"train": [mk(100 + i) for i in range(8)], "validation": [mk(i) for i in range(10)]}

    if task == "winogrande":
        mk = lambda i: {
            "sentence": f"The {_words((task, i, 'l'), 3)} _ because {_words((task, i, 'r'), 4)}.",
            "option1": _words((task, i, 1), 2),
            "option2": _words((task, i, 2), 2),
            "answer": str((i % 2) + 1),
        }
        return {"train": [mk(100 + i) for i in range(8)], "validation": [mk(i) for i in range(10)]}

    if task == "wikitext":
        mk = lambda i: {
            "page": (
                f" = Page {i} = \n\n" + _words((task, i), 40)
                + " @-@ x @,@ 1 . the 's \n = = Sec = = \n" + _words((task, i, 2), 30)
            )
        }
        return {"train": [mk(100 + i) for i in range(4)],
                "validation": [mk(i) for i in range(6)],
                "test": [mk(200 + i) for i in range(6)]}

    if task == "hendrycksTest-abstract_algebra":
        mk = lambda i: {
            "question": f"Compute {_words((task, i), 4)}.",
            "choices": [_words((task, i, j), 2) for j in range(4)],
            "answer": i % 4,
        }
        return {"dev": [mk(100 + i) for i in range(7)],
                "validation": [mk(300 + i) for i in range(8)],
                "test": [mk(i) for i in range(10)]}

    if task == "gsm8k":
        mk = lambda i: {
            "question": f"If you have {i + 2} apples and eat {i % 3}, how many remain?",
            "answer": f"{_words((task, i), 8)}\n#### {(i + 2) - (i % 3)}",
        }
        return {"train": [mk(100 + i) for i in range(8)], "test": [mk(i) for i in range(10)]}

    raise KeyError(task)


# --------------------------------------------------------------------------
# task construction on each side
# --------------------------------------------------------------------------

REF_TASK_SPECS = {
    "piqa": ("lm_eval.tasks.piqa", "PiQA"),
    "arc_easy": ("lm_eval.tasks.arc", "ARCEasy"),
    "arc_challenge": ("lm_eval.tasks.arc", "ARCChallenge"),
    "hellaswag": ("lm_eval.tasks.hellaswag", "HellaSwag"),
    "winogrande": ("lm_eval.tasks.winogrande", "Winogrande"),
    "wikitext": ("lm_eval.tasks.wikitext", "WikiText"),
    "gsm8k": ("lm_eval.tasks.gsm8k", "GradeSchoolMath8K"),
}


def make_reference_task(name: str, data):
    ref_lm_eval()
    if name.startswith("hendrycksTest-"):
        import lm_eval.tasks.hendrycks_test as ht

        cls = ht.GeneralHendrycksTest
        obj = cls.__new__(cls)
        obj.DATASET_NAME = name.split("-", 1)[1]
    else:
        modname, clsname = REF_TASK_SPECS[name]
        __import__(modname)
        cls = getattr(sys.modules[modname], clsname)
        obj = cls.__new__(cls)
    obj.dataset = data
    obj._training_docs = None
    obj._fewshot_docs = None
    return obj


def make_repo_task(name: str, data):
    from llama3_quantization_tpu.eval.harness.tasks import get_task_dict

    return get_task_dict([name], task_data={name: data})[name]


# --------------------------------------------------------------------------
# the parity check
# --------------------------------------------------------------------------

TASKS = [
    ("piqa", 0), ("piqa", 3),
    ("arc_easy", 2),
    ("arc_challenge", 0),
    ("hellaswag", 2),
    ("winogrande", 3),
    ("wikitext", 0),
    ("hendrycksTest-abstract_algebra", 5),
    ("gsm8k", 2),
]


def _strip_stderr(results):
    return {
        t: {k: v for k, v in m.items() if not k.endswith("_stderr")}
        for t, m in results.items()
    }


@pytest.mark.parametrize("name,fewshot", TASKS, ids=[f"{n}-k{k}" for n, k in TASKS])
def test_request_and_metric_parity(name, fewshot):
    ref = ref_lm_eval()
    from llama3_quantization_tpu.eval.harness import evaluator as repo_evaluator

    data = synthetic_docs(name)

    ref_task = make_reference_task(name, data)
    ref_lm = RecordingLM()
    ref_out = ref.evaluator.evaluate(
        lm=ref_lm,
        task_dict={name: ref_task},
        num_fewshot=fewshot,
        limit=8,
        bootstrap_iters=2,
    )

    repo_task = make_repo_task(name, data)
    repo_lm = RecordingLM()
    repo_out = repo_evaluator.evaluate(
        repo_lm,
        {name: repo_task},
        num_fewshot=fewshot,
        limit=8,
        bootstrap_iters=2,
    )

    # 1. identical request streams: covers fewshot sampling RNG, context
    #    assembly, prompt text, request ordering
    for reqtype in ref_lm.calls:
        assert repo_lm.calls[reqtype] == ref_lm.calls[reqtype], (
            f"{name} k={fewshot}: {reqtype} request stream diverges"
        )
    total = sum(len(v) for v in ref_lm.calls.values())
    assert total > 0, "reference produced no requests — test is vacuous"

    # 2. identical metric values
    ref_res = _strip_stderr(ref_out["results"])
    repo_res = _strip_stderr(repo_out["results"])
    assert set(repo_res[name]) == set(ref_res[name])
    for k, v in ref_res[name].items():
        rv = repo_res[name][k]
        assert rv == pytest.approx(v, rel=1e-12), f"{name} metric {k}: {rv} != {v}"

    # versions parity
    assert repo_out["versions"][name] == ref_out["versions"][name]
