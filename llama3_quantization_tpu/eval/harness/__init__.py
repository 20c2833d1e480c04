"""Task-evaluation harness — a TPU-era redesign of the vendored
EleutherAI lm-evaluation-harness fork the reference ships in `lm_eval/`
(~v0.3 vintage; SURVEY.md §2.4).

Same abstractions, same request semantics (`loglikelihood`,
`loglikelihood_rolling`, `greedy_until`), same seeded doc sampling — so
task scores are comparable — but the LM engine batches into static padded
shapes for jit-compiled scoring instead of eager per-batch graphs.
"""

from .base import (  # noqa: F401
    LM,
    MultipleChoiceTask,
    PerplexityTask,
    Request,
    Task,
    rf,
)
from .lm import BaseLM, DummyLM, JAXLM  # noqa: F401
from .models import GPT3LM, HFCausalLM, HFSeq2SeqLM, TextSynthLM  # noqa: F401
from .caching import CachingLM  # noqa: F401
from .evaluator import evaluate, simple_evaluate, make_table  # noqa: F401
from .tasks import TASK_REGISTRY, get_task_dict  # noqa: F401

#: pluggable LM adapters (`lm_eval/models/__init__.py MODEL_REGISTRY`)
MODEL_REGISTRY = {
    "jax": JAXLM,
    "dummy": DummyLM,
    "hf-causal": HFCausalLM,
    "gpt2": HFCausalLM,
    "hf-seq2seq": HFSeq2SeqLM,
    "gpt3": GPT3LM,
    "textsynth": TextSynthLM,
}


def get_model(name: str):
    return MODEL_REGISTRY[name]
