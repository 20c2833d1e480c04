"""Task registry (`/root/reference/lm_eval/tasks/__init__.py:86-353`).

Covers the reference study's benchmark set — the five CommonSenseQA tasks
(`new_scripts/evaluate_*.sh`: piqa, arc_easy, arc_challenge, hellaswag,
winogrande), wikitext, MMLU (hendrycksTest-*), plus boolq/lambada/gsm8k,
GLUE, SuperGLUE, BLiMP x67, Pile perplexity subsets, WMT translation and
CrowS-Pairs — with the same prompt formats, so scores are comparable. All
tasks accept `data={split: [docs]}` for offline operation.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .arc import ARCChallenge, ARCEasy
from .boolq import BoolQ
from .extra_mc import Copa, OpenBookQA, SciQ
from .glue import MNLI, MRPC, QNLI, QQP, RTE, SST, WNLI, CoLA, MNLIMismatched
from .gsm8k import GSM8K
from .superglue import CB, MultiRC, WSC, WiC
from .hellaswag import HellaSwag
from .hendrycks_test import SUBJECTS, create_mmlu_task
from .blimp import BLIMP_PHENOMENA, create_blimp_task
from .crows_pairs import CrowsPairs, CrowsPairsFrench
from .lambada import Lambada, LambadaCloze, LambadaStandard
from .pile import PILE_SUBSETS, create_pile_task
from .translation import WMT_PAIRS, create_translation_task
from .piqa import PiQA
from .winogrande import Winogrande
from .wikitext import WikiText

TASK_REGISTRY = {
    "piqa": PiQA,
    "arc_easy": ARCEasy,
    "arc_challenge": ARCChallenge,
    "hellaswag": HellaSwag,
    "winogrande": Winogrande,
    "wikitext": WikiText,
    "boolq": BoolQ,
    "copa": Copa,
    "openbookqa": OpenBookQA,
    "sciq": SciQ,
    "lambada_openai": Lambada,
    "gsm8k": GSM8K,
    # GLUE (`lm_eval/tasks/glue.py`)
    "cola": CoLA,
    "sst": SST,
    "mrpc": MRPC,
    "qqp": QQP,
    "mnli": MNLI,
    "mnli_mismatched": MNLIMismatched,
    "qnli": QNLI,
    "rte": RTE,
    "wnli": WNLI,
    # SuperGLUE beyond boolq/copa (`lm_eval/tasks/superglue.py`)
    "cb": CB,
    "wic": WiC,
    "wsc": WSC,
    "multirc": MultiRC,
    "lambada_standard": LambadaStandard,
    "lambada_cloze": LambadaCloze,
    "crows_pairs_english": CrowsPairs,
    "crows_pairs_french": CrowsPairsFrench,
    **{f"hendrycksTest-{sub}": create_mmlu_task(sub) for sub in SUBJECTS},
    **{f"blimp_{ph}": create_blimp_task(ph) for ph in BLIMP_PHENOMENA},
    **{f"pile_{sub}": create_pile_task(sub) for sub in PILE_SUBSETS},
    **{f"{ds}-{src}-{tgt}": create_translation_task(ds, src, tgt)
       for ds, src, tgt in WMT_PAIRS},
}


def get_task_dict(task_name_list: List[str], task_data: Optional[Dict] = None):
    task_data = task_data or {}
    return {
        name: TASK_REGISTRY[name](data=task_data.get(name))
        for name in task_name_list
    }
