"""Small text helpers shared by task prompts
(`/root/reference/lm_eval/utils.py:62-69`)."""

import re


def general_detokenize(string: str) -> str:
    """Undo PTB-ish tokenization artifacts in dataset sentences (used by
    the SST/MRPC/WSC prompt builders for score parity)."""
    string = string.replace(" n't", "n't")
    string = string.replace(" )", ")")
    string = string.replace("( ", "(")
    string = string.replace('" ', '"')
    string = string.replace(' "', '"')
    string = re.sub(r" (['.,])", r"\1", string)
    return string
