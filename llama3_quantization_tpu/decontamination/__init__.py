"""Train/test overlap detection (decontamination).

Port of `/root/reference/lm_eval/decontamination/` with the C++ fast path
actually shipped (`native/janitor_util.cpp`) instead of referenced.
"""

from .archiver import Archive, Reader, TextArchive, TextReader  # noqa: F401
from .janitor import Janitor, word_ngrams  # noqa: F401
