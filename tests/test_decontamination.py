"""Janitor tests: native C++ path vs Python fallback equivalence."""

import pytest

from llama3_quantization_tpu.decontamination import Janitor, word_ngrams
from llama3_quantization_tpu.decontamination import janitor as jmod


def test_native_builds():
    lib = jmod._native_lib()
    assert lib is not None, "C++ janitor_util failed to build (g++ available?)"


def test_clean_text_native_matches_python():
    text = "Hello, World!  This is   a TEST... with 123 numbers & symbols."
    native = jmod.clean_text(text)
    # force python fallback
    old, tried = jmod._NATIVE, jmod._NATIVE_TRIED
    jmod._NATIVE, jmod._NATIVE_TRIED = None, True
    try:
        py = jmod.clean_text(text)
    finally:
        jmod._NATIVE, jmod._NATIVE_TRIED = old, tried
    assert native == py == "hello world this is a test with 123 numbers symbols"


def test_word_ngrams():
    grams = word_ngrams("a b c d", 2)
    assert grams == ["a b", "b c", "c d"]
    assert word_ngrams("a b", 3) == []


def test_contamination_detection_and_clean():
    j = Janitor(ngram_n=3, window_to_remove=5, minimum_slice_length=5)
    j.register_contaminant("the secret benchmark answer")
    doc = "prefix words here " + "the secret benchmark answer" + " and a long suffix tail"
    assert j.contamination_count(doc) >= 1
    cleaned = j.clean(doc)
    joined = " ".join(cleaned)
    assert "secret benchmark" not in joined


def test_too_dirty_dropped():
    j = Janitor(ngram_n=2, too_dirty_cutoff=3)
    j.register_contaminant("bad gram")
    doc = " ".join(["bad gram"] * 5)
    assert j.clean(doc) == []


def test_clean_document_untouched():
    j = Janitor(ngram_n=3)
    j.register_contaminant("totally different text")
    doc = "an innocent document with no contamination whatsoever in it"
    assert j.clean(doc) == [doc]
    assert j.contamination_count(doc) == 0


def test_save_load_roundtrip(tmp_path):
    j = Janitor(ngram_n=2)
    j.register_contaminant("alpha beta gamma")
    f = str(tmp_path / "grams.pkl")
    j.save_contamination_ngrams(f)
    j2 = Janitor(ngram_n=2)
    j2.load_contamination_ngrams(f)
    assert j2.dirt_ngrams == j.dirt_ngrams
