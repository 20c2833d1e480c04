"""Corpus archive IO (decontamination/archiver.py)."""

import pytest


def test_jsonl_roundtrip(tmp_path):
    from llama3_quantization_tpu.decontamination.archiver import Archive, Reader

    p = str(tmp_path / "docs.jsonl")
    a = Archive(p)
    a.add_data("first doc", meta={"pile_set_name": "test"})
    a.add_data("second doc")
    a.commit()
    assert list(Reader().read(p)) == ["first doc", "second doc"]
    texts_meta = list(Reader().read(p, get_meta=True))
    assert texts_meta[0] == ("first doc", {"pile_set_name": "test"})


def test_zst_roundtrip(tmp_path):
    pytest.importorskip("zstandard")
    from llama3_quantization_tpu.decontamination.archiver import Archive, Reader

    p = str(tmp_path / "docs.jsonl.zst")
    a = Archive(p)
    for i in range(100):
        a.add_data(f"doc {i}", meta={"i": i})
    a.commit()
    docs = list(Reader().read(p))
    assert len(docs) == 100 and docs[42] == "doc 42"


def test_text_archive_roundtrip(tmp_path):
    from llama3_quantization_tpu.decontamination.archiver import TextArchive, TextReader

    p = str(tmp_path / "ngrams.txt")
    t = TextArchive(p)
    t.add_data("a b c")
    t.add_data("d e f")
    t.commit()
    assert list(TextReader(p).read()) == ["a b c", "d e f"]
