"""Offline raw-file dataset loaders: write tiny files in the upstream
formats, parse them, and run the docs through the matching tasks."""

import json

from llama3_quantization_tpu.eval.harness import DummyLM, simple_evaluate
from llama3_quantization_tpu.eval.harness import local_datasets as lds


def test_logiqa_roundtrip(tmp_path):
    block = "a\nThe context sentence.Here.\nWhich option?\na.first one\nb.second one\nc.third one\nd.fourth one"
    p = tmp_path / "x.txt"
    p.write_text(block + "\n\n" + block.replace("a\n", "b\n", 1))
    data = lds.load_logiqa(str(p), str(p), str(p))
    assert len(data["train"]) == 2
    assert data["train"][0]["options"][0] == "first one"
    res = simple_evaluate(DummyLM(), tasks=["logiqa"], task_data={"logiqa": data}, bootstrap_iters=2)
    assert "acc" in res["results"]["logiqa"]


def test_mutual_roundtrip(tmp_path):
    for split in ("train", "dev", "test"):
        d = tmp_path / split
        d.mkdir()
        for i in range(2):
            (d / f"{split}_{i}.txt").write_text(
                json.dumps(
                    {
                        "answers": "A",
                        "options": ["f : a .", "f : b .", "f : c .", "f : d ."],
                        "article": f"m : hi {i} .",
                        "id": f"{split}_{i}",
                    }
                )
            )
    data = lds.load_mutual(str(tmp_path))
    assert len(data["validation"]) == 2
    res = simple_evaluate(DummyLM(), tasks=["mutual"], task_data={"mutual": data}, bootstrap_iters=2)
    assert "r@1" in res["results"]["mutual"]


def test_unscramble_roundtrip(tmp_path):
    p = tmp_path / "cycle.jsonl"
    p.write_text("\n".join(json.dumps({"context": f"c{i} = ", "completion": f"w{i}"}) for i in range(3)))
    data = lds.load_unscramble(str(p))
    res = simple_evaluate(
        DummyLM(), tasks=["cycle_letters"], task_data={"cycle_letters": data}, bootstrap_iters=2
    )
    assert "acc" in res["results"]["cycle_letters"]


def test_asdiv_roundtrip(tmp_path):
    xml = """<Machine-Reading-Corpus-File><ProblemSet>
    <Problem ID="1" Grade="1" Source="x">
      <Body>Tom has 3 apples.</Body>
      <Question>How many apples?</Question>
      <Solution-Type>Addition</Solution-Type>
      <Answer>3 (apples)</Answer>
      <Formula>3=3</Formula>
    </Problem></ProblemSet></Machine-Reading-Corpus-File>"""
    p = tmp_path / "ASDiv.xml"
    p.write_text(xml)
    data = lds.load_asdiv(str(p))
    assert data["validation"][0]["answer"] == "3 (apples)"
    res = simple_evaluate(DummyLM(), tasks=["math_asdiv"], task_data={"math_asdiv": data}, bootstrap_iters=2)
    assert "acc" in res["results"]["math_asdiv"]


def test_coqa_roundtrip(tmp_path):
    record = {
        "id": "r1",
        "source": "wiki",
        "story": "A story.",
        "questions": [{"input_text": "Who?", "turn_id": 1}],
        "answers": [
            {"input_text": "Tom", "turn_id": 1, "span_start": 0, "span_end": 1, "span_text": "A"}
        ],
        "additional_answers": {
            "0": [{"input_text": "Tommy", "turn_id": 1, "span_start": 0, "span_end": 1, "span_text": "A"}]
        },
    }
    p = tmp_path / "coqa-dev.json"
    p.write_text(json.dumps({"data": [record]}))
    data = lds.load_coqa(str(p), str(p))
    assert data["validation"][0]["additional_answers"]["0"]["input_text"] == ["Tommy"]
    res = simple_evaluate(DummyLM(), tasks=["coqa"], task_data={"coqa": data}, bootstrap_iters=2)
    assert "f1" in res["results"]["coqa"]


def test_drop_roundtrip(tmp_path):
    payload = {
        "p1": {
            "passage": "There were 4 dogs.",
            "qa_pairs": [
                {
                    "query_id": "q1",
                    "question": "How many dogs?",
                    "answer": {"number": "4", "date": {}, "spans": []},
                    "validated_answers": [{"number": "4", "date": {}, "spans": []}],
                }
            ],
        }
    }
    p = tmp_path / "drop.json"
    p.write_text(json.dumps(payload))
    data = lds.load_drop(str(p), str(p))
    res = simple_evaluate(DummyLM(), tasks=["drop"], task_data={"drop": data}, bootstrap_iters=2)
    assert "f1" in res["results"]["drop"]


def test_headqa_roundtrip(tmp_path):
    payload = {
        "exams": {
            "e1": {
                "name": "n", "year": "2020", "category": "medicine",
                "data": [
                    {
                        "qid": " 1 ",
                        "qtext": " What? ",
                        "ra": " 2 ",
                        "answers": [{"aid": 1, "atext": " a1 "}, {"aid": 2, "atext": " a2 "}],
                    }
                ],
            }
        }
    }
    p = tmp_path / "head.json"
    p.write_text(json.dumps(payload))
    data = lds.load_headqa(str(p))
    # headqa task expects train/validation/test; use the same docs
    full = {"train": data["test"], "validation": data["test"], "test": data["test"]}
    res = simple_evaluate(DummyLM(), tasks=["headqa_en"], task_data={"headqa_en": full}, bootstrap_iters=2)
    assert "acc" in res["results"]["headqa_en"]


def test_ethics_csv_roundtrips(tmp_path):
    cm = tmp_path / "cm.csv"
    cm.write_text("label,input,is_short,edited\n1,I lied.,True,False\n0,I helped.,True,False\n")
    data = lds.load_hendrycks_ethics(str(cm), "commonsense")
    res = simple_evaluate(DummyLM(), tasks=["ethics_cm"], task_data={"ethics_cm": data}, bootstrap_iters=2)
    assert "acc" in res["results"]["ethics_cm"]

    virtue = tmp_path / "virtue.csv"
    rows = ["label,scenario"] + [f"{i % 2},Sam did {i}. [SEP] honesty" for i in range(10)]
    virtue.write_text("\n".join(rows) + "\n")
    vdata = lds.load_hendrycks_ethics(str(virtue), "virtue")
    assert vdata["test"][9]["group_id"] == 1
    res = simple_evaluate(
        DummyLM(), tasks=["ethics_virtue"], task_data={"ethics_virtue": vdata}, bootstrap_iters=2
    )
    assert "em" in res["results"]["ethics_virtue"]

    util = tmp_path / "util.csv"
    util.write_text("I watched a movie.,I watched paint dry.\n")
    udata = lds.load_hendrycks_ethics(str(util), "utilitarianism")
    assert udata["test"][0]["baseline"] == "I watched paint dry."


def test_math_dir_roundtrip(tmp_path):
    d = tmp_path / "algebra"
    d.mkdir()
    for i in range(2):
        (d / f"{i}.json").write_text(
            json.dumps(
                {
                    "problem": f"What is {i}+{i}?",
                    "level": "Level 1",
                    "type": "Algebra",
                    "solution": f"It is $\\boxed{{{2*i}}}$.",
                }
            )
        )
    data = lds.load_hendrycks_math(str(d))
    full = {"train": data["test"], "test": data["test"]}
    res = simple_evaluate(
        DummyLM(), tasks=["math_algebra"], task_data={"math_algebra": full}, bootstrap_iters=2
    )
    assert "acc" in res["results"]["math_algebra"]


def test_pile_jsonl_and_zst(tmp_path):
    rows = [
        {"text": "arxiv doc " * 5, "meta": {"pile_set_name": "ArXiv"}},
        {"text": "github doc " * 5, "meta": {"pile_set_name": "Github"}},
    ]
    p = tmp_path / "val.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    data = lds.load_pile(str(p), subset="ArXiv")
    assert len(data["test"]) == 1
    try:
        import zstandard as zstd
    except ImportError:
        return
    pz = tmp_path / "val.jsonl.zst"
    pz.write_bytes(zstd.ZstdCompressor().compress(p.read_bytes()))
    dataz = lds.load_pile(str(pz), subset="Github")
    assert len(dataz["test"]) == 1


def test_triviaqa_and_quac_and_sat(tmp_path):
    tq = tmp_path / "trivia.json"
    tq.write_text(
        json.dumps(
            {"Data": [{"Question": "Q?", "Answer": {"Value": "V", "Aliases": ["V", "Vee"]}}]}
        )
    )
    data = lds.load_triviaqa(str(tq))
    full = {"train": data["validation"], "validation": data["validation"]}
    res = simple_evaluate(DummyLM(), tasks=["triviaqa"], task_data={"triviaqa": full}, bootstrap_iters=2)
    assert "acc" in res["results"]["triviaqa"]

    quac = tmp_path / "quac.json"
    quac.write_text(
        json.dumps(
            {
                "data": [
                    {
                        "title": "T",
                        "section_title": "S",
                        "paragraphs": [
                            {
                                "context": "Ctx CANNOTANSWER",
                                "qas": [{"question": "Q?", "answers": [{"text": "A"}]}],
                            }
                        ],
                    }
                ]
            }
        )
    )
    qd = lds.load_quac(str(quac))
    assert qd["validation"][0]["paragraph"] == "Ctx "

    sat = tmp_path / "SAT-package-V3.txt"
    sat.write_text(
        "# comment\n\nKS190\nocean tide\nlake pond\nsea wave\nriver current\npool swim\nbeach sand\nb\n"
    )
    sd = lds.load_sat_analogies(str(sat))
    assert sd["validation"][0]["solution"] == "b"
    assert len(sd["validation"][0]["choices"]) == 5


def test_loader_registry_covers_builder_families():
    """Every reference lm_eval/datasets/** builder family has a loader."""
    for name in ("logiqa", "mutual", "anagrams1", "math_asdiv", "coqa", "drop",
                 "headqa_en", "ethics_cm", "math_algebra", "pile_arxiv",
                 "triviaqa", "quac"):
        assert name in lds.LOADERS
