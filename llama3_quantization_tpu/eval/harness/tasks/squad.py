"""SQuAD v2 (`/root/reference/lm_eval/tasks/squad.py`): greedy answer +
"unanswerable" loglikelihood; the official squad_v2 aggregate (exact/f1,
HasAns/NoAns splits, best_* threshold sweep) implemented natively — the
reference delegates to `datasets.load_metric("squad_v2")`."""

import math

from .. import metrics
from ..base import Task, rf


def _squad2_aggregate(items, key):
    """Compute the squad_v2 metric dict over (prediction, reference) pairs
    and return `key`. Mirrors the official evaluate script: per-question
    max-over-golds normalized EM/F1, empty gold = unanswerable, and the
    best_* variants swept over no-answer probability thresholds."""
    preds, refs = zip(*items)
    rows = []
    for pred, ref in zip(preds, refs):
        golds = [t for t in ref["answers"]["text"] if t.strip()]
        has_ans = bool(golds)
        if has_ans:
            em = max(metrics.squad_em(pred["prediction_text"], g) for g in golds)
            f1 = max(metrics.squad_f1(pred["prediction_text"], g) for g in golds)
        else:
            correct = metrics.squad_normalize(pred["prediction_text"]) in ("", "unanswerable")
            em = f1 = float(correct)
        rows.append(
            {
                "em": em,
                "f1": f1,
                "has_ans": has_ans,
                "na_prob": pred.get("no_answer_probability", 0.0),
            }
        )
    n = len(rows)
    out = {
        "exact": 100.0 * sum(r["em"] for r in rows) / n,
        "f1": 100.0 * sum(r["f1"] for r in rows) / n,
    }
    has_rows = [r for r in rows if r["has_ans"]]
    no_rows = [r for r in rows if not r["has_ans"]]
    if has_rows:
        out["HasAns_exact"] = 100.0 * sum(r["em"] for r in has_rows) / len(has_rows)
        out["HasAns_f1"] = 100.0 * sum(r["f1"] for r in has_rows) / len(has_rows)
    if no_rows:
        out["NoAns_exact"] = 100.0 * sum(r["em"] for r in no_rows) / len(no_rows)
        out["NoAns_f1"] = 100.0 * sum(r["f1"] for r in no_rows) / len(no_rows)
    # best_*: for each candidate threshold t, predictions with na_prob > t
    # are treated as abstentions (correct iff unanswerable)
    for metric_key, best_key in [("em", "best_exact"), ("f1", "best_f1")]:
        best = -1.0
        for t in sorted({r["na_prob"] for r in rows} | {0.0, 1.1}):
            score = 0.0
            for r in rows:
                if r["na_prob"] > t:
                    score += float(not r["has_ans"])
                else:
                    score += r[metric_key]
            best = max(best, 100.0 * score / n)
        out[best_key] = best
    return out.get(key, 0.0)


def _agg(key):
    return lambda items: _squad2_aggregate(items, key)


class SQuAD2(Task):
    VERSION = 1
    DATASET_PATH = "squad_v2"
    DATASET_NAME = None

    KEYS = [
        "exact", "f1", "HasAns_exact", "HasAns_f1",
        "NoAns_exact", "NoAns_f1", "best_exact", "best_f1",
    ]

    def has_training_docs(self):
        return True

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        return self.dataset["train"]

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return (
            "Title: " + doc["title"] + "\n\n"
            "Background: " + doc["context"] + "\n\n"
            "Question: " + doc["question"] + "\n\n"
            "Answer:"
        )

    def doc_to_target(self, doc):
        answers = doc["answers"]["text"]
        return " " + (answers[0] if answers else "unanswerable")

    def should_decontaminate(self):
        return True

    def doc_to_decontamination_query(self, doc):
        return doc["context"]

    def construct_requests(self, doc, ctx):
        continuation = rf.greedy_until(ctx, ["\n"])
        is_unanswerable = rf.loglikelihood(ctx, " unanswerable")
        return continuation, is_unanswerable

    def process_results(self, doc, results):
        continuation, (logprob_unanswerable, _) = results
        predictions = {
            "id": doc["id"],
            "prediction_text": continuation,
            "no_answer_probability": math.exp(logprob_unanswerable),
        }
        references = {"id": doc["id"], "answers": doc["answers"]}
        return {key: (predictions, references) for key in self.KEYS}

    def aggregation(self):
        return {key: _agg(key) for key in self.KEYS}

    def higher_is_better(self):
        return {key: True for key in self.KEYS}
