"""Token-budget quality selection (operators/selection.py)."""

from __future__ import annotations

import math
import re

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.functions.text import (
    STOPWORDS,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.selection import (
    SELECT_TOKEN_BUDGET,
    budget_quality_selection,
)

SF = "/root/testdata/sf0.001"


def _scores(spark):
    """(doc_id, n_tokens, quality_milli) replayed in pure Python with
    the oracle's exact arithmetic (ASCII punctuation class, floor after
    one multiply)."""
    rows = []
    for r in load_table(spark, SF, "documents").collect():
        text = r["text"]
        toks = [t for t in re.split(r"\s+", (text or "").lower()) if t]
        n_tok = len(toks)  # NULL text carries 0 tokens (the COALESCE)
        stop = (
            sum(1 for t in toks if t in STOPWORDS) / len(toks) if toks else 0.0
        )
        punct = 0.0
        if text:
            kept = re.sub(r"[^a-zA-Z0-9\s]", "", text)
            punct = (len(text) - len(kept)) / len(text)
        q = math.floor(1000.0 * stop) - math.floor(1000.0 * punct)
        rows.append((r["doc_id"], n_tok, q))
    return rows


def _replay(spark):
    rows = sorted(_scores(spark), key=lambda x: (-x[2], x[0]))
    out, cum = [], 0
    for doc_id, n_tok, q in rows:
        cum_incl = cum + (n_tok or 0)
        if cum_incl <= SELECT_TOKEN_BUDGET:
            out.append((doc_id, q, n_tok, cum))
        cum = cum_incl
    return out


def test_budget_selection_matches_pure_python_prefix(spark):
    want = sorted(_replay(spark))
    got = sorted(
        (r["doc_id"], r["quality_milli"], r["n_tokens"], r["cum_before"])
        for r in budget_quality_selection(spark, SF).collect()
    )
    assert got == want and got
    # kept tokens fit the budget
    assert sum(n or 0 for _, _, n, _ in got) <= SELECT_TOKEN_BUDGET


def test_budget_selection_is_a_quality_prefix(spark):
    """Every kept document's score >= every dropped document's score
    (boundary ties permitted — the doc_id tiebreak splits them)."""
    kept_ids = {
        r["doc_id"] for r in budget_quality_selection(spark, SF).collect()
    }
    assert kept_ids
    scores = {d: q for d, _, q in _scores(spark)}
    dropped = [q for d, q in scores.items() if d not in kept_ids]
    assert dropped, "budget so large nothing was dropped — weak fixture"
    assert max(dropped) <= min(scores[d] for d in kept_ids)


def test_budget_selection_plan_has_no_global_sort(spark):
    """The running sum is the two-phase banded prefix sum — no
    single-partition exchange in the top-level plan."""
    plan = (
        budget_quality_selection(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan.split("InMemoryRelation", 1)[0]
