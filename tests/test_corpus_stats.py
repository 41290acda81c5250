"""Vocabulary growth curve (operators/corpus_stats.py)."""

from __future__ import annotations

import re

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.corpus_stats import (
    DECILES,
    vocab_growth_curve,
)

SF = "/root/testdata/sf0.001"


def test_vocab_growth_matches_pure_python_and_is_monotone(spark):
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF, "documents").collect()
    )
    n = len(docs)

    def toks(t):
        return [x for x in re.split(r"\s+", t.lower()) if x] if t else []

    rows = sorted(vocab_growth_curve(spark, SF).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, DECILES + 1))
    prev_terms, prev_tokens = -1, -1
    for r in rows:
        prefix = (n * r["decile"]) // DECILES
        assert r["docs_prefix"] == prefix
        seen: set[str] = set()
        total = 0
        for d, t in docs:
            if d < prefix:
                tt = toks(t)
                seen.update(tt)
                total += len(tt)
        assert r["distinct_terms"] == len(seen)
        assert r["total_tokens"] == total
        # the curve is monotone by construction
        assert r["distinct_terms"] >= prev_terms
        assert r["total_tokens"] >= prev_tokens
        prev_terms, prev_tokens = r["distinct_terms"], r["total_tokens"]
    # Heaps-law shape on this corpus: the vocabulary saturates long
    # before the token count does (distinct growth is sub-linear).
    first, last = rows[0], rows[-1]
    assert last["total_tokens"] > first["total_tokens"] * (DECILES - 2)
    assert last["distinct_terms"] < first["distinct_terms"] * (DECILES - 2)


def test_source_token_drift_matches_pure_python(spark):
    import math
    from collections import Counter, defaultdict

    from data_ingestion_from_multiple_directories_linux_spark.operators.corpus_stats import (
        DRIFT_TOP_K,
        source_token_drift,
    )

    docs = load_table(spark, SF, "documents").collect()
    cells: Counter = Counter()
    for r in docs:
        if r["source"] is None or r["text"] is None:
            continue
        for t in re.split(r"\s+", r["text"].lower()):
            if t:
                cells[(r["source"], t)] += 1
    rtot: Counter = Counter()
    ctot: Counter = Counter()
    for (s, t), o in cells.items():
        rtot[s] += o
        ctot[t] += o
    n = sum(cells.values())
    expect = defaultdict(list)
    for s in rtot:
        for t in ctot:
            o = cells.get((s, t), 0)
            d = float(o * n - rtot[s] * ctot[t])
            micro = math.floor(
                ((d * d) / float(rtot[s] * ctot[t])) / float(n) * 1000000.0
            )
            expect[s].append((-micro, t, o))
    want = {}
    for s, lst in expect.items():
        for rank, (neg_micro, t, o) in enumerate(sorted(lst)[:DRIFT_TOP_K], 1):
            want[(s, t)] = (-neg_micro, o, rank)
    rows = source_token_drift(spark, SF).collect()
    got = {
        (r["source"], r["term"]): (r["contrib_micro"], r["o"], r["rank"])
        for r in rows
    }
    assert got == want
    for r in rows:
        assert r["n"] == n and r["r"] == rtot[r["source"]] and r["c"] == ctot[r["term"]]


def test_langid_confusion_consistent_with_predictor(spark):
    from collections import Counter

    from data_ingestion_from_multiple_directories_linux_spark.operators.corpus_stats import (
        langid_confusion,
    )
    from data_ingestion_from_multiple_directories_linux_spark.operators.text_analysis import (
        language_id_ngram,
    )

    pred = Counter(
        (r["lang"], r["predicted"])
        for r in language_id_ngram(spark, SF).collect()
    )
    got = {
        (r["lang"], r["predicted"]): r["n_docs"]
        for r in langid_confusion(spark, SF).collect()
    }
    assert got == dict(pred)
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(got.values()) == n_docs


def test_tokenizer_fertility_matches_pure_python(spark):
    import re as _re
    from collections import defaultdict

    from data_ingestion_from_multiple_directories_linux_spark.operators.corpus_stats import (
        tokenizer_fertility_by_lang,
    )

    pat = _re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
    agg = defaultdict(lambda: [0, 0, 0])  # n_docs, chars, bpe
    for r in load_table(spark, SF, "documents").collect():
        t = r["text"] or ""
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += len(t)
        a[2] += len(pat.findall(t.lower()))
    rows = tokenizer_fertility_by_lang(spark, SF).collect()
    assert {r["lang"] for r in rows} == set(agg)
    for r in rows:
        n, chars, bpe = agg[r["lang"]]
        assert (r["n_docs"], r["total_chars"], r["total_bpe_tokens"]) == (
            n,
            chars,
            bpe,
        )
        assert r["chars_per_token_micro"] == (chars * 1000000) // max(bpe, 1)
