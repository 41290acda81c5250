"""Containment pairs, curriculum phases, embedding standardization."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.containment import (
    CONTAINMENT_THRESHOLD,
    SHINGLE_N,
    _FILLER,
    shingle_containment_pairs,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.traindata import (
    N_PHASES,
    curriculum_phases,
)

SF = "/root/testdata/sf0.001"


def _shingle_set(text, n=SHINGLE_N):
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_containment_matches_pure_python_and_catches_inclusion(spark):
    raw = load_table(spark, SF, "documents").collect()
    # twin offset is corpus-derived (max doc_id + 1), mirroring the
    # operator — no fixed constant a large corpus could collide with
    off = max(r["doc_id"] for r in raw) + 1
    docs = {
        r["doc_id"]: r["text"] for r in raw if r["text"] is not None
    }
    corpus = dict(docs)
    for d, t in docs.items():
        if d % 9 == 0:
            corpus[d + off] = t + " " + _FILLER
    sets = {d: _shingle_set(t) for d, t in corpus.items()}
    sets = {d: s for d, s in sets.items() if s}
    # pure-python replay over the inverted index's reachable pairs
    inv = defaultdict(set)
    for d, s in sets.items():
        for sh in s:
            inv[sh].add(d)
    cand = set()
    for ds in inv.values():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cand.add((a, b))
    expect = {}
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        cont = inter / min(len(sets[a]), len(sets[b]))
        if cont >= CONTAINMENT_THRESHOLD:
            jac = inter / len(sets[a] | sets[b])
            expect[(a, b)] = (inter, len(sets[a]), len(sets[b]), cont, jac)
    rows = shingle_containment_pairs(spark, SF).collect()
    got = {
        (r["id_a"], r["id_b"]): (
            r["inter"],
            r["n_a"],
            r["n_b"],
            r["containment"],
            r["jaccard"],
        )
        for r in rows
    }
    assert got == expect
    # every planted (original, container) pair is found at containment
    # 1.0 while its Jaccard sits below the 0.6 dedup threshold
    planted = [
        (d, d + off) for d in docs if d % 9 == 0 and sets.get(d)
    ]
    assert planted
    jacs = []
    for pair in planted:
        assert pair in got, pair
        inter, n_a, n_b, cont, jac = got[pair]
        assert cont == 1.0
        jacs.append(jac)
    # the blind spot: the 120-token filler dilutes every planted pair
    # below the 0.6 Jaccard dedup threshold, while containment flags
    # each one at exactly 1.0
    assert max(jacs) < 0.6


def test_curriculum_phases_exact_quartile_semantics(spark):
    docs = {
        r["doc_id"]: len(r["text"] or "")
        for r in load_table(spark, SF, "documents").collect()
    }
    n = len(docs)
    lens = sorted(docs.values())
    # exact thresholds: t_p = min length with cum*4 >= p*n
    cum = {}
    c = 0
    for v in lens:
        c += 1
        cum[v] = c  # last occurrence wins = cumulative count at value v
    ts = []
    for p in range(1, N_PHASES):
        ts.append(min(v for v in cum if cum[v] * N_PHASES >= p * n))
    rows = curriculum_phases(spark, SF).collect()
    assert len(rows) == n
    for r in rows:
        expect_phase = 1 + sum(1 for t in ts if docs[r["doc_id"]] > t)
        assert r["phase"] == expect_phase
        assert r["n_chars_len"] == docs[r["doc_id"]]
    by_phase = defaultdict(list)
    for r in rows:
        by_phase[r["phase"]].append(r["n_chars_len"])
    # ordered, non-empty phases: max(len of phase p) <= min(len of p+1)
    phases = sorted(by_phase)
    assert phases[0] == 1 and len(phases) >= 2
    for a, b in zip(phases, phases[1:]):
        assert max(by_phase[a]) <= min(by_phase[b])


def test_embedding_standardize_matches_numpy(spark):
    from data_ingestion_from_multiple_directories_linux_spark.operators.embeval import (
        embedding_standardize,
    )

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF, "embeddings").collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    }
    n = len(vecs)
    rows = embedding_standardize(spark, SF).collect()
    assert len(rows) == n * 64
    got = {(r["vec_id"], r["j"]): r["z_micro"] for r in rows}
    for j in (0, 7, 31, 63):
        ms = sum(math.floor(v[j] * 1e9) for v in vecs.values())
        s2 = sum(math.floor((v[j] * v[j]) * 1e9) for v in vecs.values())
        mu = ms / (1e9 * n)
        var = (s2 / (1e9 * n)) - (mu * mu)
        assert var > 0
        for vid, v in list(vecs.items())[:40]:
            z = math.floor(((v[j] - mu) / math.sqrt(var)) * 1e6)
            assert got[(vid, j)] == z
        # standardized mean is ~0 on the corpus's own moments
        zbar = sum(got[(vid, j)] for vid in vecs) / (n * 1e6)
        assert abs(zbar) < 0.01
