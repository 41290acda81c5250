"""Host-graph PageRank (operators/linkgraph.py).

Pins: (1) the Spark trajectory is bit-identical to a pure-Python
replay of the documented integer iteration; (2) mass is conserved up
to floor truncation (no dangling leak — self-edges guarantee
out-degree everywhere); (3) the graph is non-trivial (ranks actually
differ) and edge bookkeeping (in/out weights) is consistent.
"""

from __future__ import annotations

from collections import defaultdict

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.linkgraph import (
    DAMP_DEN,
    DAMP_NUM,
    LINK_RULES,
    MASS,
    N_HOSTS,
    PR_ITERS,
    host_pagerank,
)

SF = "/root/testdata/sf0.001"


def _python_pagerank(doc_ids: list[int]):
    n_docs = len(doc_ids)
    w: dict[tuple[int, int], int] = defaultdict(int)
    for d in doc_ids:
        src = d % N_HOSTS
        for m, o in LINK_RULES:
            w[(src, ((d * m) + o) % n_docs % N_HOSTS)] += 1
    out_w: dict[int, int] = defaultdict(int)
    in_w: dict[int, int] = defaultdict(int)
    n_in: dict[int, int] = defaultdict(int)
    for (s, t), ww in w.items():
        out_w[s] += ww
        in_w[t] += ww
        n_in[t] += 1
    hosts = sorted(out_w)
    n_hosts = len(hosts)
    r = {h: MASS // n_hosts for h in hosts}
    for _ in range(PR_ITERS):
        inflow: dict[int, int] = defaultdict(int)
        for (s, t), ww in w.items():
            inflow[t] += (r[s] * ww) // out_w[s]
        r = {
            h: (DAMP_NUM * inflow.get(h, 0)) // DAMP_DEN
            + ((DAMP_DEN - DAMP_NUM) * MASS) // (DAMP_DEN * n_hosts)
            for h in hosts
        }
    return r, n_in, in_w, out_w


def test_pagerank_matches_pure_python_trajectory(spark):
    doc_ids = [
        row["doc_id"]
        for row in load_table(spark, SF, "documents").select("doc_id").collect()
    ]
    r, n_in, in_w, out_w = _python_pagerank(doc_ids)
    rows = host_pagerank(spark, SF).collect()
    assert len(rows) == len(r) == N_HOSTS
    for row in rows:
        h = row["host"]
        assert row["rank_micro"] == r[h]
        assert row["n_in_hosts"] == n_in.get(h, 0)
        assert row["in_weight"] == in_w.get(h, 0)
        assert row["out_weight"] == out_w[h]


def test_pagerank_mass_conserved_up_to_floor(spark):
    rows = host_pagerank(spark, SF).collect()
    total = sum(row["rank_micro"] for row in rows)
    # every div floors: per-edge shares, the damping term, the teleport
    # term — each iteration loses at most (n_edges + 2·n_hosts) micros,
    # and losses do not compound beyond the stationary bound below.
    assert MASS * 97 // 100 <= total <= MASS
    # the graph is non-trivial: host sizes (and so ranks) differ.
    assert len({row["rank_micro"] for row in rows}) > 1


def test_pagerank_edge_bookkeeping_consistent(spark):
    rows = host_pagerank(spark, SF).collect()
    # total inbound weight == total outbound weight == 3 links per doc
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["in_weight"] for r in rows) == n_docs * len(LINK_RULES)
    assert sum(r["out_weight"] for r in rows) == n_docs * len(LINK_RULES)
    for r in rows:
        assert 1 <= r["n_in_hosts"] <= N_HOSTS


def test_largest_remainder_apportionment_exact(spark):
    from data_ingestion_from_multiple_directories_linux_spark.operators.linkgraph import (
        BUDGET,
        crawl_budget_apportionment,
    )

    rows = crawl_budget_apportionment(spark, SF).collect()
    assert len(rows) == N_HOSTS
    # the defining property: the budget is apportioned EXACTLY.
    assert sum(r["alloc"] for r in rows) == BUDGET
    total_mass = sum(r["mass"] for r in rows)
    for r in rows:
        assert r["extra"] in (0, 1)
        assert r["alloc"] == r["base_alloc"] + r["extra"]
        assert r["base_alloc"] == (BUDGET * r["mass"]) // total_mass
    # extras go to the largest remainders (host-id tiebreak)
    rem = sorted(
        ((BUDGET * r["mass"]) % total_mass, -r["host"]) for r in rows
    )
    n_extra = sum(r["extra"] for r in rows)
    cutoff = set()
    for remv, neg_h in sorted(rem, reverse=True)[:n_extra]:
        cutoff.add(-neg_h)
    assert {r["host"] for r in rows if r["extra"] == 1} == cutoff
    # masses are the pagerank ranks — consistency with host_pagerank
    pr = {r["host"]: r["rank_micro"] for r in host_pagerank(spark, SF).collect()}
    for r in rows:
        assert r["mass"] == pr[r["host"]]


def test_largest_remainder_property_random_masses(spark):
    """Property: for ANY non-negative mass vector with positive total,
    largest_remainder apportions the budget EXACTLY (Σalloc == budget),
    every allocation is base or base+1, and hosts with strictly larger
    remainders never receive less extra than smaller ones (the defining
    order of the Hamilton method)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_ingestion_from_multiple_directories_linux_spark.operators.linkgraph import (
        largest_remainder,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        masses=st.lists(
            st.integers(min_value=0, max_value=10**7), min_size=2, max_size=12
        ).filter(lambda m: sum(m) > 0),
        budget=st.integers(min_value=1, max_value=10**6),
    )
    def check(masses, budget):
        df = spark.createDataFrame(
            [(i, m) for i, m in enumerate(masses)], "host long, mass long"
        )
        rows = {r["host"]: r for r in largest_remainder(df, budget).collect()}
        total = sum(masses)
        assert sum(r["alloc"] for r in rows.values()) == budget
        for h, m in enumerate(masses):
            r = rows[h]
            assert r["base_alloc"] == (budget * m) // total
            assert r["extra"] in (0, 1)
            assert r["alloc"] == r["base_alloc"] + r["extra"]
        # Hamilton order: any host WITH an extra has (rem, -host) >= any
        # host without one
        def key(h):
            return ((budget * masses[h]) % total, -h)

        with_extra = [h for h in rows if rows[h]["extra"] == 1]
        without = [h for h in rows if rows[h]["extra"] == 0]
        if with_extra and without:
            assert min(key(h) for h in with_extra) > max(
                key(h) for h in without
            )

    check()
