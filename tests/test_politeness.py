"""Politeness dispatch arithmetic (operators/politeness.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.operators.politeness import (
    CARRY_CAP_TICKS,
    DISPATCH_BUDGET,
    HOST_MOD,
    KNOWN_HOSTS,
    UNKNOWN_TWIN_CAP,
    frontier_dispatch_tick,
    politeness_tick,
)

SF = "/root/testdata/sf0.001"


def _tick(spark, pending_rows, alloc_rows, carry_rows, **kw):
    pending = spark.createDataFrame(
        pending_rows, "host string, doc_id bigint"
    )
    alloc = spark.createDataFrame(alloc_rows, "host string, alloc bigint")
    carry = spark.createDataFrame(carry_rows, "host string, carry bigint")
    disp, cout = politeness_tick(pending, alloc, carry, ["doc_id"], **kw)
    return (
        sorted((r["host"], r["doc_id"]) for r in disp.collect()),
        {r["host"]: r["carry"] for r in cout.collect()},
    )


def test_unknown_host_gets_floor_allowance(spark):
    """A host with pending URLs but absent from BOTH the mass table and
    the carry state dispatches its oldest URL each tick (default floor
    1) instead of starving forever — and earns no carry row."""
    disp, carry = _tick(
        spark,
        [("known", 1), ("new.example", 10), ("new.example", 11)],
        [("known", 2)],
        [],
    )
    assert ("new.example", 10) in disp  # oldest pending drains
    assert ("new.example", 11) not in disp  # floor is 1 per tick
    assert ("known", 1) in disp
    assert "new.example" not in carry  # unknown hosts never bank
    assert carry["known"] == 1  # alloc 2 − 1 dispatched


def test_unknown_host_floor_is_configurable(spark):
    disp, _ = _tick(
        spark,
        [("h", 1), ("h", 2), ("h", 3)],
        [],
        [],
        unknown_host_allowance=2,
    )
    assert disp == [("h", 1), ("h", 2)]


def test_zero_alloc_host_keeps_banked_carry(spark):
    """A host whose apportionment is 0 on a tick banks up to
    CARRY_CAP_TICKS × max(alloc, 1) = 2 units — the floor keeps its
    bank alive instead of zeroing it (0 × cap)."""
    # no pending for 'small' this tick: allowance 0 + 3 all banks,
    # capped at 2·max(0, 1) = 2
    disp, carry = _tick(
        spark,
        [("busy", 1)],
        [("busy", 1), ("small", 0)],
        [("small", 3)],
    )
    assert carry["small"] == min(3, CARRY_CAP_TICKS * 1) == 2
    assert carry["busy"] == 0
    assert disp == [("busy", 1)]


def test_carry_spends_and_caps(spark):
    """Banked allowance is spendable on top of alloc, and the residual
    bank is capped at CARRY_CAP_TICKS × alloc for alloc ≥ 1."""
    disp, carry = _tick(
        spark,
        [("h", i) for i in range(10)],
        [("h", 3)],
        [("h", 2)],
    )
    assert len(disp) == 5  # alloc 3 + carry 2
    assert disp == [("h", i) for i in range(5)]  # oldest first
    assert carry["h"] == 0
    # idle rich host: allowance 8+6 unspent, bank capped at 2·8
    _, carry2 = _tick(spark, [], [("h", 8)], [("h", 6)], carry_cap_ticks=2)
    assert carry2["h"] == 14  # 8+6 ≤ 16 cap → keeps all


def test_frontier_dispatch_tick_invariants(spark):
    """The oracle-checked batch twin: tick budgets hold (known-host
    dispatch ≤ budget + banked carry; unknown hosts ≤ 1 each), no URL
    dispatches twice, carries are non-negative and capped."""
    rows = frontier_dispatch_tick(spark, SF).collect()
    disp = [r for r in rows if r["kind"] == "dispatch"]
    carry = [r for r in rows if r["kind"] == "carry"]
    # no doc_id dispatched twice across ticks
    ids = [r["val"] for r in disp]
    assert len(ids) == len(set(ids))
    # every dispatched doc's host matches its doc_id bucket
    for r in disp:
        assert r["host"] == f"h{r['val'] % HOST_MOD}"
    known = {f"h{i}" for i in range(KNOWN_HOSTS)}
    for tick in (0, 1):
        n = Counter(r["host"] for r in disp if r["tick"] == tick)
        unknown_n = sum(v for h, v in n.items() if h not in known)
        known_n = sum(v for h, v in n.items() if h in known)
        banked = (
            sum(r["val"] for r in carry if r["tick"] == 0)
            if tick == 1
            else 0
        )
        assert known_n <= DISPATCH_BUDGET + banked
        # unknown hosts (buckets 8,9) drain on the floor allowance,
        # capped in AGGREGATE at UNKNOWN_TWIN_CAP hosts per tick
        assert unknown_n <= UNKNOWN_TWIN_CAP
    for r in carry:
        assert r["val"] >= 0
        assert r["host"] in known  # unknown hosts never bank


def test_frontier_dispatch_tick_matches_pure_python(spark):
    """Full pure-Python replay of both ticks (apportionment, floors,
    carry, discovery-order ranking) over the sf0.001 documents table."""
    from data_ingestion_from_multiple_directories_linux_spark.catalog import (
        load_table,
    )

    docs = [
        (r["doc_id"], r["n_chars"])
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "n_chars")
        .collect()
        if r["doc_id"] is not None
    ]
    host = lambda d: f"h{d % HOST_MOD}"  # noqa: E731

    mass = Counter()
    for d, nc in docs:
        if d % HOST_MOD < KNOWN_HOSTS and nc is not None:
            mass[host(d)] += nc
    mass = {h: m for h, m in mass.items() if m > 0}
    total = sum(mass.values())
    base = {h: DISPATCH_BUDGET * m // total for h, m in mass.items()}
    rem = {h: DISPATCH_BUDGET * m % total for h, m in mass.items()}
    extra = DISPATCH_BUDGET - sum(base.values())
    order = sorted(mass, key=lambda h: (-rem[h], h))
    alloc = {
        h: base[h] + (1 if i < extra else 0) for i, h in enumerate(order)
    }

    def tick(pending, allow_of, t):
        """pending: {host: [doc_id in rank order]}; t rotates the
        capped unknown-host subset (md5(host:t) rank)."""
        import hashlib

        unknown = sorted(
            (h for h in pending if h not in allow_of),
            key=lambda h: (
                hashlib.md5(f"{h}:{t}".encode()).hexdigest(),
                h,
            ),
        )
        served_unknown = set(unknown[:UNKNOWN_TWIN_CAP])
        disp, carry = {}, {}
        for h, q in pending.items():
            if h in allow_of:
                take = allow_of[h]
            elif h in served_unknown:
                take = 1
            else:
                take = 0
            disp[h] = q[: max(0, take)]
        for h, a in allow_of.items():
            carry[h] = min(
                a - len(disp.get(h, [])),
                max(alloc.get(h, 0), 1) * CARRY_CAP_TICKS,
            )
        return disp, carry

    evens = sorted(d for d, _ in docs if d % 2 == 0)
    odds = sorted(d for d, _ in docs if d % 2 == 1)
    p0 = {}
    for d in evens:
        p0.setdefault(host(d), []).append(d)
    disp0, carry0 = tick(p0, dict(alloc), 0)

    taken0 = {d for q in disp0.values() for d in q}
    p1 = {}
    for d in evens:  # backlog first (discovery tick 0)
        if d not in taken0:
            p1.setdefault(host(d), []).append(d)
    for d in odds:
        p1.setdefault(host(d), []).append(d)
    allow1 = {h: alloc[h] + carry0.get(h, 0) for h in alloc}
    disp1, carry1 = tick(p1, allow1, 1)

    expect = set()
    for t, dd in ((0, disp0), (1, disp1)):
        for h, q in dd.items():
            expect |= {("dispatch", t, h, d) for d in q}
    for t, cc in ((0, carry0), (1, carry1)):
        expect |= {("carry", t, h, c) for h, c in cc.items()}

    got = {
        (r["kind"], r["tick"], r["host"], r["val"])
        for r in frontier_dispatch_tick(spark, SF).collect()
    }
    assert got == expect


def test_unknown_host_aggregate_cap_and_rotation(spark):
    """A tick discovering many unknown hosts dispatches at most
    unknown_host_cap of them (aggregate over-budget spend bounded);
    the served subset rotates with the tick id so the backlog drains
    fairly instead of starving a fixed suffix."""
    pending = [(f"u{i}", i) for i in range(10)]
    disp0, _ = _tick(spark, pending, [], [], unknown_host_cap=3, tick=0)
    disp1, _ = _tick(spark, pending, [], [], unknown_host_cap=3, tick=1)
    assert len(disp0) == 3 and len(disp1) == 3
    # rotation: a different tick serves a different subset (md5(h:t)
    # rank — for these hosts ticks 0 and 1 pick distinct triples)
    assert {h for h, _ in disp0} != {h for h, _ in disp1}
    # uncapped escape hatch restores the r11 behavior
    disp_all, _ = _tick(spark, pending, [], [], unknown_host_cap=None)
    assert len(disp_all) == 10


def test_payload_columns_named_like_internals_survive(spark):
    """politeness_tick is a shared API: a pending payload whose columns
    collide with former internal names (rn/alloc/carry_in/allow) must
    pass through untouched — internals now use the reserved __pt_
    prefix (round-11 advice)."""
    pending = spark.createDataFrame(
        [("h", 1, 7, 8, 9, 10)],
        "host string, doc_id bigint, rn bigint, alloc bigint, "
        "carry_in bigint, allow bigint",
    )
    alloc = spark.createDataFrame([("h", 2)], "host string, alloc bigint")
    carry = spark.createDataFrame([], "host string, carry bigint")
    disp, _ = politeness_tick(pending, alloc, carry, ["doc_id"])
    rows = disp.collect()
    assert disp.columns == pending.columns
    assert [tuple(r) for r in rows] == [("h", 1, 7, 8, 9, 10)]
