"""Temperature-scaled mixture allocation (operators/mixture.py)."""

from __future__ import annotations

import math
import re

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.mixture import (
    MASS_SCALE,
    MIX_BUDGET,
    temperature_mixture_alloc,
)

SF = "/root/testdata/sf0.001"


def _per_source(spark):
    per = {}
    for r in load_table(spark, SF, "documents").collect():
        if r["source"] is None:
            continue
        toks = [t for t in re.split(r"\s+", (r["text"] or "").lower()) if t]
        d, t = per.get(r["source"], (0, 0))
        per[r["source"]] = (d + 1, t + len(toks))
    return per


def test_mixture_matches_pure_python_largest_remainder(spark):
    per = _per_source(spark)
    mass = {
        s: math.floor(math.sqrt(t) * MASS_SCALE)
        for s, (d, t) in per.items()
        if t > 0
    }
    total = sum(mass.values())
    base = {s: (MIX_BUDGET * m) // total for s, m in mass.items()}
    rem = {s: (MIX_BUDGET * m) % total for s, m in mass.items()}
    leftover = MIX_BUDGET - sum(base.values())
    ranked = sorted(mass, key=lambda s: (-rem[s], s))
    extra = {s: (1 if i < leftover else 0) for i, s in enumerate(ranked)}

    rows = temperature_mixture_alloc(spark, SF).collect()
    assert len(rows) == len(mass)
    for r in rows:
        s = r["source"]
        assert (r["n_docs"], r["n_tokens"]) == per[s]
        assert r["mass"] == mass[s]
        assert r["base_alloc"] == base[s]
        assert r["extra"] == extra[s]
        assert r["alloc"] == base[s] + extra[s]
    # the apportionment invariant: the budget is spent exactly
    assert sum(r["alloc"] for r in rows) == MIX_BUDGET


def test_mixture_temperature_upweights_low_resource_sources(spark):
    """α=1/2 flattening: every source's budget share strictly exceeds
    its token share iff it is below-average-sized (and vice versa) —
    the property the temperature exists to produce."""
    rows = temperature_mixture_alloc(spark, SF).collect()
    tok_total = sum(r["n_tokens"] for r in rows)
    small = min(rows, key=lambda r: r["n_tokens"])
    big = max(rows, key=lambda r: r["n_tokens"])
    assert small["n_tokens"] < big["n_tokens"]
    assert small["alloc"] / MIX_BUDGET > small["n_tokens"] / tok_total
    assert big["alloc"] / MIX_BUDGET < big["n_tokens"] / tok_total
