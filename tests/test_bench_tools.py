"""Unit tests for the bench-record tooling (tools/fold_bench.py,
tools/bench_compare.py) — pure-JSON logic, no Spark session. The round
record and the 2x regression gate are load-bearing artifacts; their
arithmetic should not depend on being exercised only at round end."""

from __future__ import annotations

import json
import subprocess
import sys

TOOLS = "/root/repo/tools"


def _run(path: str, *args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, path, *args], capture_output=True, text=True
    )


def _write_run(path, total, queries, cold_warm=None):
    payload = {
        "metric": "sum_min_query_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "py_worker_cold_warm": cold_warm or {},
        "sf": 0.1,
        "cpus": 32,
        "n_queries": len(queries),
    }
    path.write_text(json.dumps(payload) + "\n" + json.dumps({"value": total}) + "\n")


def test_fold_bench_takes_per_query_mins_and_lowest_total_base(tmp_path):
    r1 = tmp_path / "r1.out"
    r2 = tmp_path / "r2.out"
    _write_run(r1, 3.0, {"a": 1.0, "b": 2.0},
               {"m": {"cold": 5.0, "warm": 1.5}})
    _write_run(r2, 2.5, {"a": 1.5, "b": 1.0},
               {"m": {"cold": 4.0, "warm": 2.0}})
    out = tmp_path / "rec.json"
    p = _run(f"{TOOLS}/fold_bench.py", str(out), str(r1), str(r2))
    assert p.returncode == 0, p.stderr
    rec = json.loads(out.read_text())
    assert rec["value"] == 2.5                       # base = lowest total
    assert rec["aux_min_over_runs"]["queries"] == {"a": 1.0, "b": 1.0}
    assert rec["aux_min_over_runs"]["value"] == 2.0  # sum of mins
    assert rec["aux_min_over_runs"]["n_runs"] == 2
    assert rec["aux_cold_warm_min"]["m"] == {"cold": 4.0, "warm": 1.5}


def test_bench_compare_gate_and_noise_floor(tmp_path):
    hist = tmp_path / "hist.json"
    hist.write_text(json.dumps({
        "queries": {"fast": 0.02, "slow": 1.0, "ok": 0.5},
        "aux_min_over_runs": {"queries": {"fast": 0.02, "slow": 1.0, "ok": 0.5}},
    }))

    # candidate under the gate everywhere: tiny-baseline query is
    # noise-floored to 0.1s, so 0.15s is 1.5x, not 7.5x
    good = tmp_path / "good.json"
    good.write_text(json.dumps({"queries": {"fast": 0.15, "slow": 1.9, "ok": 0.4}}))
    p = _run(f"{TOOLS}/bench_compare.py", str(good), str(hist))
    assert p.returncode == 0, p.stdout + p.stderr
    assert "PASS" in p.stdout

    # a genuine 2.5x regression on a non-tiny baseline fails the gate
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"queries": {"fast": 0.05, "slow": 2.5, "ok": 0.4}}))
    p = _run(f"{TOOLS}/bench_compare.py", str(bad), str(hist))
    assert p.returncode == 1
    assert "OVER" in p.stdout and "slow" in p.stdout

    # a query with no recorded baseline is skipped, not crashed on
    new = tmp_path / "new.json"
    new.write_text(json.dumps({"queries": {"brand_new": 9.9, "ok": 0.4}}))
    p = _run(f"{TOOLS}/bench_compare.py", str(new), str(hist))
    assert p.returncode == 0
    assert "brand_new" not in p.stdout
