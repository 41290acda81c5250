"""Interleaved subset A/B of lever configs, immune to slow host drift.

Usage:
    python tools/subset_ab.py out.json ROTATIONS q1 q2 ...

Each rotation runs every config ONCE (fresh subprocess = fresh JVM), in
rotation order, so a monotonic host-speed drift hits all configs alike.
Within a leg each query is timed exactly like bench.py (_run_once:
plan construction + noop sink, min of REPS, cache released between).
The folded per-config result = per-query min across rotations.

Configs (env deltas on top of the repo defaults):
    on        — HEAD defaults (spread opt-in, cached replan, 64k floor)
    noreplan  — SPARK_GRAFT_CACHED_REPLAN=false
    nofloor   — SPARK_GRAFT_COALESCE_MIN_PART=1m
    off       — all three levers off (pre-optimization behavior)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CONFIGS = {
    "on": {},
    "noreplan": {"SPARK_GRAFT_CACHED_REPLAN": "false"},
    "nofloor": {"SPARK_GRAFT_COALESCE_MIN_PART": "1m"},
    "off": {
        "SPARK_GRAFT_CACHED_REPLAN": "false",
        "SPARK_GRAFT_COALESCE_MIN_PART": "1m",
        "SPARK_GRAFT_REBALANCE_MIN_BYTES": "999999999999",
    },
}

LEG_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import bench
from data_ingestion_from_multiple_directories_linux_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark(app_name="subset-ab", cpus=bench.CPUS)
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
out = {{}}
for name in {names!r}:
    fn = qs[name]
    spark.sparkContext.setJobDescription("ab:" + name)
    best = None
    for _ in range(bench.REPS):
        sec, _m = bench._run_once(fn, spark)
        best = sec if best is None else min(best, sec)
    out[name] = round(best, 4)
print("SUBSET_AB_RESULT " + json.dumps(out))
"""


#: one hung JVM must not stall the whole interleave silently (ADVICE r12)
LEG_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_AB_TIMEOUT", "1800"))


def run_leg(names: list[str], env_delta: dict) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(env_delta)
    script = LEG_SCRIPT.format(repo=repo, names=list(names))
    try:
        p = subprocess.run(
            [sys.executable, "-c", script],
            env=env,
            capture_output=True,
            text=True,
            cwd=repo,
            timeout=LEG_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        raise SystemExit(f"leg timed out after {LEG_TIMEOUT_S}s")
    for line in p.stdout.splitlines():
        if line.startswith("SUBSET_AB_RESULT "):
            return json.loads(line[len("SUBSET_AB_RESULT "):])
    raise SystemExit(
        f"leg failed (rc={p.returncode}):\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    out_path = sys.argv[1]
    rotations = int(sys.argv[2])
    names = sys.argv[3:]
    runs: dict = {c: [] for c in CONFIGS}
    for r in range(rotations):
        for cfg, delta in CONFIGS.items():
            res = run_leg(names, delta)
            runs[cfg].append(res)
            print(
                f"rot{r} {cfg:9s} sum={sum(res.values()):7.2f}",
                flush=True,
            )
    folded = {
        cfg: {n: round(min(r[n] for r in rs), 4) for n in names}
        for cfg, rs in runs.items()
    }
    with open(out_path, "w") as f:
        json.dump({"folded": folded, "runs": runs, "rotations": rotations}, f, indent=1)
    print("\nper-config folded sums:")
    for cfg, q in folded.items():
        print(f"  {cfg:9s} {sum(q.values()):7.2f}")
    print(f"\nwritten: {out_path}")


if __name__ == "__main__":
    main()
