"""Staleness audit: per query, newest driver CORRECTNESS row vs the last
git touch of its implementing file.

The driver caps correctness sampling at ~50 rows/round, so most queries
ride a prior-round row. The judge accepts a prior-round row only while
the query's implementing file is untouched since that row was recorded;
this tool automates the table the round-6 judge computed by hand.

Usage:
    python tools/staleness.py [--round N] [--out STALENESS_rNN.json]

Output JSON (one object per query, sorted by priority):
    {
      "query":        name,
      "file":         repo-relative implementing file,
      "row_round":    newest round with a driver CORRECTNESS row (0 = never),
      "row_commit_ts": unix ts of the commit recording that row (null if none),
      "file_commit_ts": unix ts of the file's last-touching commit,
      "file_commit":  short hash of that commit,
      "stale":        file touched after the row was recorded (or no row yet),
      "rank":         renewal priority (0 = renew first)
    }

Priority = stale queries first, ordered by (row_round ascending, then
file most-recently-touched first, then name); fresh queries follow in
(row_round ascending, name) order so the rotation still cycles them.
The head of this ordering is what ``_PRIORITY_FIRST`` in
``__spark_entry__.py`` should contain.
"""
from __future__ import annotations

import argparse
import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True, capture_output=True, text=True
    ).stdout.strip()


def newest_rows() -> tuple[dict[str, int], dict[int, int]]:
    """Map query -> newest CORRECTNESS round, and round -> commit ts."""
    newest: dict[str, int] = {}
    round_ts: dict[int, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            # A failed row is not evidence; only count green rows.
            if row.get("err") is None and row.get("rows_match") is not False:
                newest[name] = max(newest.get(name, 0), rnd)
        ts = _git("log", "-1", "--format=%ct", "--", os.path.relpath(path, REPO))
        # Not-yet-committed CORRECTNESS files (the current round's, at
        # the driver snapshot) date by file mtime, not 0 — otherwise the
        # round-end report marks the just-renewed rows stale (r07 judge
        # nit: the report read 103 stale when the true number was 54).
        round_ts[rnd] = int(ts) if ts else int(os.path.getmtime(path))
    return newest, round_ts


def query_files() -> dict[str, str]:
    """Map query name -> repo-relative implementing file."""
    import __spark_entry__ as E  # populates the registry

    out: dict[str, str] = {}
    for name, fn in E.queries().items():
        target = fn
        # Unwrap functools.partial / closures down to something inspectable.
        while hasattr(target, "func"):
            target = target.func
        try:
            src = inspect.getsourcefile(target) or inspect.getfile(target)
        except TypeError:
            src = sys.modules[target.__module__].__file__
        out[name] = os.path.relpath(os.path.abspath(src), REPO)
    return out


#: package sub-dirs whose modules count as helper deps. ``streaming``
#: and sibling ``operators`` included (ADVICE r07: attribution.py's
#: ``from ..streaming.stream_join import`` was invisible, the exact
#: helper-rewrite blind spot this map exists to close).
_DEP_PKGS = "functions|sources|ingest|streaming|operators"


def helper_deps(files: set[str]) -> dict[str, list[str]]:
    """Map implementing file -> the package helper modules it imports
    (functions/, sources/, ingest/, streaming/, sibling operators/,
    catalog). A query's behavior can change through a helper rewrite
    without its implementing file moving — the round-6 masking.py
    rewrite staled relational.py's masking queries exactly this way —
    so freshness must consider the newest touch across the file AND
    its helper imports. ``from ..pkg import a, b`` captures every
    name on the line (first line only for parenthesized multi-line
    imports — heuristic, matches current package style)."""
    dep_re = re.compile(
        rf"^\s*from \.\.({_DEP_PKGS})\.(\w+) import"
        r"|^\s*from \.\.(catalog) import"
        rf"|^\s*from \.\.({_DEP_PKGS}) import \(?([\w, ]+)"
        r"|^\s*from \.(\w+) import",  # sibling module, same dir
        re.M,
    )
    pkg = "data_ingestion_from_multiple_directories_linux_spark"
    out: dict[str, list[str]] = {}
    for f in files:
        deps: set[str] = set()
        try:
            text = open(os.path.join(REPO, f)).read()
        except OSError:
            out[f] = []
            continue
        for m in dep_re.finditer(text):
            if m.group(1) and m.group(2):
                deps.add(f"{pkg}/{m.group(1)}/{m.group(2)}.py")
            elif m.group(3):
                deps.add(f"{pkg}/catalog.py")
            elif m.group(4) and m.group(5):
                for name in m.group(5).split(","):
                    if name.strip():
                        deps.add(f"{pkg}/{m.group(4)}/{name.strip()}.py")
            elif m.group(6):
                deps.add(f"{os.path.dirname(f)}/{m.group(6)}.py")
        out[f] = sorted(d for d in deps if os.path.exists(os.path.join(REPO, d)))
    return out


def file_touch(paths: set[str]) -> dict[str, tuple[int, str]]:
    """Map repo-relative path -> (last commit ts, short hash)."""
    out: dict[str, tuple[int, str]] = {}
    for p in sorted(paths):
        line = _git("log", "-1", "--format=%ct %h", "--", p)
        if line:
            ts, h = line.split()
            out[p] = (int(ts), h)
        else:
            out[p] = (0, "uncommitted")
    return out


def build(current_round: int) -> list[dict]:
    rows, round_ts = newest_rows()
    files = query_files()
    deps = helper_deps(set(files.values()))
    all_paths = set(files.values()) | {d for ds in deps.values() for d in ds}
    touches = file_touch(all_paths)
    entries = []
    for name, path in files.items():
        rnd = rows.get(name, 0)
        row_ts = round_ts.get(rnd)
        f_ts, f_hash = touches[path]
        # `stale` matches the judge's method (implementing file only);
        # `stale_strict` also counts helper imports (functions/,
        # sources/, ingest/, catalog) — a query's behavior can change
        # through a helper rewrite without its implementing file moving
        # (the round-6 masking.py precedent)
        dep_ts = max(
            [(f_ts, path)] + [(touches[d][0], d) for d in deps[path]]
        )
        stale = rnd == 0 or (row_ts is not None and f_ts > row_ts)
        strict = rnd == 0 or (row_ts is not None and dep_ts[0] > row_ts)
        entries.append(
            {
                "query": name,
                "file": path,
                "row_round": rnd,
                "row_commit_ts": row_ts,
                "file_commit_ts": f_ts,
                "file_commit": f_hash,
                "newest_touch_ts": dep_ts[0],
                "newest_touch_file": dep_ts[1],
                "stale": stale,
                "stale_strict": strict,
            }
        )
    entries.sort(
        key=lambda e: (
            not e["stale"],           # judge-method stale first
            not e["stale_strict"],    # then helper-import staleness
            e["row_round"],           # oldest evidence first
            -e["newest_touch_ts"],    # most-recently-touched dep set first
            e["query"],
        )
    )
    for i, e in enumerate(entries):
        e["rank"] = i
    return entries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=50, help="print the first N")
    ap.add_argument(
        "--emit-priority",
        type=int,
        default=0,
        metavar="N",
        help="print the first N queries as a ready-to-paste Python list "
        "for __spark_entry__._PRIORITY_FIRST (stale-first tool order; "
        "review before pasting — e.g. a query whose ORACLE changed this "
        "round may deserve a slot ahead of strict row-age order)",
    )
    args = ap.parse_args()
    rnd = args.round
    if rnd is None:
        done = [
            int(m.group(1))
            for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
            if (m := re.search(r"r(\d+)\.json$", p))
        ]
        rnd = (max(done) + 1) if done else 1
    out = args.out or os.path.join(REPO, f"STALENESS_r{rnd:02d}.json")
    entries = build(rnd)
    with open(out, "w") as f:
        json.dump(entries, f, indent=1)
    n_stale = sum(e["stale"] for e in entries)
    n_strict = sum(e["stale_strict"] for e in entries)
    print(
        f"{len(entries)} queries, {n_stale} stale "
        f"({n_strict} incl. helper imports) -> {out}"
    )
    if args.emit_priority:
        print("_PRIORITY_FIRST = [")
        for e in entries[: args.emit_priority]:
            print(f'    "{e["query"]}",  # r{e["row_round"]:02d} {e["file"].rsplit("/", 1)[-1]}')
        print("]")
        return
    for e in entries[: args.top]:
        mark = "STALE" if e["stale"] else "fresh"
        print(
            f"  {e['rank']:3d} {mark} r{e['row_round']:02d} "
            f"{e['query']:40s} {e['file']} @{e['file_commit']}"
        )


if __name__ == "__main__":
    main()
