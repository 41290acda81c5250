"""Snapshot .explain('formatted') for named queries.

    python tools/plan_snap.py OUTDIR SUFFIX name [name...]

Writes OUTDIR/<name>_<SUFFIX>.txt per query, evaluated at
$SPARK_GRAFT_SF_DIR (default sf0.1) — the round's plan evidence files
(plans/r12/<query>_{before,after}.txt).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from data_ingestion_from_multiple_directories_linux_spark.session import (
        get_spark,
    )

    spark = get_spark(
        app_name="plan_snap",
        cpus=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        spark.catalog.clearCache()
        print(name, "done", flush=True)


if __name__ == "__main__":
    main()
