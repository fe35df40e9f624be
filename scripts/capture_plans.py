"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <round>/<suffix> <query> [...]
  e.g. capture_plans.py r14/before u12_sql_matview_join

Writes plans/<round>/<query>_<suffix>.txt for each query's RETURNED
DataFrame (the driver-graded surface); a bare suffix defaults to
plans/r13 (the round-13 layout).  Lifecycle queries execute their store
commits during construction; only the final read's plan is captured —
the in-lifecycle delta plans are discussed in OPTIMIZATION_r*.md with
measured timings instead.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dataintegration_ecomprovider_spark import runtime
from dataintegration_ecomprovider_spark.session import get_spark


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if "/" in suffix:
        rnd, suffix = suffix.split("/", 1)
        outdir = REPO / "plans" / rnd
    else:
        outdir = REPO / "plans" / "r13"
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-capture")
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    queries = {n: qd.fn for n, qd in all_queries(include_retired=True).items()}
    import __spark_entry__ as entrymod

    queries["products_export_j4_p6_a1_a8"] = entrymod._q_products_export
    for name in names:
        df = queries[name](spark, "/root/testdata/sf0.1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        runtime.release_caches(spark)
        print(f"captured {name}_{suffix}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
