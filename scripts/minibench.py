"""Min-of-K steal-gated timing for a subset of queries (guide §1).

Usage: python scripts/minibench.py <query> [<query> ...] [--reps N] [--sf DIR]

Same methodology as bench.py (noop sink, construction-inclusive,
min over quiet-steal samples, warmup rep dropped) but for a named subset,
so an optimization's before/after can be measured in ~1 min instead of a
full suite run.  Diagnostic only.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bench import _cpu_times, _steal_pct
from dataintegration_ecomprovider_spark import runtime
from dataintegration_ecomprovider_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    reps, sf_dir = 4, "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    spark = get_spark("minibench")
    from dataintegration_ecomprovider_spark.plans.registry import all_queries
    queries = {n: qd.fn for n, qd in all_queries(include_retired=True).items()}
    queries["products_export_j4_p6_a1_a8"] = entrymod._q_products_export

    samples: dict[str, list[tuple[float, float | None]]] = {n: [] for n in names}
    for it in range(reps):
        for n in names:
            c0 = _cpu_times()
            t0 = time.perf_counter()
            df = queries[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            steal = _steal_pct(c0, _cpu_times())
            runtime.release_caches(spark)
            if it > 0:  # rep 0 = warmup, discarded
                samples[n].append((dt, steal))
    for n in names:
        quiet = [(d, s) for d, s in samples[n] if s is None or s <= 2.0]
        pool = quiet or samples[n]
        best, steal = min(pool, key=lambda p: p[0])
        alln = ", ".join(f"{d:.2f}@{s}" for d, s in samples[n])
        print(f"{n}: min {best:.3f}s (steal {steal}) [{alln}]"
              + ("" if quiet else "  DEGRADED"))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
