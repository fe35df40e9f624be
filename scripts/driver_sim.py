"""Simulate the driver's t1/t2 gates from the outside (the real surface).

Usage: python scripts/driver_sim.py [sf_dir] [name_substring ...]
Runs entry(spark) (t1 smoke), then every queries() entry vs its DuckDB
oracle at sf_dir (default /root/testdata/sf0.01 — the t2 gate SF), and
prints one line per query: MATCH / MISMATCH / ROWS-ONLY.  Extra args
restrict the run to queries whose name contains any of the substrings.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from dataintegration_ecomprovider_spark import runtime
from dataintegration_ecomprovider_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canonical(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def frames_equal(a, b) -> tuple[bool, str]:
    a, b = canonical(a), canonical(b)
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col].tolist(), b[col].tolist())):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return False, f"{col}[{i}]: {x!r} != {y!r}"
            elif str(x) != str(y):
                return False, f"{col}[{i}]: {x!r} != {y!r}"
    return True, ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("driver-sim")

    if not only:
        # t1 smoke
        edf = entrymod.entry(spark)
        n = edf.count()
        print(f"t1 entry(): {n} rows, schema [{', '.join(f.name for f in edf.schema.fields)}]")
        assert n >= 0

    # t2 oracle gate
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        queries = {n: q for n, q in queries.items() if any(s in n for s in only)}
    failed = []
    for name in sorted(queries):
        sdf = queries[name](spark, sf_dir).toPandas()
        # results are consumed — free any persisted/checkpointed
        # intermediates before the next query (cache-hygiene contract)
        runtime.release_caches(spark)
        leaked = runtime.persistent_rdd_ids(spark)
        assert not leaked, f"{name}: leaked persistent RDDs {leaked}"
        if name not in oracles:
            print(f"t2 {name}: ROWS-ONLY ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        ok, why = frames_equal(sdf, odf)
        print(f"t2 {name}: {'MATCH' if ok else 'MISMATCH ' + why} ({len(sdf)} rows)")
        if not ok:
            failed.append(name)
    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print(f"ALL {len(queries)} QUERIES OK at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
