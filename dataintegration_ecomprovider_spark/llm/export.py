"""Training-data export: deterministic sharded JSONL with a manifest.

The last step of a curation pipeline hands the corpus to a trainer as a
directory of similar-sized shards (data loaders stream shards
independently; reproducibility requires the same doc to land in the same
shard on every export).  Net-new relative to the reference, whose export
surface is the ODBC/CSV reader (src/EcomSourceReader.cs) — a training
fleet wants files, not cursors.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.llm.sampling import hash_bucket

SHARDS_FILE = "_SHARDS.json"


def shard_assign(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    salt_cols: tuple[str, ...] = (),
):
    """`df` plus a deterministic ``shard`` column in [0, num_shards) from
    the md5 bucket of the id — stable across runs, engines and cluster
    sizes (never use spark_partition_id or monotonically_increasing_id
    for this: both change with parallelism).

    `salt_cols` fold extra columns into the shard key — pass
    ``("epoch",)`` when exporting an apply_mixture output so an
    upsampled document's copies SPREAD across shards instead of piling
    into one (data loaders stream shards independently; co-locating a
    doc's repeats makes the trainer see them back-to-back)."""
    key = F.col(id_col).cast("string")
    if salt_cols:
        key = F.concat_ws(
            ":", key, *[F.col(c).cast("string") for c in salt_cols]
        )
    return df.withColumn("shard", F.pmod(hash_bucket(key), F.lit(num_shards)))


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    fmt: str = "json",
    salt_cols: tuple[str, ...] = (),
    shuffle_seed: int | None = None,
) -> dict:
    """Export `df` as `num_shards` deterministic shards under
    ``<path>/shard=N/`` (JSONL by default — the common trainer input —
    or parquet) plus a ``_SHARDS.json`` manifest of per-shard row counts
    and bytes.

    Scale shape: one shuffle co-locates each shard into one task
    (repartition on the shard id), so every ``shard=N`` directory holds
    one file and shard sizes are as even as the id hash — no
    driver-side iteration, no second pass over the data (row counts come
    from the same job via a pre-write aggregate on the ALREADY-assigned
    frame, bytes from a directory walk of O(shards) entries).

    `salt_cols` spreads row copies (e.g. mixture epochs) across shards —
    see shard_assign.  `shuffle_seed` writes each shard's rows in a
    deterministic pseudo-random order — md5(seed:id[:salts]) — instead of
    arrival order: the within-shard training order trainers want, changed
    globally by changing one integer, reproduced exactly on re-export.
    The sort is WITHIN the already-co-located shard partition (no extra
    exchange; sort cost is per-shard, not global).

    Returns the manifest {"num_shards", "rows", "shards": {n: {rows,
    bytes}}}."""
    if fmt not in ("json", "parquet"):
        raise ValueError(f"unsupported shard format {fmt!r}")
    assigned = shard_assign(df, num_shards, id_col=id_col, salt_cols=salt_cols)
    counts = {
        int(r["shard"]): int(r["n"])
        for r in assigned.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = assigned.repartition(num_shards, "shard")
    if shuffle_seed is not None:
        order = F.md5(
            F.concat_ws(
                ":",
                F.lit(str(int(shuffle_seed))),
                F.col(id_col).cast("string"),
                *[F.col(c).cast("string") for c in salt_cols],
            )
        )
        # lead with the partition column: the partitioned-file writer
        # requires rows sorted by it and would otherwise re-sort, throwing
        # the seeded order away
        out = out.sortWithinPartitions(F.col("shard"), order)
    writer = out.write.mode("errorifexists").partitionBy("shard")
    getattr(writer, fmt)(path)

    shards: dict[int, dict] = {}
    for n, rows in sorted(counts.items()):
        d = os.path.join(path, f"shard={n}")
        size = sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if not f.startswith(("_", "."))
        )
        shards[n] = {"rows": rows, "bytes": size}
    manifest = {
        "num_shards": num_shards,
        "format": fmt,
        "rows": sum(counts.values()),
        "shards": shards,
    }
    tmp = os.path.join(path, SHARDS_FILE + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, os.path.join(path, SHARDS_FILE))
    return manifest
