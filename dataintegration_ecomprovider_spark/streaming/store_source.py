"""`store_changes` — a Spark 4 Python streaming DataSource that TAILS the
versioned store's CDC feed.

``stream_into_store`` (streaming/incremental.py) streams INTO the store;
this is the other direction: every committed version becomes a micro-batch
of tagged insert/update/delete rows, so any Structured Streaming pipeline
can follow a store table —

    spark.dataSource.register(StoreChangesDataSource)
    (spark.readStream.format("store_changes")
        .option("root", root).option("table", "orders")
        .load()
        .writeStream...)

Offsets are store versions (the manifest is the write-ahead log, so the
offset→data mapping is exact and replayable); the batch for offsets
(v₁, v₂] is the key-wise diff of the two committed versions — the same
semantics as ``publish.read_changes(root, table, v₁, v₂)``, proven
equivalent in tests/test_store_source.py.

Execution shape: `partitions()` fans the diff out over `partitions`
key-hash shards (default 1); each executor-side `read()` streams both
versions' files batch-at-a-time through pyarrow, assigns shards with a
VECTORIZED deterministic row hash (no per-row Python in the scan), and
diffs its shard with a keyed pandas merge — per-row Python exists only
when yielding the O(changes) output tuples the DataSource API requires.
Memory per task is O(scan batch + shard).  Note each shard re-scans the
version's files (the predicate is a hash, not pushdownable), so
`partitions=N` costs N× the I/O — leave it at 1 unless the diff itself
is the bottleneck.  This is the convenience tail for the streaming glue
layer; a 100 TB backfill diff belongs in `read_changes` (full JVM join)
driven by ``foreachBatch`` — the source docstring of each is explicit
about which side of that line it sits on.

Reference analog: none — the reference re-runs jobs idempotently
(IsFirstJobRun, /root/reference/src/EcomProvider.cs:25, :937-966); a
versioned store turns that into an exact, resumable change stream.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

CHANGE_COL = "change_type"
_MOR_CHG = "__mor_chg"


def _shard_ids(pdf, keys: Sequence[str], num_shards: int):
    """Vectorized deterministic shard id per row: key columns are string-
    canonicalized, concatenated, and hashed with pandas' fixed-key row
    hash (stable across processes — every task partitions the keyspace
    identically).  No per-row Python."""
    import pandas as pd

    s = None
    for c in keys:
        part = pdf[c].astype("string").fillna("\x00null")
        s = part if s is None else s + "\x1f" + part
    h = pd.util.hash_pandas_object(s.astype(object), index=False).to_numpy()
    return h % num_shards


def _version_frame(
    root: str,
    table: str,
    version: int,
    columns: Sequence[str],
    keys: Sequence[str],
    shard: int,
    num_shards: int,
):
    """pandas DataFrame (Arrow-backed dtypes) holding THIS shard of one
    committed version, read via pyarrow (no SparkSession on executors).
    Files stream batch-at-a-time (memory O(batch + shard), never
    O(table)); merge-on-read deltas replay in commit order vectorized
    (keyed keep-last + delete-marker drop).  Version 0 = empty."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as ds

    from dataintegration_ecomprovider_spark.plans import publish

    columns = list(columns)
    if version == 0:
        return pd.DataFrame(columns=columns)
    entry = publish.tables_at(root, version).get(table)
    if entry is None:
        return pd.DataFrame(columns=columns)
    path = entry["path"] if isinstance(entry, dict) else entry
    partitioning = (
        "hive" if isinstance(entry, dict) and entry.get("partition_by") else None
    )

    def shard_frames(dpath, want_cols, part=None):
        dataset = ds.dataset(dpath, format="parquet", partitioning=part)
        present = [c for c in want_cols if c in dataset.schema.names]
        for batch in dataset.scanner(columns=present).to_batches():
            if batch.num_rows == 0:
                continue
            pdf = pa.Table.from_batches([batch]).to_pandas(
                types_mapper=pd.ArrowDtype
            )
            for c in want_cols:
                if c not in pdf.columns:
                    pdf[c] = None  # schema evolution: absent → null
            pdf = pdf[want_cols]
            if num_shards > 1:
                pdf = pdf.loc[_shard_ids(pdf, keys, num_shards) == shard]
            if len(pdf):
                yield pdf

    frames = [
        f.assign(**{_MOR_CHG: "upsert"})
        for f in shard_frames(path, columns, partitioning)
    ]
    # merge-on-read: replay the delta log in commit order (upserts
    # override, delete markers remove) — reading only the base would
    # silently serve stale rows for a MoR table
    deltas = entry.get("deltas", []) if isinstance(entry, dict) else []
    change = publish.MOR_CHANGE_COL
    for d in deltas:
        for f in shard_frames(d["path"], columns + [change]):
            frames.append(f.rename(columns={change: _MOR_CHG}))
    if not frames:
        return pd.DataFrame(columns=columns)
    merged = pd.concat(frames, ignore_index=True)
    # concat order == commit order, so keep="last" is the MoR override
    merged = merged.drop_duplicates(subset=list(keys), keep="last")
    merged = merged.loc[merged[_MOR_CHG].astype(object) != "delete"]
    return merged[columns]


def _py(v):
    """One output value: pandas/numpy scalar → plain Python (None for any
    NA) — applied only to the O(changes) rows actually yielded."""
    import pandas as pd

    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v.item() if hasattr(v, "item") else v


def _diff_frames(old, new, columns: Sequence[str], keys: Sequence[str]):
    """Yield (*row, change_type) tuples for the keyed diff old → new —
    one vectorized outer merge + column-equality pass; per-row Python
    only over the changed rows."""
    value_cols = [c for c in columns if c not in keys]
    merged = new.merge(
        old, on=list(keys), how="outer", suffixes=("", "__old"), indicator=True
    )
    flag = merged["_merge"].astype(object)

    def rows(pdf, cols, tag):
        for rec in pdf[cols].itertuples(index=False, name=None):
            yield tuple(_py(v) for v in rec) + (tag,)

    yield from rows(merged.loc[flag == "left_only"], list(columns), "insert")
    old_cols = [c if c in keys else c + "__old" for c in columns]
    yield from rows(merged.loc[flag == "right_only"], old_cols, "delete")

    both = merged.loc[flag == "both"]
    if not len(both):
        return
    if value_cols:
        changed = None
        for c in value_cols:
            a, b = both[c], both[c + "__old"]
            eq = a == b
            try:
                eq = eq.fillna(False)
            except (TypeError, ValueError):
                pass
            same = eq.astype(bool) | (a.isna() & b.isna())
            d = ~same
            changed = d if changed is None else (changed | d)
        both = both.loc[changed]
    else:
        both = both.iloc[0:0]  # key-only rows can't change
    yield from rows(both, list(columns), "update")


def _shard_partition(root, table, from_v, to_v, columns, keys, shard, num_shards):
    """One key-hash shard of a version-range diff, carried as a plain
    InputPartition value (a tuple pickles everywhere)."""
    return InputPartition(
        (root, table, from_v, to_v, list(columns), list(keys), shard, num_shards)
    )


class StoreChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        # Spark delivers DataSource options with case-insensitive
        # (lowercased) keys — normalize before lookups
        options = {k.lower(): v for k, v in options.items()}
        self.root = options["root"]
        self.table = options["table"]
        self.num_shards = int(options.get("partitions", "1"))
        self.columns = [f.name for f in schema.fields if f.name != CHANGE_COL]
        from dataintegration_ecomprovider_spark.plans import publish

        keys = options.get("keys")
        self.keys = (
            [k.strip() for k in keys.split(",")]
            if keys else publish.table_keys(self.root, self.table)
        )
        if not self.keys:
            raise ValueError(
                "store_changes needs key columns: publish with table_keys= "
                "or pass .option('keys', 'k1,k2')"
            )
        start = options.get("startingversion")
        if start is None:
            self._initial = publish.current_manifest(self.root)["version"]
        elif start == "earliest":
            self._initial = 0
        else:
            self._initial = int(start)

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        from dataintegration_ecomprovider_spark.plans import publish

        return {"version": publish.current_manifest(self.root)["version"]}

    def partitions(self, start: dict, end: dict):
        return [
            _shard_partition(
                self.root, self.table, start["version"], end["version"],
                self.columns, self.keys, shard, self.num_shards,
            )
            for shard in range(self.num_shards)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        root, table, from_v, to_v, columns, keys, shard, num_shards = partition.value
        old = _version_frame(root, table, from_v, columns, keys, shard, num_shards)
        new = _version_frame(root, table, to_v, columns, keys, shard, num_shards)
        yield from _diff_frames(old, new, columns, keys)

    def commit(self, end: dict) -> None:
        pass  # versions are immutable until vacuum; nothing to release


class StoreChangesDataSource(DataSource):
    """spark.readStream.format("store_changes") over a versioned store.

    Options: root (required), table (required), keys (comma list;
    defaults to the manifest's recorded table keys), startingVersion
    (int | "earliest"; default = the version current when the stream
    starts, i.e. new changes only), partitions (key-hash shards per
    micro-batch, default 1 — each extra shard re-scans the version's
    files, so raise it only when the diff compute itself dominates)."""

    @classmethod
    def name(cls) -> str:
        return "store_changes"

    def schema(self):
        import pyarrow.dataset as ds
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StringType, StructField, StructType

        from dataintegration_ecomprovider_spark.plans import publish

        root = self.options["root"]
        table = self.options["table"]
        manifest = publish.current_manifest(root)
        if table not in manifest["tables"]:
            raise KeyError(f"table {table!r} has no committed version under {root}")
        entry = manifest["tables"][table]
        if isinstance(entry, dict) and entry.get("schema_json"):
            # merge_into_mor(evolve_schema=True) widened the LOGICAL
            # schema past what the base parquet carries — the recorded
            # entry schema is authoritative (new columns stream as nulls
            # on pre-evolution rows)
            import json as _json

            base = StructType.fromJson(_json.loads(entry["schema_json"]))
        else:
            path = entry["path"] if isinstance(entry, dict) else entry
            partitioning = (
                "hive"
                if isinstance(entry, dict) and entry.get("partition_by")
                else None
            )
            arrow = ds.dataset(
                path, format="parquet", partitioning=partitioning
            ).schema
            base = from_arrow_schema(arrow)
        fields = [f for f in base.fields if not f.name.startswith("__k_")]
        return StructType([*fields, StructField(CHANGE_COL, StringType(), True)])

    def streamReader(self, schema) -> StoreChangesStreamReader:
        return StoreChangesStreamReader(schema, dict(self.options))
