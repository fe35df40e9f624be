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


def _arrow_filter(where):
    """The store's (col, op, value) predicate triples as a pyarrow
    dataset expression — REAL pushdown: the scanner skips row groups via
    parquet statistics and never materializes non-matching rows into
    pandas.  Same algebra as publish.scan_table."""
    import pyarrow.dataset as ds

    expr = None
    for pred in where:
        col, op = pred[0], pred[1]
        value = pred[2] if len(pred) > 2 else None
        f = ds.field(col)
        if op in ("=", "=="):
            e = f == value
        elif op == "<":
            e = f < value
        elif op == "<=":
            e = f <= value
        elif op == ">":
            e = f > value
        elif op == ">=":
            e = f >= value
        elif op == "in":
            e = f.isin(list(value))
        elif op == "is_null":
            e = f.is_null()
        elif op == "is_not_null":
            e = ~f.is_null()
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
        expr = e if expr is None else (expr & e)
    return expr


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


def _pandas_mask(pdf, where):
    """The predicate triples as a boolean mask over a replayed frame —
    the post-MoR-replay residual filter (NA comparisons exclude, like
    SQL)."""
    import pandas as pd

    mask = None
    for pred in where:
        col, op = pred[0], pred[1]
        value = pred[2] if len(pred) > 2 else None
        s = pdf[col]
        if op in ("=", "=="):
            m = s == value
        elif op == "<":
            m = s < value
        elif op == "<=":
            m = s <= value
        elif op == ">":
            m = s > value
        elif op == ">=":
            m = s >= value
        elif op == "in":
            m = s.isin(list(value))
        elif op == "is_null":
            m = s.isna()
        elif op == "is_not_null":
            m = ~s.isna()
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
        try:
            m = m.fillna(False)
        except (TypeError, ValueError):
            pass
        m = m.astype(bool)
        mask = m if mask is None else (mask & m)
    return mask


def _version_frame(
    root: str,
    table: str,
    version: int,
    columns: Sequence[str],
    keys: Sequence[str],
    shard: int,
    num_shards: int,
    where: Sequence[tuple] = (),
):
    """pandas DataFrame (Arrow-backed dtypes) holding THIS shard of one
    committed version, read via pyarrow (no SparkSession on executors).
    Files stream batch-at-a-time (memory O(batch + shard), never
    O(table)); merge-on-read deltas replay in commit order vectorized
    (keyed keep-last + delete-marker drop).  Version 0 = empty.

    `where` restricts the frame to the FILTERED VIEW: the predicate is
    pushed into the pyarrow scan of the BASE (row-group skipping via
    parquet stats — a delta override or delete marker for a filtered-out
    base row still replays, because delta files are never scan-filtered)
    and re-applied as a residual mask AFTER the MoR replay, so the
    result is exactly filter(reconstruct(version))."""
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

    def shard_frames(dpath, want_cols, part=None, push_filter=False):
        dataset = ds.dataset(dpath, format="parquet", partitioning=part)
        names = set(dataset.schema.names)
        present = [c for c in want_cols if c in names]
        filt = (
            _arrow_filter(where)
            # a predicate column absent from this file set (schema
            # evolution) void the pushdown; the residual mask covers it
            if push_filter and where and all(p[0] in names for p in where)
            else None
        )
        for batch in dataset.scanner(columns=present, filter=filt).to_batches():
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
        for f in shard_frames(path, columns, partitioning, push_filter=True)
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
    if where and len(merged):
        merged = merged.loc[_pandas_mask(merged, where)]
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


def _shard_partition(
    root, table, from_v, to_v, columns, keys, shard, num_shards, where
):
    """One key-hash shard of a version-range diff, carried as a plain
    InputPartition value (a tuple pickles everywhere)."""
    return InputPartition(
        (root, table, from_v, to_v, list(columns), list(keys), shard,
         num_shards, [list(p) for p in where])
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
        where = options.get("where")
        if where:
            import json as _json

            self.where = [tuple(p) for p in _json.loads(where)]
        else:
            self.where = []
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
                self.columns, self.keys, shard, self.num_shards, self.where,
            )
            for shard in range(self.num_shards)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        (root, table, from_v, to_v, columns, keys, shard, num_shards,
         where) = partition.value
        where = [tuple(p) for p in where]
        old = _version_frame(
            root, table, from_v, columns, keys, shard, num_shards, where
        )
        new = _version_frame(
            root, table, to_v, columns, keys, shard, num_shards, where
        )
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
    files, so raise it only when the diff compute itself dominates),
    where (JSON list of scan_table predicate triples, e.g.
    '[["grp","=","a"]]' — tail the FILTERED view's CDC with the
    predicate pushed into the pyarrow base scans, the streaming twin of
    read_changes(where=...))."""

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
