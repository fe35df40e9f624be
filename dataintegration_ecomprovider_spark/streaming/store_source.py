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
key-hash shards (default 1); each executor-side `read()` diffs with a
keyed pandas merge over frames read batch-at-a-time through pyarrow —
per-row Python exists only when yielding the O(changes) output tuples
the DataSource API requires.

MERGE-ON-READ FAST PATH (the batch `_mor_changes_fast` ported to the
tail, plans/publish.py): when the to-version's entry is the
from-version's entry plus appended delta files — the shape every
merge_into_mor-fed table produces per commit — the changed keys are
exactly the suffix deltas' keys, so the batch reads (a) the suffix delta
files and (b) a KEY-SCOPED read of the from-version (key values pushed
into the pyarrow scan as isin filters, files pruned through the _STATS
sidecar when present).  Per micro-batch cost is then I/O ∝ delta +
pruned-base and memory ∝ delta — NOT two full table reconstructions —
which is what a 100 TB MoR-fed replica loop needs
(tests/test_store_source.py pins both equivalence and the file-scoped
base read).  Versions that are NOT base-sharing log extensions (a
compact/rewrite landed in between) fall back to the generic full
reconstruction of both versions, where memory per task is
O(scan batch + shard) and each extra shard re-scans the files — a
100 TB backfill diff still belongs in `read_changes` (full JVM join)
driven by ``foreachBatch``.

Reference analog: none — the reference re-runs jobs idempotently
(IsFirstJobRun, /root/reference/src/EcomProvider.cs:25, :937-966); a
versioned store turns that into an exact, resumable change stream.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

CHANGE_COL = "change_type"
_MOR_CHG = "__mor_chg"


def _arrow_node(node):
    """One predicate node (leaf triple or and/or/not tree) as a pyarrow
    dataset expression.  Arrow expressions use Kleene logic and the
    dataset filter drops null results — the same SQL semantics Spark's
    Column filter applies, so pushdown and residual agree under NOT."""
    import pyarrow.dataset as ds

    from dataintegration_ecomprovider_spark.plans.publish import _is_composite

    if _is_composite(node):
        op = node[0].lower()
        children = [_arrow_node(c) for c in node[1:]]
        e = children[0]
        for c in children[1:]:
            e = (e | c) if op == "or" else (e & c)
        return ~e if op == "not" else e  # ("not", a, b) = ¬(a ∧ b)
    col, op = node[0], node[1]
    value = node[2] if len(node) > 2 else None
    f = ds.field(col)
    if op in ("=", "=="):
        return f == value
    if op == "<":
        return f < value
    if op == "<=":
        return f <= value
    if op == ">":
        return f > value
    if op == ">=":
        return f >= value
    if op == "in":
        return f.isin(list(value))
    if op == "is_null":
        return f.is_null()
    if op == "is_not_null":
        return ~f.is_null()
    raise ValueError(f"unsupported predicate op {op!r}")


def _arrow_filter(where):
    """The store's predicate tree as a pyarrow dataset expression — REAL
    pushdown: the scanner skips row groups via parquet statistics and
    never materializes non-matching rows into pandas.  Same algebra as
    publish.scan_table (triples AND-combined, nested and/or/not)."""
    expr = None
    for node in where:
        e = _arrow_node(node)
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


def _node_mask(pdf, node):
    """One predicate node as a NULLABLE boolean Series (pandas "boolean"
    dtype implements Kleene three-valued logic for & | ~): a comparison
    on a null value stays NA through NOT — so ¬(col = v) EXCLUDES null
    rows exactly as Spark/SQL do — and the caller's final fillna(False)
    turns unknown into excluded."""
    import pandas as pd

    from dataintegration_ecomprovider_spark.plans.publish import _is_composite

    if _is_composite(node):
        op = node[0].lower()
        masks = [_node_mask(pdf, c) for c in node[1:]]
        m = masks[0]
        for x in masks[1:]:
            m = (m | x) if op == "or" else (m & x)
        return ~m if op == "not" else m  # ("not", a, b) = ¬(a ∧ b)
    col, op = node[0], node[1]
    value = node[2] if len(node) > 2 else None
    s = pdf[col]
    if op == "is_null":
        return s.isna().astype("boolean")
    if op == "is_not_null":
        return (~s.isna()).astype("boolean")
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
    else:
        raise ValueError(f"unsupported predicate op {op!r}")
    m = m.astype("boolean")
    na = s.isna().astype(bool)
    if na.any():
        m[na] = pd.NA  # SQL: null compares unknown (matters under NOT)
    return m


def _pandas_mask(pdf, where):
    """The predicate tree as a boolean mask over a replayed frame — the
    post-MoR-replay residual filter.  Kleene logic inside (see
    _node_mask); unknown → excluded at the end, like SQL WHERE."""
    mask = None
    for node in where:
        m = _node_mask(pdf, node)
        mask = m if mask is None else (mask & m)
    return mask.fillna(False).astype(bool)


# Above this many changed keys the fast path stops pushing isin filters
# into the pyarrow scans / consulting the stats sidecar (the filter-set
# cost would rival the scan) — the batch stays exact via the per-batch
# pandas key mask, it just reads more.
TAIL_PUSHDOWN_MAX_KEYS = 100_000


def _scope_sets(key_scope, keys: Sequence[str]):
    """{key column: plain-python value list} for the changed-key scope;
    a column is omitted (no pushdown, exact merge still applies) when it
    holds nulls — arrow isin and null semantics don't mix."""
    out = {}
    for k in keys:
        s = key_scope[k]
        if s.isna().any():
            continue
        out[k] = s.tolist()
    return out


def _scope_arrow_filter(scope_sets, names):
    """The changed-key scope as a pyarrow conjunction of per-column isin
    filters — a SUPERSET of the exact key-tuple set (cross products of
    composite keys survive; the exact inner merge after replay removes
    them), which is all a pushdown needs to be."""
    import pyarrow.dataset as ds

    expr = None
    for k, vals in scope_sets.items():
        if k not in names:
            return None  # schema evolution: can't push, mask covers it
        e = ds.field(k).isin(vals)
        expr = e if expr is None else (expr & e)
    return expr


def _scoped_base_files(entry, path: str, where, scope_sets):
    """File-level skipping for the key-scoped base read, from the _STATS
    sidecar alone: keep a file iff every `where` predicate may match
    (publish's conservative min/max test) AND, per scoped key column,
    at least one changed key value falls inside the file's [min, max]
    (binary search, O(files × log keys)).  None = no stats / nothing
    pruned / hive layout (a file list would drop the partition columns)
    — scan the directory instead."""
    import bisect
    import os

    from dataintegration_ecomprovider_spark.plans import publish

    entries = publish._load_stats_entries(path)
    if entries is None:
        return None
    sorted_vals = {}
    for k, vals in scope_sets.items():
        try:
            sorted_vals[k] = sorted(vals)
        except TypeError:
            continue  # mixed types: skip this column's range test

    def keep(e) -> bool:
        for p in where:
            if not publish._node_may_match(e, p):
                return False
        for k, vals in sorted_vals.items():
            s = e.get("stats", {}).get(k)
            if not s or s[0] is None or s[1] is None:
                continue
            try:
                i = bisect.bisect_left(vals, s[0])
                if i >= len(vals) or vals[i] > s[1]:
                    return False
            except TypeError:
                continue
        return True

    kept = [os.path.join(path, e["file"]) for e in entries if keep(e)]
    if len(kept) == len(entries):
        return None
    return kept


def _scan_frames(
    source,
    want_cols: Sequence[str],
    keys: Sequence[str],
    shard: int,
    num_shards: int,
    partitioning=None,
    where=(),
    push_where: bool = False,
    scope_sets=None,
):
    """Stream one parquet dir (or explicit file list) batch-at-a-time as
    pandas frames (Arrow-backed dtypes): absent columns null-fill (schema
    evolution), the where/key-scope filters push into the pyarrow scan
    when eligible, and shard + key-scope masks apply per batch so task
    memory never exceeds O(batch + surviving rows)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as ds

    dataset = ds.dataset(source, format="parquet", partitioning=partitioning)
    names = set(dataset.schema.names)
    from dataintegration_ecomprovider_spark.plans.publish import _where_columns

    filt = (
        _arrow_filter(where)
        # a predicate column absent from this file set (schema
        # evolution) voids the pushdown; the residual mask covers it
        if push_where and where and _where_columns(where) <= names
        else None
    )
    if scope_sets and all(
        len(v) <= TAIL_PUSHDOWN_MAX_KEYS for v in scope_sets.values()
    ):
        scope_expr = _scope_arrow_filter(scope_sets, names)
        if scope_expr is not None:
            filt = scope_expr if filt is None else (filt & scope_expr)
    scope_py = (
        {k: set(v) for k, v in scope_sets.items()} if scope_sets else None
    )
    present = [c for c in want_cols if c in names]
    for batch in dataset.scanner(columns=present, filter=filt).to_batches():
        if batch.num_rows == 0:
            continue
        pdf = pa.Table.from_batches([batch]).to_pandas(
            types_mapper=pd.ArrowDtype
        )
        for c in want_cols:
            if c not in pdf.columns:
                pdf[c] = None  # schema evolution: absent → null
        pdf = pdf[list(want_cols)]
        if scope_py:
            mask = None
            for k, vals in scope_py.items():
                m = pdf[k].isin(vals)
                mask = m if mask is None else (mask & m)
            if mask is not None:
                pdf = pdf.loc[mask]
        if num_shards > 1 and len(pdf):
            pdf = pdf.loc[_shard_ids(pdf, keys, num_shards) == shard]
        if len(pdf):
            yield pdf


def _version_frame(
    root: str,
    table: str,
    version: int,
    columns: Sequence[str],
    keys: Sequence[str],
    shard: int,
    num_shards: int,
    where: Sequence[tuple] = (),
    key_scope=None,
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
    result is exactly filter(reconstruct(version)).

    `key_scope` (a deduplicated pandas frame of key tuples) restricts
    reconstruction to JUST those keys — the O(delta) tail's from-side
    read: key values push into every scan as isin filters, the _STATS
    sidecar prunes base files whose ranges hold no scoped key, and an
    exact inner merge on the key tuple finishes the job (the per-column
    pushdown is a superset for composite keys).  Key columns are
    immutable identifiers, so scoping the DELTA scans too is safe — a
    delta row for an out-of-scope key cannot affect an in-scope one."""
    import pandas as pd

    from dataintegration_ecomprovider_spark.plans import publish

    columns = list(columns)
    if version == 0 or (key_scope is not None and len(key_scope) == 0):
        return pd.DataFrame(columns=columns)
    entry = publish.tables_at(root, version).get(table)
    if entry is None:
        return pd.DataFrame(columns=columns)
    path = entry["path"] if isinstance(entry, dict) else entry
    partitioning = (
        "hive" if isinstance(entry, dict) and entry.get("partition_by") else None
    )
    scope_sets = _scope_sets(key_scope, keys) if key_scope is not None else None
    base_source = path
    if scope_sets and partitioning is None and all(
        len(v) <= TAIL_PUSHDOWN_MAX_KEYS for v in scope_sets.values()
    ):
        pruned = _scoped_base_files(entry, path, where, scope_sets)
        if pruned is not None:
            base_source = pruned

    frames = [
        f.assign(**{_MOR_CHG: "upsert"})
        for f in ([] if base_source == [] else _scan_frames(
            base_source, columns, keys, shard, num_shards,
            partitioning=partitioning if base_source is path else None,
            where=where, push_where=True, scope_sets=scope_sets,
        ))
    ]
    # merge-on-read: replay the delta log in commit order (upserts
    # override, delete markers remove, PARTIAL deltas overlay only their
    # recorded set_cols) — reading only the base would silently serve
    # stale rows for a MoR table
    deltas = entry.get("deltas", []) if isinstance(entry, dict) else []
    change = publish.MOR_CHANGE_COL
    merged = (
        pd.concat(frames, ignore_index=True)
        if frames else pd.DataFrame(columns=list(columns) + [_MOR_CHG])
    )
    for d in deltas:
        set_cols = d.get("set_cols") if "partial" in (
            d.get("kinds") or []
        ) else None
        if set_cols is None:
            for f in _scan_frames(
                d["path"], list(columns) + [change], keys, shard,
                num_shards, scope_sets=scope_sets,
            ):
                merged = pd.concat(
                    [merged, f.rename(columns={change: _MOR_CHG})],
                    ignore_index=True,
                )
            # concat order == commit order: keep="last" is the override
            merged = merged.drop_duplicates(subset=list(keys), keep="last")
        else:
            # partial overlay: update ONLY the file's set columns on rows
            # that exist (incl. delete markers, which stay deletes —
            # partials never resurrect); requested columns the file
            # doesn't set are untouched, keys never overlaid
            touch = [c for c in columns if c in set_cols and c not in keys]
            if not touch:
                continue
            pf = [
                f for f in _scan_frames(
                    d["path"], list(keys) + touch, keys, shard,
                    num_shards, scope_sets=scope_sets,
                )
            ]
            if not pf or not len(merged):
                continue
            pdf = pd.concat(pf, ignore_index=True)
            pdf = pdf.drop_duplicates(subset=list(keys), keep="last")
            pdf["__hit"] = True
            merged = merged.merge(
                pdf, on=list(keys), how="left", suffixes=("", "__p")
            )
            hit = merged["__hit"].fillna(False).astype(bool)
            for c in touch:
                merged[c] = merged[f"{c}__p"].where(hit, merged[c])
            merged = merged.drop(
                columns=["__hit"] + [f"{c}__p" for c in touch]
            )
    if not len(merged):
        return pd.DataFrame(columns=columns)
    merged = merged.loc[merged[_MOR_CHG].astype(object) != "delete"]
    if key_scope is not None and len(merged):
        # exact key-tuple scoping (the per-column isin was a superset)
        merged = merged.merge(key_scope, on=list(keys), how="inner")
    if where and len(merged):
        merged = merged.loc[_pandas_mask(merged, where)]
    return merged[columns]


def _mor_tail_frames(
    root: str,
    table: str,
    from_v: int,
    to_v: int,
    columns: Sequence[str],
    keys: Sequence[str],
    shard: int,
    num_shards: int,
    where: Sequence[tuple] = (),
):
    """O(delta) (old, new) frames for one micro-batch of a merge-on-read
    tail — the streaming port of publish._mor_changes_fast.  When the
    span is a chain of delta-log extensions and value-preserving
    rewrites (publish._bridged_delta_suffix — merge_into_mor commits
    plus compact/recluster commits carrying rewrite_of provenance), the
    keys that can differ are exactly the composed suffix deltas' keys:

    - `new` = last-wins replay of ONLY the suffix delta rows (minus
      delete markers), which IS those keys' to-version state (the
      rewrites in between preserve values);
    - `old` = the from-version reconstructed for JUST those keys
      (_version_frame key_scope: isin pushdown + stats-sidecar file
      pruning on the base scan).

    A change-free span (pure compaction / other tables' commits) yields
    two empty frames without scanning anything — the micro-batch that
    lands right after maintain_store's nightly compact costs metadata
    only.  _diff_frames then classifies insert/update/delete and drops
    no-op re-upserts exactly as the generic path would.  Returns None
    when a step in the span is neither a log extension nor a provenance-
    carrying rewrite — caller falls back to full reconstruction.
    Reference analog: the incremental re-run model (IsFirstJobRun,
    /root/reference/src/EcomProvider.cs:25, :937-966) — don't re-read
    the world to apply a day's changes."""
    import pandas as pd

    from dataintegration_ecomprovider_spark.plans import publish

    if from_v <= 0:
        return None  # first batch reconstructs the full state anyway
    suffix = publish._bridged_delta_suffix(root, table, from_v, to_v)
    if suffix is None:
        return None
    columns = list(columns)
    change = publish.MOR_CHANGE_COL
    frames = []
    for d in suffix:
        frames.extend(
            _scan_frames(
                d["path"], columns + [change], keys, shard, num_shards
            )
        )
    if not frames:
        empty = pd.DataFrame(columns=columns)
        return empty, empty
    deltas = pd.concat(frames, ignore_index=True)
    # concat order == commit order → keep="last" is each key's final state
    latest = deltas.drop_duplicates(subset=list(keys), keep="last")
    key_scope = latest[list(keys)].drop_duplicates()
    old = _version_frame(
        root, table, from_v, columns, keys, shard, num_shards, where,
        key_scope=key_scope,
    )
    new = latest.loc[latest[change].astype(object) != "delete"]
    new = new[columns]
    if where and len(new):
        new = new.loc[_pandas_mask(new, where)]
    return old, new


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
    from dataintegration_ecomprovider_spark.plans.publish import _norm_where

    return InputPartition(
        (root, table, from_v, to_v, list(columns), list(keys), shard,
         num_shards, _norm_where(where))
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

            from dataintegration_ecomprovider_spark.plans.publish import (
                _norm_where,
            )

            self.where = _norm_where(_json.loads(where))
        else:
            self.where = []
        # translate columns/keys/predicates LOGICAL → PHYSICAL once, at
        # init: the delta logs, historical bases and stats sidecars all
        # carry physical names (immutable within a base lineage), while
        # the declared stream schema keeps the logical names — the yield
        # is positional, so the physical column order below IS the
        # logical field order above.  A rename committed MID-STREAM needs
        # a restart (the checkpointed logical schema can't follow it) —
        # the standard Structured Streaming schema-change contract.
        _entry = publish.current_manifest(self.root)["tables"].get(self.table)
        if _entry is not None:
            self.columns = [publish._phys_name(_entry, c) for c in self.columns]
            self.keys = [publish._phys_name(_entry, k) for k in self.keys]
            self.where = publish._phys_where(_entry, self.where)
        start = options.get("startingversion")
        if start is None:
            self._initial = publish.current_manifest(self.root)["version"]
        elif start == "earliest":
            self._initial = 0
        else:
            self._initial = int(start)
        self.reader = options.get("reader")
        self.reader_ttl = float(
            options.get("readerttl", publish.READER_DEFAULT_TTL)
        )
        if self.reader and self.reader not in publish._read_readers(self.root):
            # first EVER start of a named stream: pin its initial offset
            # (and everything newer) against vacuum before any batch
            # plans.  Only when NO lease record exists at all — Spark
            # constructs reader instances freely, and re-registering
            # _initial from a later instance would drag an advanced floor
            # back to startingVersion; partitions()/commit() own renewals.
            # A lease that is present but EXPIRED (stream outage longer
            # than the TTL) is deliberately NOT re-seeded here: _initial
            # defaults to the CURRENT store version when startingVersion
            # is unset, which may be far past the checkpointed offset —
            # seeding it would assert a floor the restart doesn't hold.
            # The floor is instead re-established at partitions() time
            # from the REAL checkpointed batch offset; the residual gap
            # (vacuum racing the restart in that window) is inherent to
            # an expired lease — the TTL is the operator's declaration
            # that a consumer silent this long may lose history.
            publish.register_reader(
                self.root, self.reader, self._initial, self.reader_ttl
            )

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        from dataintegration_ecomprovider_spark.plans import publish

        return {"version": publish.current_manifest(self.root)["version"]}

    def partitions(self, start: dict, end: dict):
        if self.reader:
            # renew the retention floor at batch-PLAN time with the
            # from-version this batch (and any replay of it after a
            # mid-batch crash) needs — commit() also renews, but Spark
            # may stop an availableNow run before calling it, so the
            # plan-time renewal is what keeps the floor current
            from dataintegration_ecomprovider_spark.plans import publish

            publish.register_reader(
                self.root, self.reader, start["version"], self.reader_ttl
            )
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
        # O(delta) merge-on-read fast path: suffix deltas + a key-scoped
        # pruned base read, instead of reconstructing both versions
        fast = _mor_tail_frames(
            root, table, from_v, to_v, columns, keys, shard, num_shards,
            where,
        )
        if fast is not None:
            old, new = fast
        else:
            old = _version_frame(
                root, table, from_v, columns, keys, shard, num_shards, where
            )
            new = _version_frame(
                root, table, to_v, columns, keys, shard, num_shards, where
            )
        yield from _diff_frames(old, new, columns, keys)

    def commit(self, end: dict) -> None:
        # versions are immutable until vacuum; nothing to release — but a
        # NAMED stream renews its vacuum-retention lease here: the next
        # batch diffs FROM end["version"], so that version (and newer)
        # must survive until a later commit advances the floor
        if self.reader:
            from dataintegration_ecomprovider_spark.plans import publish

            publish.register_reader(
                self.root, self.reader, end["version"], self.reader_ttl
            )


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
    read_changes(where=...)), reader (a consumer name: the stream
    registers and renews a vacuum-retention lease so its checkpointed
    next offset — a store version — cannot be pruned out from under it;
    see publish.register_reader), readerTtl (lease seconds, default 7
    days)."""

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
        # present the entry's LOGICAL schema: rename/drop column maps
        # (publish.rename_column / drop_column) are metadata the physical
        # footers don't know about
        renames, dropped = publish._column_map(entry)
        fields = [
            StructField(renames.get(f.name, f.name), f.dataType, f.nullable)
            for f in base.fields
            if not f.name.startswith("__k_") and f.name not in dropped
        ]
        return StructType([*fields, StructField(CHANGE_COL, StringType(), True)])

    def streamReader(self, schema) -> StoreChangesStreamReader:
        return StoreChangesStreamReader(schema, dict(self.options))
