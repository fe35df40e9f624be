"""SQL DML front-end for the versioned store — MERGE / DELETE / INSERT
statements translating to the store's merge family, so pure-SQL tooling
can WRITE the store (register_store already covers reads).

The reference's callers speak SQL to SQL Server; this store's write
surface was Python-only (merge_into / merge_into_mor), which walls off
every SQL-speaking orchestrator.  ``store_sql(spark, root).sql(...)``
accepts the Delta-Lake-shaped canonical DML forms and routes them to the
same engine paths the Python API uses — identical semantics by
construction (the round-trip parity suite in tests/test_store_sql.py
pins the U1-U3 mode matrix plus delete-incoming against the Python API):

    MERGE INTO t USING s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *        -- U1/U2 full upsert
    MERGE INTO t USING s ON ... WHEN NOT MATCHED THEN INSERT *   -- U3 insert-only
    MERGE INTO t USING s ON ... WHEN MATCHED THEN UPDATE SET *   -- U3 update-only
    MERGE INTO t USING s ON ... WHEN MATCHED THEN DELETE         -- U4 delete-incoming
    DELETE FROM t WHERE <predicate>
    INSERT INTO t <SELECT ...>
    SELECT ... FROM store_t [VERSION AS OF n | TIMESTAMP AS OF 'ts'] ...
    CREATE TABLE t [KEYED BY (k1, k2)] AS SELECT ...
    DROP TABLE t                          -- O(1) metadata commit
    OPTIMIZE t [ZORDER BY (c1, c2)]       -- compact / clustered rewrite
    VACUUM [RETAIN n VERSIONS|HOURS|DAYS] -- count- or time-based retention
    DESCRIBE HISTORY [t]                  -- committed versions, newest first
    DESCRIBE DETAIL t                     -- zero-job profile (profile_table)
    RESTORE VERSION AS OF n               -- store-wide rollback
    EXPORT TABLE t TO '<dir>' [SHARDS n]  -- CDC-maintained shard export

and multi-statement ATOMIC blocks — several MERGEs committed as ONE
store version (publish.merge_many_mor)::

    with store_sql(spark, root).transaction(txn=("job", 7)) as tx:
        tx.sql("MERGE INTO orders USING s1 ON ... WHEN ...")
        tx.sql("MERGE INTO lines  USING s2 ON ... WHEN ...")

`s` (the source) may be a session temp view, another table of the same
store, or a parenthesized SELECT (run against the store's registered
views plus any session views).  The ON clause must be an AND-conjunction
of target=source column equalities — the store's merges are key-based,
exactly like its Python API (arbitrary ON predicates are SQL Server's
generality, not MERGE-on-keys semantics).

``mor=True`` routes through merge_into_mor (O(staging) delta commits);
the default is the copy-on-write merge_into.  DELETE FROM always
rewrites (it has no per-row staging); at 100 TB prefer a keyed MERGE
... WHEN MATCHED THEN DELETE with mor=True.

Deliberately NOT a general SQL engine: everything inside a SELECT is
handed to Spark SQL untouched; this module only parses the thin DML
shell Spark SQL itself lacks for external stores.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from dataintegration_ecomprovider_spark.plans import publish

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>\w+)(?:\s+(?:AS\s+)?(?P<talias>\w+))?"
    r"\s+USING\s+(?:(?P<subquery>\(.*\))|(?P<source>\w+))"
    r"(?:\s+(?:AS\s+)?(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.*?)"
    r"(?P<clauses>(?:\s+WHEN\s+.*)?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED\s+(?:THEN\s+)?"
    r"(?P<action>UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE)",
    re.IGNORECASE,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<target>\w+)\s+WHERE\s+(?P<where>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<target>\w+)\s+(?P<select>(?:\(\s*)?SELECT\s+.+?(?:\s*\))?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EQ_RE = re.compile(r"^\s*(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)\s*$")
_SELECT_RE = re.compile(r"^\s*(?:SELECT|WITH)\b", re.IGNORECASE)
_ASOF_RE = re.compile(
    r"(?P<table>\w+)\s+(?:(?:VERSION\s+AS\s+OF\s+(?P<version>\d+))|"
    r"(?:TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'))",
    re.IGNORECASE,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<target>\w+)"
    r"(?:\s+ZORDER\s+BY\s+\(?(?P<cols>[\w\s,]+?)\)?)?\s*;?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM(?:\s+RETAIN\s+(?P<keep>\d+)\s+"
    r"(?P<unit>VERSIONS?|HOURS?|DAYS?))?\s*;?\s*$",
    re.IGNORECASE,
)
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<target>\w+)"
    r"(?:\s+KEYED\s+BY\s+\(?(?P<keys>[\w\s,]+?)\)?)?"
    r"\s+AS\s+(?P<select>SELECT\s+.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<target>\w+)\s*;?\s*$", re.IGNORECASE
)
_DETAIL_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+(?P<target>\w+)\s*;?\s*$", re.IGNORECASE
)
_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY(?:\s+(?P<target>\w+))?\s*;?\s*$", re.IGNORECASE
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_EXPORT_RE = re.compile(
    r"^\s*EXPORT\s+TABLE\s+(?P<target>\w+)\s+TO\s+'(?P<path>[^']+)'"
    r"(?:\s+SHARDS\s+(?P<shards>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)


class StoreSQL:
    """One store root's SQL DML session.  Statements run against the
    store's CURRENT version; each DML lands as one atomic commit through
    the same merge/publish paths as the Python API."""

    def __init__(self, spark: SparkSession, root: str, mor: bool = False,
                 prefix: str = "store_"):
        self.spark = spark
        self.root = root
        self.mor = mor
        self.prefix = prefix
        self._tx_merges: dict | None = None

    def transaction(self, txn: tuple[str, int] | None = None):
        """Multi-statement ATOMIC transaction block: every ``MERGE INTO``
        issued inside the `with` body is parsed and staged immediately but
        committed TOGETHER as one store version on exit
        (publish.merge_many_mor) — the SQL face of the multi-table write
        guarantee::

            with store_sql(spark, root).transaction(txn=("job", 7)) as tx:
                tx.sql("MERGE INTO orders USING s1 ON ... WHEN ...")
                tx.sql("MERGE INTO lines  USING s2 ON ... WHEN ...")

        Only MERGE statements may appear inside a block (other statements
        commit independently, which would break the atomicity the block
        promises — they raise instead).  One MERGE per target table per
        block (two merges into one table have an ordering no single
        version can express).  An exception inside the body commits
        NOTHING.  `txn` gates the whole block's replay."""
        outer = self

        class _Tx:
            def __enter__(tx):
                outer._tx_merges = {}
                return outer

            def __exit__(tx, exc_type, exc, tb):
                merges, outer._tx_merges = outer._tx_merges, None
                if exc_type is not None:
                    return False  # nothing committed
                if merges:
                    publish.merge_many_mor(
                        outer.spark, outer.root, merges, txn=txn
                    )
                return False

        return _Tx()

    # -- source resolution -------------------------------------------------
    def _frame(self, ref: str | None, subquery: str | None) -> DataFrame:
        if subquery:
            # route through _select so a MERGE source subquery can also
            # time-travel (USING (SELECT ... VERSION AS OF n) s)
            return self._select(subquery.strip().strip("()"))
        assert ref is not None
        try:
            return self.spark.table(ref)  # session temp view wins
        except Exception:  # noqa: BLE001 — fall through to store tables
            return publish.read_table(self.spark, self.root, ref)

    def _keys_from_on(self, on: str, target: str, talias: str | None,
                      source: str | None, salias: str | None) -> list[str]:
        t_names = {n.lower() for n in (target, talias) if n}
        s_names = {n.lower() for n in (source, salias) if n}
        keys: list[str] = []
        for part in re.split(r"\s+AND\s+", on.strip(), flags=re.IGNORECASE):
            m = _EQ_RE.match(part)
            if not m:
                raise ValueError(
                    f"MERGE ON clause must be AND-ed column equalities; "
                    f"got {part.strip()!r}"
                )
            lq, lc, rq, rc = m.groups()
            # orient each equality target-side → key column
            if lq and lq.lower() in s_names or rq and rq.lower() in t_names:
                lc, rc = rc, lc
            if lc.lower() != rc.lower():
                raise ValueError(
                    f"MERGE keys must pair the same column on both sides "
                    f"(key-based merge); got {part.strip()!r}"
                )
            keys.append(lc)
        return keys

    # -- statements --------------------------------------------------------
    def sql(self, statement: str) -> dict | DataFrame:
        """Execute one statement.  DML / maintenance statements return the
        engine call's result manifest/summary dict; SELECT (including
        time travel) and DESCRIBE HISTORY return a DataFrame."""
        m = _MERGE_RE.match(statement)
        if m:
            return self._merge(m)
        if self._tx_merges is not None:
            m = _INSERT_RE.match(statement)
            if m:
                # INSERT INTO is merge-engine-backed (insert-only), so it
                # may join the atomic block like any other MERGE
                target = m.group("target")
                if target in self._tx_merges:
                    raise ValueError(
                        f"transaction block already merges into {target!r} "
                        "— one statement per table per block"
                    )
                publish.register_store(
                    self.spark, self.root, prefix=self.prefix
                )
                keys = publish.table_keys(self.root, target)
                if not keys:
                    raise ValueError(
                        f"INSERT INTO {target!r} needs recorded keys "
                        "(publish with table_keys=)"
                    )
                self._tx_merges[target] = {
                    "staging": self._select(m.group("select").strip().strip("()")),
                    "keys": list(keys),
                    "insert_new": True, "update_existing": False,
                }
                return {"deferred": target}
            raise ValueError(
                "only MERGE INTO / INSERT INTO statements may run inside "
                "a transaction() block — anything else commits its own "
                f"version: {statement[:80]!r}"
            )
        m = _DELETE_RE.match(statement)
        if m:
            return self._delete(m.group("target"), m.group("where"))
        m = _INSERT_RE.match(statement)
        if m:
            return self._insert(m.group("target"), m.group("select"))
        if _SELECT_RE.match(statement):
            return self._select(statement)
        m = _OPTIMIZE_RE.match(statement)
        if m:
            cols = m.group("cols")
            return publish.compact(
                self.spark, self.root, m.group("target"),
                cluster_by=(
                    [c.strip() for c in cols.split(",")] if cols else None
                ),
            )
        m = _VACUUM_RE.match(statement)
        if m:
            unit = (m.group("unit") or "VERSIONS").upper()
            keep = int(m.group("keep") or 2)
            if unit.startswith("VERSION"):
                return publish.vacuum(self.spark, self.root, keep_versions=keep)
            secs = keep * 3600 * (24 if unit.startswith("DAY") else 1)
            return publish.vacuum(
                self.spark, self.root, keep_versions=1, keep_seconds=secs
            )
        m = _CTAS_RE.match(statement)
        if m:
            publish.register_store(self.spark, self.root, prefix=self.prefix)
            target = m.group("target")
            if target in publish.current_manifest(self.root)["tables"]:
                raise ValueError(f"table {target!r} already exists")
            keys = m.group("keys")
            return publish.publish_tables(
                self.spark, {target: self.spark.sql(m.group("select"))},
                self.root,
                table_keys=(
                    {target: [k.strip() for k in keys.split(",")]}
                    if keys else None
                ),
            )
        m = _DROP_RE.match(statement)
        if m:
            return publish.drop_table(self.root, m.group("target"))
        m = _DETAIL_RE.match(statement)
        if m:
            import json as _json

            p = publish.profile_table(self.root, m.group("target"))
            return self.spark.createDataFrame(
                [(p["table"], _json.dumps(p["keys"]),
                  _json.dumps(p["partition_by"]),
                  int(p["files"]["count"]) if p["files"] else None,
                  int(p["files"]["rows"]) if p["files"] else None,
                  int(p["files"]["bytes"]) if p["files"] else None,
                  int(p["deltas_pending"]["count"]),
                  _json.dumps(p["columns"], sort_keys=True))],
                "table string, keys string, partition_by string, "
                "num_files long, rows long, bytes long, "
                "deltas_pending long, columns string",
            )
        m = _HISTORY_RE.match(statement)
        if m:
            return self._history(m.group("target"))
        m = _RESTORE_RE.match(statement)
        if m:
            return publish.rollback(self.root, int(m.group("version")))
        m = _EXPORT_RE.match(statement)
        if m:
            from dataintegration_ecomprovider_spark.llm.export import (
                maintain_training_shards,
            )

            target = m.group("target")
            keys = publish.table_keys(self.root, target)
            if not keys:
                raise ValueError(
                    f"EXPORT TABLE {target!r} needs recorded keys "
                    "(publish with table_keys=)"
                )
            # CDC-maintained: the first EXPORT seeds the shard mirror,
            # re-running the same statement refreshes only the shards
            # holding changed rows
            return maintain_training_shards(
                self.spark, self.root, m.group("path"), src=target,
                num_shards=int(m.group("shards") or 64), id_col=keys[0],
            )
        raise ValueError(
            "unsupported statement (MERGE INTO / DELETE FROM / INSERT INTO "
            "/ SELECT [VERSION|TIMESTAMP AS OF] / CREATE TABLE ... AS "
            "SELECT / DROP TABLE / OPTIMIZE [ZORDER BY] / VACUUM / "
            f"DESCRIBE HISTORY|DETAIL / RESTORE / EXPORT TABLE): {statement[:120]!r}"
        )

    def _select(self, statement: str) -> DataFrame:
        """SELECT over the store's registered views, with Delta-shaped
        time travel: `FROM <prefix><table> VERSION AS OF <n>` /
        `TIMESTAMP AS OF '<ts>'` clauses resolve through
        read_table_at/read_table_asof into per-statement temp views and
        the rewritten text is handed to Spark SQL untouched."""
        publish.register_store(self.spark, self.root, prefix=self.prefix)

        def rewrite(m: re.Match) -> str:
            ref = m.group("table")
            name = ref[len(self.prefix):] if ref.startswith(self.prefix) else ref
            if m.group("version") is not None:
                version = int(m.group("version"))
                df = publish.read_table_at(self.spark, self.root, name, version)
                view = f"{self.prefix}{name}__v{version}"
            else:
                df = publish.read_table_asof(
                    self.spark, self.root, name, m.group("ts")
                )
                view = f"{self.prefix}{name}__asof_{abs(hash(m.group('ts')))}"
            df.createOrReplaceTempView(view)
            return view

        return self.spark.sql(_ASOF_RE.sub(rewrite, statement))

    def _history(self, target: str | None) -> DataFrame:
        """DESCRIBE HISTORY [<table>]: one row per committed store version
        (newest first) — version, txid, commit time, and whether the
        table existed there (when a table is named, versions it is absent
        from are filtered out)."""
        manifest = publish.current_manifest(self.root)
        snaps = publish._all_history(self.root, manifest) + [manifest]
        rows = []
        for h in snaps:
            if target is not None and target not in h.get("tables", {}):
                continue
            rows.append((
                int(h["version"]), h.get("txid"),
                float(h["committed_at_unix"])
                if h.get("committed_at_unix") is not None else None,
            ))
        rows.sort(key=lambda r: -r[0])
        return self.spark.createDataFrame(
            rows, "version long, txid string, committed_at_unix double"
        )

    def _merge(self, m: re.Match) -> dict:
        target = m.group("target")
        staging = self._frame(m.group("source"), m.group("subquery"))
        keys = self._keys_from_on(
            m.group("on"), target, m.group("talias"),
            m.group("source"), m.group("salias"),
        )
        clauses = [
            ("not" if w.group("not") else "matched",
             re.sub(r"\s+", " ", w.group("action").upper()))
            for w in _WHEN_RE.finditer(m.group("clauses") or "")
        ]
        if not clauses:
            raise ValueError("MERGE needs at least one WHEN clause")
        update = ("matched", "UPDATE SET *") in clauses
        insert = ("not", "INSERT *") in clauses
        delete = ("matched", "DELETE") in clauses
        if delete and (update or insert):
            raise ValueError(
                "WHEN MATCHED THEN DELETE cannot combine with "
                "UPDATE/INSERT clauses (key-based merge modes)"
            )
        if self._tx_merges is not None:
            # inside a transaction() block: stage the spec, commit on exit
            if target in self._tx_merges:
                raise ValueError(
                    f"transaction block already merges into {target!r} — "
                    "one MERGE per table per block"
                )
            if delete:
                self._tx_merges[target] = {
                    "staging": staging.select(*keys).limit(0),
                    "deletes": staging.select(*keys),
                    "keys": keys,
                }
            else:
                self._tx_merges[target] = {
                    "staging": staging, "keys": keys,
                    "insert_new": insert, "update_existing": update,
                }
            return {"deferred": target}
        if delete:
            # U4 delete-incoming: source keys mark rows to remove
            if self.mor:
                return publish.merge_into_mor(
                    self.spark, self.root, target,
                    staging.select(*keys).limit(0),
                    keys=keys, deletes=staging.select(*keys),
                )
            from dataintegration_ecomprovider_spark.operators import merge

            dest = publish.read_table(self.spark, self.root, target)
            new_state = merge.delete_incoming(dest, staging, keys)
            return publish.publish_tables(
                self.spark, {target: new_state}, self.root,
                table_keys={target: keys},
            )
        fn = publish.merge_into_mor if self.mor else publish.merge_into
        return fn(
            self.spark, self.root, target, staging, keys=keys,
            insert_new=insert, update_existing=update,
        )

    def _delete(self, target: str, where: str) -> dict:
        publish.register_store(self.spark, self.root, prefix=self.prefix)
        keep = self.spark.sql(
            f"SELECT * FROM {self.prefix}{target} WHERE NOT ({where}) "
            f"OR ({where}) IS NULL"
        )
        return publish.publish_tables(self.spark, {target: keep}, self.root)

    def _insert(self, target: str, select: str) -> dict:
        publish.register_store(self.spark, self.root, prefix=self.prefix)
        rows = self.spark.sql(select.strip().strip("()"))
        keys = publish.table_keys(self.root, target)
        if not keys:
            raise ValueError(
                f"INSERT INTO {target!r} needs recorded keys "
                "(publish with table_keys=)"
            )
        fn = publish.merge_into_mor if self.mor else publish.merge_into
        return fn(
            self.spark, self.root, target, rows, keys=list(keys),
            insert_new=True, update_existing=False,
        )


def store_sql(spark: SparkSession, root: str, mor: bool = False,
              prefix: str = "store_") -> StoreSQL:
    """The store's SQL DML session — see module docstring."""
    return StoreSQL(spark, root, mor=mor, prefix=prefix)
