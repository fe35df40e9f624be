"""Destination connectors — the database write-back surface.

The engine's primary sink is the versioned parquet store
(plans/publish.py).  JdbcSink covers the remaining reference use case:
writing results back into a relational destination.  The reference's
write path is bulk-copy into a `<table>TempTableForBulkImport` staging
table, then one generated UPDATE-from-staging + INSERT-where-missing
batch (/root/reference/src/EcomDestinationWriter.cs:60, :3027, update
:3280, insert :3304) executed in the job transaction.

The Spark shape is identical, distributed:

1. ``write_staging(df)`` — partitioned, batched `df.write.jdbc` into the
   staging table (N executors stream concurrently where the reference
   bulk-copies on one connection);
2. ``merge_sql()`` — the dialect upsert statement joining staging →
   destination on the keys (T-SQL MERGE for the reference's SQL Server,
   ANSI MERGE otherwise), matching the reference's update+insert
   semantics including the U3 insert-only/update-only modes;
3. the caller executes merge_sql + cleanup_sql on its own connection
   (Spark's JDBC writer cannot run arbitrary statements).

No live database exists in this environment; the generated SQL and
writer options are the contract, pinned by tests/test_jdbc_contract.py —
the same strategy as JdbcSource's read contract.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class JdbcSink:
    url: str
    table: str
    keys: Sequence[str]
    staging_table: str | None = None   # default: <table>_stage_bulk
    dialect: str = "tsql"              # "tsql" (reference parity) or "ansi"
    batch_size: int = 10_000
    num_partitions: int = 8
    isolation_level: str = "READ_COMMITTED"
    properties: Mapping[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if self.dialect not in ("tsql", "ansi"):
            raise ValueError(f"unsupported dialect {self.dialect!r}")
        if not self.keys:
            raise ValueError("JdbcSink requires key columns")

    @property
    def staging(self) -> str:
        # the reference's "<table>TempTableForBulkImport" naming idea
        # (EcomDestinationWriter.cs:60) without the # temp-table scoping,
        # because the Spark writer and the merge run on separate connections
        return self.staging_table or f"{self.table}_stage_bulk"

    def _q(self, ident: str) -> str:
        return f"[{ident}]" if self.dialect == "tsql" else f'"{ident}"'

    def writer_options(self) -> dict[str, str]:
        """Options for df.write.format("jdbc") into the staging table."""
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.staging,
            "batchsize": str(self.batch_size),
            "isolationLevel": self.isolation_level,
            "numPartitions": str(self.num_partitions),
        }
        opts.update(self.properties)
        return opts

    def write_staging(self, df: DataFrame, mode: str = "overwrite") -> None:
        """Distributed bulk load of the staging table: `num_partitions`
        concurrent connections, `batch_size` rows per round trip — the
        SqlBulkCopy role (EcomDestinationWriter.cs:3027), distributed."""
        (
            df.repartition(self.num_partitions)
            .write.format("jdbc")
            .options(**self.writer_options())
            .mode(mode)
            .save()
        )

    def merge_sql(
        self,
        columns: Sequence[str],
        insert_new: bool = True,
        update_existing: bool = True,
        delete_missing: bool = False,
    ) -> str:
        """The staging → destination upsert statement (U1-U3 semantics;
        `delete_missing` adds U5 remove-missing).  T-SQL emits MERGE with
        WHEN NOT MATCHED BY SOURCE for the delete half (SQL Server
        extension); ANSI emits standard MERGE, with remove-missing as a
        separate DELETE statement appended."""
        q = self._q
        cols = list(columns)
        non_keys = [c for c in cols if c not in self.keys]
        on = " AND ".join(f"d.{q(k)} = s.{q(k)}" for k in self.keys)
        parts = [f"MERGE INTO {q(self.table)} AS d USING {q(self.staging)} AS s ON {on}"]
        if update_existing and non_keys:
            sets = ", ".join(f"d.{q(c)} = s.{q(c)}" for c in non_keys)
            parts.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
        if insert_new:
            ins_cols = ", ".join(q(c) for c in cols)
            ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
            parts.append(
                f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
            )
        stmt = "\n".join(parts)
        if delete_missing:
            if self.dialect == "tsql":
                stmt += "\nWHEN NOT MATCHED BY SOURCE THEN DELETE"
            else:
                key_tuple = ", ".join(q(k) for k in self.keys)
                stmt += (
                    f";\nDELETE FROM {q(self.table)} WHERE ({key_tuple}) NOT IN "
                    f"(SELECT {key_tuple} FROM {q(self.staging)})"
                )
        return stmt + ";"

    def cleanup_sql(self) -> str:
        return f"DROP TABLE IF EXISTS {self._q(self.staging)};"
