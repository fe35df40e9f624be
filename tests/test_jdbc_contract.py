"""JDBC source-generation contract (SURVEY §2.1 S8/P1/P2/P3/P4 on the JDBC
path).

No database exists in this sandbox, so these tests pin the GENERATED
artifacts — the pushed-down dbtable subquery and the partitioned-read
options — against the reference's SELECT shape
(`select * from (select <cols> from <tables>) as result where
<conditionals> [AND <language scope>] [AND <shop scope>]`,
/root/reference/src/EcomSourceReader.cs:151-226).  The strings ARE the
source contract: Spark hands `dbtable` verbatim to the database, so a
regression here silently un-pushes the projection or filter at a real
deployment (the database would stream the full table to the executors).
"""

from __future__ import annotations

import pytest

from dataintegration_ecomprovider_spark.sources.readers import JdbcSource

URL = "jdbc:sqlserver://host;databaseName=shop"


def test_projection_pushdown_lists_only_mapped_columns():
    """GetColumns (src/EcomSourceReader.cs:161) emits only the mapped
    columns — the database must never see `SELECT *` when a projection is
    declared."""
    src = JdbcSource(URL, "EcomProducts", columns=["ProductId", "ProductName"])
    q = src.pushdown_query()
    assert q == "(SELECT ProductId, ProductName FROM EcomProducts) AS pushed"
    assert "*" not in q


def test_no_projection_falls_back_to_star():
    assert (
        JdbcSource(URL, "EcomProducts").pushdown_query()
        == "(SELECT * FROM EcomProducts) AS pushed"
    )


def test_where_composition_conditionals_then_scopes():
    """Mapping conditionals first, then language/shop scope clauses, each
    AND-appended — the reference's exact composition order
    (src/EcomSourceReader.cs:185-217)."""
    src = JdbcSource(
        URL,
        "EcomProducts",
        columns=["ProductId", "ProductLanguageId"],
        predicate="ProductActive = 1 AND ProductStock > 0",
        scope_filters=(
            "ProductLanguageId = 'LANG1'",
            "ProductShopId = 'SHOP1'",
        ),
    )
    assert src.pushdown_query() == (
        "(SELECT ProductId, ProductLanguageId FROM EcomProducts"
        " WHERE ProductActive = 1 AND ProductStock > 0"
        " AND ProductLanguageId = 'LANG1'"
        " AND ProductShopId = 'SHOP1') AS pushed"
    )


def test_scope_filters_without_conditionals_form_the_where():
    """Scope-only case: the reference emits `where <lang> AND <shop>` when
    there are no mapping conditionals (src/EcomSourceReader.cs:207-217)."""
    src = JdbcSource(
        URL, "EcomGroups", scope_filters=("GroupLanguageId = 'LANG1'",)
    )
    assert src.pushdown_query() == (
        "(SELECT * FROM EcomGroups WHERE GroupLanguageId = 'LANG1') AS pushed"
    )


def test_partitioned_read_options_complete_and_stringly_typed():
    """The parallel-read contract: partitionColumn/lowerBound/upperBound/
    numPartitions all present (Spark requires the full set) and rendered
    as strings, plus fetchsize and the pushed dbtable subquery."""
    src = JdbcSource(
        URL,
        "EcomProducts",
        columns=["ProductId", "ProductNumber"],
        predicate="ProductActive = 1",
        partition_column="ProductAutoId",
        lower_bound=1,
        upper_bound=5_000_000,
        num_partitions=64,
        fetch_size=20_000,
    )
    opts = src.reader_options()
    assert opts["url"] == URL
    assert opts["dbtable"] == (
        "(SELECT ProductId, ProductNumber FROM EcomProducts"
        " WHERE ProductActive = 1) AS pushed"
    )
    assert opts["partitionColumn"] == "ProductAutoId"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "5000000"
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "20000"
    assert all(isinstance(v, str) for v in opts.values())


def test_partitioned_read_requires_bounds():
    src = JdbcSource(URL, "EcomProducts", partition_column="ProductAutoId")
    with pytest.raises(ValueError, match="lower_bound/upper_bound"):
        src.reader_options()


def test_unpartitioned_read_omits_partition_options():
    opts = JdbcSource(URL, "EcomProducts").reader_options()
    assert "partitionColumn" not in opts
    assert "numPartitions" not in opts


def test_extra_properties_pass_through_without_clobbering():
    src = JdbcSource(
        URL, "EcomProducts",
        properties={"user": "etl", "isolationLevel": "READ_COMMITTED"},
    )
    opts = src.reader_options()
    assert opts["user"] == "etl"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["dbtable"].startswith("(SELECT")


# --- JdbcSink: the write-back contract (EcomDestinationWriter parity) ------
from dataintegration_ecomprovider_spark.sources.writers import JdbcSink  # noqa: E402


def _sink(**kw):
    return JdbcSink(URL, "EcomProducts", keys=["ProductID", "ProductLanguageID"], **kw)


def test_sink_writer_options_are_batched_and_partitioned():
    opts = _sink(batch_size=50_000, num_partitions=16).writer_options()
    assert opts["dbtable"] == "EcomProducts_stage_bulk"
    assert opts["batchsize"] == "50000"
    assert opts["numPartitions"] == "16"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert all(isinstance(v, str) for v in opts.values())


def test_sink_tsql_merge_upsert_full():
    sql = _sink().merge_sql(["ProductID", "ProductLanguageID", "ProductName", "ProductPrice"])
    assert sql == (
        "MERGE INTO [EcomProducts] AS d USING [EcomProducts_stage_bulk] AS s "
        "ON d.[ProductID] = s.[ProductID] AND d.[ProductLanguageID] = s.[ProductLanguageID]\n"
        "WHEN MATCHED THEN UPDATE SET d.[ProductName] = s.[ProductName], "
        "d.[ProductPrice] = s.[ProductPrice]\n"
        "WHEN NOT MATCHED THEN INSERT ([ProductID], [ProductLanguageID], "
        "[ProductName], [ProductPrice]) VALUES (s.[ProductID], "
        "s.[ProductLanguageID], s.[ProductName], s.[ProductPrice]);"
    )


def test_sink_merge_modes_match_u3_matrix():
    cols = ["ProductID", "ProductLanguageID", "ProductName"]
    ins_only = _sink().merge_sql(cols, update_existing=False)
    assert "WHEN MATCHED" not in ins_only and "WHEN NOT MATCHED THEN INSERT" in ins_only
    upd_only = _sink().merge_sql(cols, insert_new=False)
    assert "WHEN MATCHED THEN UPDATE" in upd_only and "INSERT" not in upd_only


def test_sink_delete_missing_dialects():
    cols = ["ProductID", "ProductLanguageID", "ProductName"]
    tsql = _sink().merge_sql(cols, delete_missing=True)
    assert tsql.endswith("WHEN NOT MATCHED BY SOURCE THEN DELETE;")
    ansi = _sink(dialect="ansi").merge_sql(cols, delete_missing=True)
    assert "NOT MATCHED BY SOURCE" not in ansi
    assert 'DELETE FROM "EcomProducts" WHERE ("ProductID", "ProductLanguageID") NOT IN' in ansi


def test_sink_validates_dialect_and_keys():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dialect"):
        JdbcSink(URL, "t", keys=["k"], dialect="mysql")
    with _pytest.raises(ValueError, match="key columns"):
        JdbcSink(URL, "t", keys=[])


def test_sink_cleanup_drops_staging():
    assert _sink().cleanup_sql() == "DROP TABLE IF EXISTS [EcomProducts_stage_bulk];"
