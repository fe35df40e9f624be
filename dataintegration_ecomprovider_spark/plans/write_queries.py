"""Write-surface queries: the upsert/delete algebra and entity-resolution
operators (SURVEY §2.6-2.7), each materialized as the resulting table state
so the DuckDB oracle can check it.

Staging is simulated deterministically from the fixture tables (orders as
the destination, a filtered+mutated copy as the staged import), mirroring
FIXTURES.md's "orders vs filtered orders" role for the merge family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.operators import merge
from dataintegration_ecomprovider_spark.operators.dedup import first_wins
from dataintegration_ecomprovider_spark.operators.expansion import expand_rows
from dataintegration_ecomprovider_spark.operators.explode import explode_membership
from dataintegration_ecomprovider_spark.operators.resolve import resolve_cascade
from dataintegration_ecomprovider_spark.operators.string_agg import collect_ordered
from dataintegration_ecomprovider_spark.operators.surrogate import assign_surrogate_ids, high_water_mark


def _orders_fmt(df: DataFrame) -> DataFrame:
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    )


def _dest_staging(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """dest = orders with key%3!=0; staging = orders with key%2=0, price
    uplifted and status rewritten — overlapping + disjoint slices so the
    upsert matrix has matched, unmatched-staging, and unmatched-dest rows."""
    orders = Catalog(spark, sf_dir).table("orders")
    dest = orders.filter(F.col("o_orderkey") % 3 != 0)
    # NB: the uplift is an exact-decimal-preserving +1000.0 (not *1.1): a
    # multiply can land the double on a .005 rounding boundary where Spark
    # (shortest-string HALF_UP) and DuckDB (exact-binary) disagree.
    staging = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") + 1000.0, 2))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    return dest, staging

_DEST_STAGING_SQL = """
  dest AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
  staging AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                     ROUND(o_totalprice + 1000.0, 2) AS o_totalprice,
                     o_orderdate, o_orderpriority
              FROM orders WHERE o_orderkey % 2 = 0)
"""

_ORDERS_OUT_SQL = """o_orderkey, o_custkey, o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority"""


# --- U1-U3: the upsert matrix --------------------------------------------
def q_upsert_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U1+U2: UPDATE matched + INSERT unmatched
    (MoveDataToMainTable, src/EcomDestinationWriter.cs:3220-3333)."""
    dest, staging = _dest_staging(spark, sf_dir)
    return _orders_fmt(merge.upsert(dest, staging, ["o_orderkey"]))


ORACLE_UPSERT_FULL = f"""
WITH {_DEST_STAGING_SQL},
updated AS (
  SELECT d.o_orderkey, COALESCE(s.o_custkey, d.o_custkey) AS o_custkey,
         COALESCE(s.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
         COALESCE(s.o_totalprice, d.o_totalprice) AS o_totalprice,
         COALESCE(s.o_orderdate, d.o_orderdate) AS o_orderdate,
         COALESCE(s.o_orderpriority, d.o_orderpriority) AS o_orderpriority
  FROM dest d LEFT JOIN staging s USING (o_orderkey)
),
inserted AS (
  SELECT s.* FROM staging s WHERE NOT EXISTS
    (SELECT 1 FROM dest d WHERE d.o_orderkey = s.o_orderkey)
)
SELECT {_ORDERS_OUT_SQL} FROM (SELECT * FROM updated UNION ALL SELECT * FROM inserted)
"""


def q_upsert_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U3 InsertOnlyNewRecords: skip the UPDATE leg
    (src/EcomProvider.cs:152-162, src/EcomDestinationWriter.cs:3192-3195)."""
    dest, staging = _dest_staging(spark, sf_dir)
    return _orders_fmt(merge.upsert(dest, staging, ["o_orderkey"], update_existing=False))


ORACLE_UPSERT_INSERT_ONLY = f"""
WITH {_DEST_STAGING_SQL},
inserted AS (
  SELECT s.* FROM staging s WHERE NOT EXISTS
    (SELECT 1 FROM dest d WHERE d.o_orderkey = s.o_orderkey)
)
SELECT {_ORDERS_OUT_SQL} FROM (SELECT * FROM dest UNION ALL SELECT * FROM inserted)
"""


def q_upsert_update_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U3 UpdateOnlyExistingRecords: skip the INSERT leg."""
    dest, staging = _dest_staging(spark, sf_dir)
    return _orders_fmt(merge.upsert(dest, staging, ["o_orderkey"], insert_new=False))


ORACLE_UPSERT_UPDATE_ONLY = f"""
WITH {_DEST_STAGING_SQL}
SELECT {_ORDERS_OUT_SQL} FROM (
  SELECT d.o_orderkey, COALESCE(s.o_custkey, d.o_custkey) AS o_custkey,
         COALESCE(s.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
         COALESCE(s.o_totalprice, d.o_totalprice) AS o_totalprice,
         COALESCE(s.o_orderdate, d.o_orderdate) AS o_orderdate,
         COALESCE(s.o_orderpriority, d.o_orderpriority) AS o_orderpriority
  FROM dest d LEFT JOIN staging s USING (o_orderkey))
"""


# --- U4: delete-incoming --------------------------------------------------
def q_delete_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U4 DeleteIncomingItems (DeleteExistingFromMainTable,
    src/EcomDestinationWriter.cs:3116-3132): dest minus staged keys."""
    dest, staging = _dest_staging(spark, sf_dir)
    return _orders_fmt(merge.delete_incoming(dest, staging, ["o_orderkey"]))


ORACLE_DELETE_INCOMING = f"""
WITH {_DEST_STAGING_SQL}
SELECT {_ORDERS_OUT_SQL} FROM dest d
WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = d.o_orderkey)
"""


# --- U5: remove-missing ---------------------------------------------------
def q_remove_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U5 delete-missing (DeleteExcessFromMainTable,
    src/EcomDestinationWriter.cs:3067-3114): keep only dest rows present in
    staging."""
    dest, staging = _dest_staging(spark, sf_dir)
    return _orders_fmt(merge.remove_missing(dest, staging, ["o_orderkey"]))


ORACLE_REMOVE_MISSING = f"""
WITH {_DEST_STAGING_SQL}
SELECT {_ORDERS_OUT_SQL} FROM dest d
WHERE EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = d.o_orderkey)
"""


# --- U7: deactivate-missing (soft delete) --------------------------------
def q_deactivate_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U7 DeactivateMissingProducts (+Hide):
    flip flags instead of deleting, scope-limited
    (src/EcomProvider.cs:164-168, src/EcomDestinationWriter.cs:3093-3101).
    Scope: only open ('O') orders are deactivated."""
    dest, staging = _dest_staging(spark, sf_dir)
    out = merge.deactivate_missing(
        dest,
        staging,
        ["o_orderkey"],
        flags={"o_orderstatus": F.lit("X")},
        scope=F.col("o_orderstatus") == "O",
    )
    return _orders_fmt(out)


ORACLE_DEACTIVATE_MISSING = f"""
WITH {_DEST_STAGING_SQL}
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderstatus = 'O' AND NOT EXISTS
              (SELECT 1 FROM staging s WHERE s.o_orderkey = d.o_orderkey)
            THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM dest d
"""


# --- U8: scoped delete-missing -------------------------------------------
def q_scoped_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U8 language-scoped delete (GetDeleteFromSpecificLanguage-
    ExtraCondition, src/EcomDestinationWriter.cs:3134-3163): only rows in
    the staged scope ('click'/'view' events) are subject to delete-missing."""
    events = Catalog(spark, sf_dir).table("events")
    staging = events.filter(F.col("value") > 50)
    scope = F.col("event_type").isin("click", "view")
    out = merge.remove_missing(events, staging, ["event_id"], scope=scope)
    return out.select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("event_value")
    )


ORACLE_SCOPED_DELETE = """
WITH staging AS (SELECT event_id FROM events WHERE value > 50)
SELECT event_id, user_id, event_type, ROUND(value, 2) AS event_value
FROM events e
WHERE (event_type NOT IN ('click', 'view'))
   OR EXISTS (SELECT 1 FROM staging s WHERE s.event_id = e.event_id)
"""


# --- U9: relation-table swap ---------------------------------------------
def q_relation_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U9 (RemoveExcessFromRelationsTables,
    src/EcomDestinationWriter.cs:4218-4277): delete dest relations matching
    staged parent keys, then insert staged rows wholesale.  Relation =
    (order, part, qty); staged = relations of even orders with qty doubled."""
    li = Catalog(spark, sf_dir).table("lineitem")
    rel = li.groupBy("l_orderkey", "l_partkey").agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    staged = (
        rel.filter(F.col("l_orderkey") % 2 == 0)
        .withColumn("qty", F.round(F.col("qty") * 2, 2))
    )
    out = merge.relation_swap(rel, staged, ["l_orderkey"])
    return out.select("l_orderkey", "l_partkey", F.col("qty").alias("qty"))


ORACLE_RELATION_SWAP = """
WITH rel AS (
  SELECT l_orderkey, l_partkey, ROUND(SUM(l_quantity), 2) AS qty
  FROM lineitem GROUP BY l_orderkey, l_partkey
),
staged AS (SELECT l_orderkey, l_partkey, ROUND(qty * 2, 2) AS qty
           FROM rel WHERE l_orderkey % 2 = 0)
SELECT l_orderkey, l_partkey, qty FROM rel WHERE l_orderkey % 2 <> 0
UNION ALL
SELECT l_orderkey, l_partkey, qty FROM staged
"""


# --- U11: referential-integrity cleanup ----------------------------------
def q_integrity_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U11/J14 (CleanRelationsTables,
    src/EcomDestinationWriter.cs:4191-4211): keep only relation rows whose
    parents survive — lineitem vs open orders and small parts, aggregated
    per returnflag to keep the result compact."""
    cat = Catalog(spark, sf_dir)
    li, orders, part = cat.table("lineitem"), cat.table("orders"), cat.table("part")
    cleaned = merge.integrity_cleanup(
        li,
        [
            (orders.filter(F.col("o_orderstatus") == "O"), ["l_orderkey"], ["o_orderkey"]),
            (part.filter(F.col("p_size") < 30), ["l_partkey"], ["p_partkey"]),
        ],
    )
    return cleaned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("surviving_rows"),
        F.round(F.sum("l_quantity"), 2).alias("surviving_qty"),
    )


ORACLE_INTEGRITY_CLEANUP = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS surviving_rows,
       ROUND(SUM(l_quantity), 2) AS surviving_qty
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'O')
  AND EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size < 30)
GROUP BY l_returnflag
"""


# --- E1/A3: surrogate-ID assignment --------------------------------------
def q_surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E1: allocate Imported<KIND><n> ids continuing from the
    high-water mark (src/EcomDestinationWriter.cs:1590, :488-667).  Parts
    with key%7==0 play "arrived without an id"; existing ImportedPROD ids
    are simulated from key%13==0 parts."""
    part = Catalog(spark, sf_dir).table("part")
    existing = part.filter(F.col("p_partkey") % 13 == 0).select(
        F.concat(F.lit("ImportedPROD"), F.col("p_partkey").cast("string")).alias("product_id")
    )
    hw = high_water_mark(existing, "product_id", "ImportedPROD")
    staged = part.select(
        F.when(F.col("p_partkey") % 7 == 0, F.lit("")).otherwise(
            F.concat(F.lit("PART"), F.col("p_partkey").cast("string"))
        ).alias("product_id"),
        "p_partkey",
        "p_name",
    )
    out = assign_surrogate_ids(
        staged, "product_id", "ImportedPROD",
        order_by=[F.col("p_name"), F.col("p_partkey")], offset=hw,
    )
    return out.select("p_partkey", "product_id")


ORACLE_SURROGATE_IDS = """
WITH hw AS (SELECT COALESCE(MAX(p_partkey), 0) AS v FROM part WHERE p_partkey % 13 = 0),
missing AS (
  SELECT p_partkey,
         ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rn
  FROM part WHERE p_partkey % 7 = 0
)
SELECT p.p_partkey,
       CASE WHEN p.p_partkey % 7 = 0
            THEN 'ImportedPROD' || CAST((SELECT v FROM hw) + m.rn AS VARCHAR)
            ELSE 'PART' || CAST(p.p_partkey AS VARCHAR) END AS product_id
FROM part p LEFT JOIN missing m ON p.p_partkey = m.p_partkey
"""


# --- E2: fallback-cascade matching ---------------------------------------
def q_fallback_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E2: ProductID → ProductNumber → ProductName fallback
    matching (GetExistingProduct, src/EcomDestinationWriter.cs:3984-4026) as
    a coalesce of priority-ordered left joins: supplier resolution where the
    strict stage only covers high-balance suppliers."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    supplier = cat.table("supplier")
    strict = supplier.filter(F.col("s_acctbal") >= 5000).select(
        "s_suppkey", F.concat(F.lit("STRICT:"), F.col("s_name")).alias("resolved")
    )
    loose = supplier.select("s_suppkey", F.concat(F.lit("FALLBACK:"), F.col("s_name")).alias("resolved"))
    out = resolve_cascade(
        li.select("l_orderkey", "l_linenumber", "l_suppkey"),
        [
            ("l_suppkey", strict, "s_suppkey", "resolved"),
            ("l_suppkey", loose, "s_suppkey", "resolved"),
        ],
        out_col="resolved_supplier",
        case_insensitive=False,
    )
    return out.select("l_orderkey", "l_linenumber", "resolved_supplier")


ORACLE_FALLBACK_CASCADE = """
SELECT l.l_orderkey, l.l_linenumber,
       COALESCE(CASE WHEN s.s_acctbal >= 5000 THEN 'STRICT:' || s.s_name END,
                'FALLBACK:' || s.s_name) AS resolved_supplier
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
"""


# --- E4/E9: resolve-or-create --------------------------------------------
def q_resolve_or_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E4 (GetLanguageID resolve-else-create,
    src/EcomDestinationWriter.cs:2513-2569) / E9 manufacturers: customers
    resolve their nation against a truncated dimension; unresolved nations
    get deterministic ImportedLANG<n> ids (dense-ranked)."""
    cat = Catalog(spark, sf_dir)
    customer, nation = cat.table("customer"), cat.table("nation")
    dim = nation.filter(F.col("n_nationkey") < 15).select("n_nationkey", "n_name")
    joined = customer.join(F.broadcast(dim), customer.c_nationkey == dim.n_nationkey, "left")
    # create ids for the missing slice only (dense rank over the missing keys,
    # mirroring the reference's one-new-id-per-unseen-language allocation)
    missing = joined.filter(F.col("n_name").isNull()).select("c_custkey", "c_nationkey")
    created = missing.withColumn(
        "created_nation",
        F.concat(F.lit("ImportedLANG"), F.dense_rank().over(Window.orderBy("c_nationkey")).cast("string")),
    ).select("c_custkey", "created_nation")
    out = (
        joined.select("c_custkey", "n_name")
        .join(created, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("n_name", "created_nation").alias("resolved_nation"),
        )
    )
    return out


ORACLE_RESOLVE_OR_CREATE = """
WITH dim AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15),
joined AS (
  SELECT c.c_custkey, c.c_nationkey, d.n_name
  FROM customer c LEFT JOIN dim d ON c.c_nationkey = d.n_nationkey
),
created AS (
  SELECT c_custkey,
         'ImportedLANG' || CAST(DENSE_RANK() OVER (ORDER BY c_nationkey) AS VARCHAR) AS created_nation
  FROM joined WHERE n_name IS NULL
)
SELECT j.c_custkey, COALESCE(j.n_name, cr.created_nation) AS resolved_nation
FROM joined j LEFT JOIN created cr ON j.c_custkey = cr.c_custkey
"""


# --- E5/E6: membership explode round-trip --------------------------------
def q_membership_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E5: comma-quoted Groups/GroupSorting parallel lists decoded
    and exploded to relation rows (HandleProductGroups,
    src/EcomDestinationWriter.cs:1413-1464).  Round-trip: encode per-order
    member lists (A1 side), then explode back to rows (E5 side)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    encoded = li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                collect_ordered(
                    F.col("l_partkey").cast("string"),
                    [F.col("l_partkey").cast("string"), F.col("l_linenumber")],
                ),
                lambda v: F.concat(F.lit('"'), v, F.lit('"')),
            ),
        ).alias("groups"),
        F.concat_ws(
            ",",
            collect_ordered(
                F.col("l_linenumber").cast("string"),
                [F.col("l_partkey").cast("string"), F.col("l_linenumber")],
            ),
        ).alias("group_sorting"),
    )
    out = explode_membership(
        encoded, ["l_orderkey"], "groups", "member",
        sorting_col="group_sorting", sorting_name="sorting",
    )
    return out.select("l_orderkey", F.col("pos").cast("int").alias("pos"), "member",
                      F.col("sorting").cast("int").alias("sorting"))


ORACLE_MEMBERSHIP_EXPLODE = """
SELECT l_orderkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                               ORDER BY CAST(l_partkey AS VARCHAR), l_linenumber) - 1 AS INTEGER) AS pos,
       CAST(l_partkey AS VARCHAR) AS member,
       CAST(l_linenumber AS INTEGER) AS sorting
FROM lineitem
"""


# --- E12: variant row expansion ------------------------------------------
def q_variant_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E12: staged rows without a variant id fan out once per
    existing variant (UpdateFieldsInExistingProductsWithVariantIDs,
    src/EcomDestinationWriter.cs:3727-3823): large parts fan out per
    supplying supplier."""
    cat = Catalog(spark, sf_dir)
    part, li = cat.table("part"), cat.table("lineitem")
    staged = part.filter(F.col("p_size") >= 45).select("p_partkey", "p_name")
    variants = li.select(F.col("l_partkey").alias("p_partkey"), "l_suppkey")
    out = expand_rows(staged, variants, ["p_partkey"], ["l_suppkey"])
    return out.select("p_partkey", "p_name", F.col("l_suppkey").alias("variant_supplier"))


ORACLE_VARIANT_EXPANSION = """
SELECT p.p_partkey, p.p_name, v.l_suppkey AS variant_supplier
FROM part p
JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) v ON p.p_partkey = v.l_partkey
WHERE p.p_size >= 45
"""


# --- E13: first-wins dedup ------------------------------------------------
def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E13: duplicate PK rows discard all-but-first
    (src/EcomDestinationWriter.cs:1269-1278), with "first" made retry-stable
    as an explicit priority order: original rows beat the duplicated copy."""
    orders = Catalog(spark, sf_dir).table("orders")
    dup = orders.withColumn("o_totalprice", F.col("o_totalprice") + 1).withColumn(
        "o_orderpriority", F.lit("DUPLICATE")
    )
    unioned = orders.withColumn("src", F.lit(1)).unionByName(dup.withColumn("src", F.lit(2)))
    out = first_wins(unioned, ["o_orderkey"], [F.col("src").asc()])
    return out.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderpriority")


ORACLE_DEDUP_FIRST_WINS = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderpriority FROM orders
"""


# --- E14/§2.9: case-insensitive name→id fixup ----------------------------
def q_name_to_id_fixup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E14 (UpdateGroupRelations rewrites parent group *names* to
    ids, src/EcomDestinationWriter.cs:4495-4559) with the reference's
    OrdinalIgnoreCase semantics (§2.9): rows carry an UPPERCASED nation name;
    resolve back to the key via a lower()-normalized join."""
    cat = Catalog(spark, sf_dir)
    customer, nation = cat.table("customer"), cat.table("nation")
    carrying = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.upper("n_name").alias("nation_ref"))
    out = resolve_cascade(
        carrying,
        [("nation_ref", nation, "n_name", "n_nationkey")],
        out_col="resolved_key",
        case_insensitive=True,
    )
    return out.select("c_custkey", "nation_ref", F.col("resolved_key").cast("int").alias("resolved_key"))


ORACLE_NAME_TO_ID_FIXUP = """
SELECT c.c_custkey, UPPER(n.n_name) AS nation_ref,
       CAST(n2.n_nationkey AS INTEGER) AS resolved_key
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN nation n2 ON lower(UPPER(n.n_name)) = lower(n2.n_name)
"""


from dataintegration_ecomprovider_spark.plans.registry import QueryDef  # noqa: E402

QUERIES = {
    "u1_u2_upsert_full": QueryDef(q_upsert_full, ORACLE_UPSERT_FULL),
    "u3_upsert_insert_only": QueryDef(q_upsert_insert_only, ORACLE_UPSERT_INSERT_ONLY),
    "u3_upsert_update_only": QueryDef(q_upsert_update_only, ORACLE_UPSERT_UPDATE_ONLY),
    "u4_delete_incoming": QueryDef(q_delete_incoming, ORACLE_DELETE_INCOMING),
    "u5_remove_missing": QueryDef(q_remove_missing, ORACLE_REMOVE_MISSING),
    "u7_deactivate_missing": QueryDef(q_deactivate_missing, ORACLE_DEACTIVATE_MISSING),
    "u8_scoped_delete": QueryDef(q_scoped_delete, ORACLE_SCOPED_DELETE),
    "u9_relation_swap": QueryDef(q_relation_swap, ORACLE_RELATION_SWAP),
    "u11_integrity_cleanup": QueryDef(q_integrity_cleanup, ORACLE_INTEGRITY_CLEANUP),
    "e1_a3_surrogate_ids": QueryDef(q_surrogate_ids, ORACLE_SURROGATE_IDS),
    "e2_fallback_cascade": QueryDef(q_fallback_cascade, ORACLE_FALLBACK_CASCADE),
    "e4_e9_resolve_or_create": QueryDef(q_resolve_or_create, ORACLE_RESOLVE_OR_CREATE),
    "e5_membership_explode": QueryDef(q_membership_explode, ORACLE_MEMBERSHIP_EXPLODE),
    "e12_variant_expansion": QueryDef(q_variant_expansion, ORACLE_VARIANT_EXPANSION),
    "e13_dedup_first_wins": QueryDef(q_dedup_first_wins, ORACLE_DEDUP_FIRST_WINS),
    "e14_name_to_id_fixup": QueryDef(q_name_to_id_fixup, ORACLE_NAME_TO_ID_FIXUP),
}
