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
    # dense_rank depends only on the distinct unseen keys — rank those few
    # rows, then broadcast back, instead of dragging every unresolved fact
    # row through a single-partition window
    key_ids = (
        missing.select("c_nationkey")
        .distinct()
        .withColumn(
            "created_nation",
            F.concat(
                F.lit("ImportedLANG"),
                F.row_number().over(Window.orderBy("c_nationkey")).cast("string"),
            ),
        )
    )
    created = missing.join(F.broadcast(key_ids), "c_nationkey").select(
        "c_custkey", "created_nation"
    )
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
    # ONE sorted collect of (member, sorting) structs — the parallel list
    # columns derive from the same array, halving the per-group sort work
    # (the reference's Groups/GroupSorting are parallel by construction)
    pairs = collect_ordered(
        F.struct(
            F.col("l_partkey").cast("string").alias("m"),
            F.col("l_linenumber").cast("string").alias("s"),
        ),
        [F.col("l_partkey").cast("string"), F.col("l_linenumber")],
    )
    encoded = li.groupBy("l_orderkey").agg(pairs.alias("__pairs")).select(
        "l_orderkey",
        F.concat_ws(
            ",", F.transform("__pairs", lambda p: F.concat(F.lit('"'), p["m"], F.lit('"')))
        ).alias("groups"),
        F.concat_ws(",", F.transform("__pairs", lambda p: p["s"])).alias("group_sorting"),
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


# --- U6: remove-missing across unioned stagings ---------------------------
def q_remove_missing_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U6 (RemoveMissingRowsAcrossAllTables, src/EcomProvider.cs:
    1090-1114): several mappings stage into the same destination table; the
    delete-missing runs against the UNION of their staged keys."""
    orders = Catalog(spark, sf_dir).table("orders")
    staging_a = orders.filter(F.col("o_orderkey") % 4 == 0)
    staging_b = orders.filter(F.col("o_orderkey") % 4 == 1)
    combined = staging_a.select("o_orderkey").unionByName(staging_b.select("o_orderkey"))
    return _orders_fmt(merge.remove_missing(orders, combined, ["o_orderkey"]))


ORACLE_REMOVE_MISSING_UNION = f"""
SELECT {_ORDERS_OUT_SQL} FROM orders d
WHERE d.o_orderkey % 4 IN (0, 1)
"""


# --- U10: partial-update relation prune ------------------------------------
def q_relation_prune_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U10 (DeleteExcessFromGroupProductRelation,
    src/EcomDestinationWriter.cs:4279-4323) with PartialUpdate: prune only
    relations of parents touched by the import — relations of untouched
    parents survive regardless.  Parents = orders with key%5==0; staged
    relation pairs = their odd-numbered lines."""
    li = Catalog(spark, sf_dir).table("lineitem")
    rel = li.select("l_orderkey", "l_partkey", "l_linenumber")
    staged = rel.filter((F.col("l_orderkey") % 5 == 0) & (F.col("l_linenumber") % 2 == 1))
    touched_parents = F.col("l_orderkey") % 5 == 0
    out = merge.remove_missing(
        rel, staged, ["l_orderkey", "l_partkey", "l_linenumber"], scope=touched_parents
    )
    return out.select("l_orderkey", "l_partkey", "l_linenumber")


ORACLE_RELATION_PRUNE_PARTIAL = """
SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
WHERE l_orderkey % 5 <> 0 OR l_linenumber % 2 = 1
"""


# --- E3: adopt existing id found by number ---------------------------------
def q_adopt_id_by_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E3 (HandleProductIdFoundByNumber,
    src/EcomDestinationWriter.cs:1292-1307): staged rows arriving without an
    id adopt the (ProductID, VariantID) of the existing product with the
    same ProductNumber.  Staged parts with key%3==0 arrive id-less and carry
    only p_name; the existing dimension resolves name → key."""
    part = Catalog(spark, sf_dir).table("part")
    existing = part.select(F.col("p_name").alias("x_name"), F.col("p_partkey").alias("x_key"))
    staged = part.select(
        "p_name",
        F.when(F.col("p_partkey") % 3 == 0, F.lit(None).cast("bigint"))
         .otherwise(F.col("p_partkey")).alias("incoming_key"),
    )
    resolved = staged.join(existing, staged.p_name == existing.x_name, "left")
    return resolved.select(
        "p_name",
        F.coalesce("incoming_key", "x_key").alias("adopted_key"),
    )


ORACLE_ADOPT_ID_BY_NUMBER = """
SELECT s.p_name,
       COALESCE(CASE WHEN s.p_partkey % 3 = 0 THEN NULL ELSE s.p_partkey END,
                x.p_partkey) AS adopted_key
FROM part s JOIN part x ON s.p_name = x.p_name
"""


# --- E6: composite variant-option explode + validation ---------------------
def q_variant_option_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E6 (HandleProductVariantOptions,
    src/EcomDestinationWriter.cs:1309-1343): dot-composite option keys
    ('VO1.VO2') split on '.', deduped pairwise, validated against the
    options dimension (missing → error row), emitted with a monotonically
    increasing per-parent sorting.  Composite = per-order supplier chain;
    dimension = suppliers with positive balance."""
    cat = Catalog(spark, sf_dir)
    li, supplier = cat.table("lineitem"), cat.table("supplier")
    composite = li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ".",
            collect_ordered(F.col("l_suppkey").cast("string"),
                            [F.col("l_suppkey")], distinct=True),
        ).alias("variant_options")
    )
    exploded = composite.select(
        "l_orderkey",
        F.posexplode(F.split("variant_options", "\\.")).alias("pos", "option_key"),
    )
    # reference dedups the relation pair on a LOWERCASED key, first
    # occurrence wins (ecomVariantOptionsProductRelationKeys,
    # src/EcomDestinationWriter.cs:1320-1322)
    w_pair = Window.partitionBy("l_orderkey", F.lower("option_key")).orderBy("pos")
    exploded = (
        exploded.withColumn("__rn", F.row_number().over(w_pair))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    dim = supplier.filter(F.col("s_acctbal") > 0).select(
        F.col("s_suppkey").cast("string").alias("option_key")
    ).withColumn("__ok", F.lit(True))
    validated = exploded.join(F.broadcast(dim), "option_key", "left")
    return validated.select(
        "l_orderkey",
        F.col("option_key").cast("bigint").alias("option_key"),
        F.col("pos").cast("int").alias("sorting"),
        F.coalesce("__ok", F.lit(False)).alias("option_exists"),
    )


ORACLE_VARIANT_OPTION_EXPLODE = """
WITH opts AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT o.l_orderkey,
       o.l_suppkey AS option_key,
       CAST(ROW_NUMBER() OVER (PARTITION BY o.l_orderkey ORDER BY o.l_suppkey) - 1 AS INTEGER) AS sorting,
       EXISTS (SELECT 1 FROM supplier s
               WHERE s.s_suppkey = o.l_suppkey AND s.s_acctbal > 0) AS option_exists
FROM opts o
"""


# --- E7: related-products cascade + default relation group -----------------
def q_related_resolve_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E7 (UpdateProductRelatedProducts / GetDefaultGroupID,
    src/EcomDestinationWriter.cs:3869-3981, :2588-2634): each related
    reference resolves ID → Number → Name across staged+existing products;
    unresolved ones land in the default 'Imported Relations Group'.  Related
    refs = each order's part list exploded; stage 1 resolves against small
    parts, stage 2 against the rest; misses take the default group id."""
    cat = Catalog(spark, sf_dir)
    li, part = cat.table("lineitem"), cat.table("part")
    refs = li.select("l_orderkey", F.col("l_partkey").cast("string").alias("related_ref"))
    small = part.filter(F.col("p_size") < 10).select(
        F.col("p_partkey").cast("string").alias("k1"),
        F.concat(F.lit("SMALL:"), F.col("p_name")).alias("v1"),
    )
    rest = part.filter(F.col("p_size") >= 10).select(
        F.col("p_partkey").cast("string").alias("k2"),
        F.concat(F.lit("REST:"), F.col("p_name")).alias("v2"),
    )
    out = resolve_cascade(
        refs,
        [("related_ref", small, "k1", "v1"), ("related_ref", rest, "k2", "v2")],
        out_col="resolved",
        case_insensitive=False,
    )
    return out.select(
        "l_orderkey",
        F.col("related_ref").cast("bigint").alias("related_key"),
        F.coalesce("resolved", F.lit("ImportedRELGRP1")).alias("resolved_relation"),
    )


ORACLE_RELATED_RESOLVE_DEFAULT = """
SELECT l.l_orderkey, l.l_partkey AS related_key,
       COALESCE(CASE WHEN p.p_size < 10 THEN 'SMALL:' || p.p_name
                     ELSE 'REST:' || p.p_name END,
                'ImportedRELGRP1') AS resolved_relation
FROM lineitem l LEFT JOIN part p ON CAST(l.l_partkey AS VARCHAR) = CAST(p.p_partkey AS VARCHAR)
"""


# --- E8: sorting inheritance ------------------------------------------------
def q_sorting_inheritance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E8: incoming relation sorting of 0 inherits the existing
    DB sorting (src/EcomDestinationWriter.cs:2498-2501, :2898-2903):
    coalesce(nullif(staged, 0), existing, 0)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    existing = li.groupBy("l_orderkey", "l_partkey").agg(
        F.min("l_linenumber").cast("int").alias("existing_sorting")
    )
    staged = existing.select(
        "l_orderkey", "l_partkey",
        F.when(F.col("l_partkey") % 2 == 0, F.lit(0))
         .otherwise(F.col("existing_sorting") + 100).alias("staged_sorting"),
    )
    joined = staged.join(existing, ["l_orderkey", "l_partkey"], "left")
    return joined.select(
        "l_orderkey", "l_partkey",
        F.coalesce(
            F.nullif(F.col("staged_sorting"), F.lit(0)),
            F.col("existing_sorting"),
            F.lit(0),
        ).alias("sorting"),
    )


ORACLE_SORTING_INHERITANCE = """
WITH existing AS (
  SELECT l_orderkey, l_partkey, CAST(MIN(l_linenumber) AS INTEGER) AS existing_sorting
  FROM lineitem GROUP BY l_orderkey, l_partkey
)
SELECT l_orderkey, l_partkey,
       COALESCE(NULLIF(CASE WHEN l_partkey % 2 = 0 THEN 0
                            ELSE existing_sorting + 100 END, 0),
                existing_sorting, 0) AS sorting
FROM existing
"""


# --- E10: user-reference fan-out -------------------------------------------
def q_user_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E10: an assortment-permission row matching several users
    fans out one row per user, while prices take the first match
    (WriteAssortments :1641-1707 vs WritePrices :1719-1802).  Permission
    refs = distinct market segments; each fans out per matching customer,
    and `first_custkey` carries the take-first semantics alongside."""
    customer = Catalog(spark, sf_dir).table("customer")
    perms = customer.select(F.col("c_mktsegment").alias("segment_ref")).dropDuplicates()
    matches = perms.join(
        customer.select("c_custkey", F.col("c_mktsegment").alias("segment_ref")),
        "segment_ref",
    )
    first = matches.groupBy("segment_ref").agg(F.min("c_custkey").alias("first_custkey"))
    return (
        matches.join(F.broadcast(first), "segment_ref")
        .filter(F.col("c_custkey") % 50 == 0)
        .select("segment_ref", "c_custkey", "first_custkey")
    )


ORACLE_USER_FANOUT = """
WITH first AS (SELECT c_mktsegment, MIN(c_custkey) AS first_custkey
               FROM customer GROUP BY c_mktsegment)
SELECT c.c_mktsegment AS segment_ref, c.c_custkey, f.first_custkey
FROM customer c JOIN first f ON c.c_mktsegment = f.c_mktsegment
WHERE c.c_custkey % 50 = 0
"""


# --- E11: default-value injection -------------------------------------------
def q_default_injection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E11: missing currency/language/unit fall back to defaults
    (default currency :1728-1739, CountryCultureInfo='' :2143-2152,
    UnitTranslationLanguageId :1920-1923 in src/EcomDestinationWriter.cs):
    empty-string scoped fields coalesce to the configured default."""
    orders = Catalog(spark, sf_dir).table("orders")
    raw = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("")).otherwise(F.col("o_orderpriority")).alias("priority_in"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None).cast("string")).otherwise(F.col("o_orderstatus")).alias("status_in"),
    )
    return raw.select(
        "o_orderkey",
        F.when(F.length(F.trim("priority_in")) == 0, F.lit("DEFAULT-PRIORITY"))
         .otherwise(F.col("priority_in")).alias("priority"),
        F.coalesce("status_in", F.lit("DEFAULT-STATUS")).alias("status"),
    )


ORACLE_DEFAULT_INJECTION = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN 'DEFAULT-PRIORITY' ELSE o_orderpriority END AS priority,
       CASE WHEN o_orderkey % 11 = 0 THEN 'DEFAULT-STATUS' ELSE o_orderstatus END AS status
FROM orders
"""


# --- E5: primary-flag demotion ----------------------------------------------
def q_primary_demotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E5 primary demotion (AddGroupReferenceRowToProduct,
    src/EcomDestinationWriter.cs:2916-2973): a staged primary relation
    demotes the existing primary — one window over union(staged, existing).
    Existing relations claim primary when their first line number is 1;
    staged relations (even parts of every 4th order) always claim it."""
    from dataintegration_ecomprovider_spark.operators.primary import demote_previous_primary

    li = Catalog(spark, sf_dir).table("lineitem")
    existing = li.groupBy("l_orderkey", "l_partkey").agg(
        F.min("l_linenumber").cast("int").alias("sorting")
    ).withColumn("is_primary", F.col("sorting") == 1)
    staged = (
        existing.filter((F.col("l_orderkey") % 4 == 0) & (F.col("l_partkey") % 2 == 0))
        .withColumn("sorting", F.lit(0))
        .withColumn("is_primary", F.lit(True))
    )
    out = demote_previous_primary(
        existing, staged, ["l_orderkey"], "is_primary",
        order_by=[F.col("sorting").asc(), F.col("l_partkey").asc()],
    )
    return out.select("l_orderkey", "l_partkey", F.col("sorting").cast("int").alias("sorting"), "is_primary")


ORACLE_PRIMARY_DEMOTION = """
WITH existing AS (
  SELECT l_orderkey, l_partkey, CAST(MIN(l_linenumber) AS INTEGER) AS sorting,
         CAST(MIN(l_linenumber) = 1 AS BOOLEAN) AS is_primary, 1 AS tier
  FROM lineitem GROUP BY l_orderkey, l_partkey
),
staged AS (
  SELECT l_orderkey, l_partkey, 0 AS sorting, TRUE AS is_primary, 0 AS tier
  FROM existing WHERE l_orderkey % 4 = 0 AND l_partkey % 2 = 0
),
unioned AS (SELECT * FROM staged UNION ALL SELECT * FROM existing),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
            ORDER BY CASE WHEN is_primary THEN 0 ELSE 1 END, tier, sorting, l_partkey) AS rn
  FROM unioned
)
SELECT l_orderkey, l_partkey, CAST(sorting AS INTEGER) AS sorting,
       (is_primary AND rn = 1) AS is_primary
FROM ranked
"""


# --- E18: assortment rebuild ------------------------------------------------
def q_assortment_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference E18 (RebuildAssortments, src/AssortmentHandler.cs:116-161):
    membership recomputed as a distinct union of relation-derived sets, then
    the activation flip.  Assortments = regions; source 1 = parts shipped to
    the region's customers (the group/shop chain); source 2 = direct
    product relations (every 7th part pinned to its key%5 region).  Output:
    per-region member count + how many parts end active overall."""
    from dataintegration_ecomprovider_spark.operators.assortment import (
        activate_for_membership, rebuild_membership,
    )

    cat = Catalog(spark, sf_dir)
    part, li, orders = cat.table("part"), cat.table("lineitem"), cat.table("orders")
    customer, nation = cat.table("customer"), cat.table("nation")

    chain = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == orders.o_orderkey)
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == nation.n_nationkey)
        .select(F.col("n_regionkey").alias("assortment_id"),
                F.col("l_partkey").alias("product_id"))
    )
    direct = part.filter(F.col("p_partkey") % 7 == 0).select(
        (F.col("p_partkey") % 5).alias("assortment_id"),
        F.col("p_partkey").alias("product_id"),
    )
    membership = rebuild_membership([chain, direct])
    flagged = activate_for_membership(
        part.select(F.col("p_partkey").alias("product_id")), membership
    )
    per_assortment = membership.groupBy("assortment_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("member_count")
    )
    actives = flagged.agg(
        F.sum(F.when(F.col("product_active"), 1).otherwise(0)).cast("bigint").alias("n")
    )
    return per_assortment.crossJoin(actives.select(F.col("n").alias("active_products")))


ORACLE_ASSORTMENT_REBUILD = """
WITH chain AS (
  SELECT n.n_regionkey AS assortment_id, l.l_partkey AS product_id
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
direct AS (
  SELECT p_partkey % 5 AS assortment_id, p_partkey AS product_id
  FROM part WHERE p_partkey % 7 = 0
),
membership AS (
  SELECT DISTINCT assortment_id, product_id
  FROM (SELECT * FROM chain UNION ALL SELECT * FROM direct)
),
actives AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS active_products
  FROM part WHERE EXISTS (SELECT 1 FROM membership m WHERE m.product_id = part.p_partkey)
)
SELECT m.assortment_id, CAST(COUNT(*) AS BIGINT) AS member_count,
       (SELECT active_products FROM actives) AS active_products
FROM membership m GROUP BY m.assortment_id
"""


# --- E15/E16/U1-U3 composed: the RunJob pipeline ---------------------------

# Staging prefix for the bucketed pipeline query: stable WITHIN a process
# (serial re-runs reuse/overwrite their own staging tables, and the
# plan-shape assertions see deterministic table names) but UNIQUE ACROSS
# processes — two engine sessions sharing one spark-warehouse/ must not
# write the same `saveAsTable` staging paths concurrently (a fixed prefix
# made concurrent bench + pytest runs clobber each other's _temporary
# dirs with TASK_WRITE_FAILED).  drop_staging_tables("stage_q_u12") still
# matches: the per-process suffix extends the shared prefix.
import uuid as _uuid

U12_STAGING_PREFIX = f"stage_q_u12_{_uuid.uuid4().hex[:8]}"


def _pipeline_job(spark: SparkSession, sf_dir: str, bucketed: bool) -> DataFrame:
    from dataintegration_ecomprovider_spark.plans.pipeline import (
        ColumnRule, MappingSpec, run_job,
    )

    cat = Catalog(spark, sf_dir)
    dest0 = cat.table("orders").filter(F.col("o_orderkey") % 3 != 0)

    def mapping(cond: F.Column, status: str) -> MappingSpec:
        return MappingSpec(
            source_table="orders",
            dest_table="orders",
            columns=(
                ColumnRule("o_orderkey", "o_orderkey"),   # E16 forces is_key
                ColumnRule("o_custkey", "o_custkey"),
                ColumnRule("o_orderstatus", script="constant", script_value=status),
                ColumnRule("o_totalprice", "o_totalprice"),
                ColumnRule("o_orderdate", "o_orderdate"),
                ColumnRule("o_orderpriority", "o_orderpriority"),
            ),
            conditional=cond,
        )

    state = run_job(
        cat,
        {"orders": dest0},
        [
            mapping(F.col("o_orderkey") % 2 == 0, "U"),
            mapping(F.col("o_orderkey") % 5 == 0, "V"),
        ],
        dest_keys={"orders": ["o_orderkey"]},
        bucketed_staging=bucketed,
        staging_prefix=U12_STAGING_PREFIX,
    )
    return _orders_fmt(state["orders"])


def q_pipeline_run_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference §3.1 RunJob end-to-end: two mappings staging into the same
    destination table, normalized (E15 order + E16 key completion), shaped
    (P2 conditional + P7 constant script), then merged sequentially against
    the evolving state (per-mapping MoveDataToMainTable loop,
    src/EcomDestinationWriter.cs:3165-3218).  Atomic publish (U12) is
    exercised in tests/test_pipeline.py — here the final state is returned
    directly for the oracle."""
    return _pipeline_job(spark, sf_dir, bucketed=False)


def q_pipeline_run_job_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same RunJob pipeline through BUCKETED staging (S5/S6 scale
    path): staged rows and the evolving destination are written as tables
    bucketed on the merge key — the analog of the reference's temp tables
    keyed like their destination (CreateTempTables,
    src/EcomDestinationWriter.cs:234-417) — so every upsert join and key
    dedup runs with zero Exchange (plan-asserted in
    tests/test_plan_shapes.py).  Same oracle as the default path: the
    storage layout must not change a single row."""
    return _pipeline_job(spark, sf_dir, bucketed=True)


ORACLE_PIPELINE_RUN_JOB = f"""
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % 5 = 0 THEN 'V'
            WHEN o_orderkey % 2 = 0 THEN 'U'
            ELSE o_orderstatus END AS o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM orders
WHERE o_orderkey % 3 <> 0 OR o_orderkey % 2 = 0 OR o_orderkey % 5 = 0
"""


# --- U12 + CDC: version-diff read over the versioned store ----------------
def q_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC over the U12 versioned store: publish two versions of an orders
    table into a throwaway store root, then read_changes(v1 → v2) tags the
    key-wise delta insert/update/delete.  This is the incremental feed the
    reference approximates by re-running jobs idempotently (IsFirstJobRun,
    src/EcomProvider.cs:25, :937-966) — the versioned store answers it
    exactly with one full-outer key diff (plans/publish.read_changes).

    v1 = orders with o_orderkey % 3 != 0; v2 = orders with % 4 != 0 and the
    status flipped to 'X' on % 5 == 0 rows — so the diff exercises all
    three change kinds deterministically."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("cdc_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v1}, root)
    publish.publish_tables(spark, {"orders": v2}, root)
    return publish.read_changes(
        spark, root, "orders", from_version=1, to_version=2, keys=["o_orderkey"]
    )


def q_cdc_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-scoped CDC (round 5, read_changes(where=...)): the same
    two-version orders store as u12_version_diff, diffed AS THE FILTERED
    VIEW o_orderstatus = 'O' — both snapshot reads go through file-level
    skipping (scan_table_at), and rows updated into/out of the predicate
    set arrive as inserts/deletes.  At 100 TB this is CDC for one shop /
    one key range without reconstructing the whole table twice."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("cdc_filtered_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v1}, root)
    publish.publish_tables(spark, {"orders": v2}, root)
    return publish.read_changes(
        spark, root, "orders", from_version=1, to_version=2,
        keys=["o_orderkey"], where=[("o_orderstatus", "=", "O")],
    )


def q_cdc_filtered_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean predicate TREES over the store (round 6): CDC of the view
    (o_custkey in [100, 140) OR o_custkey in [1000, 1040)) AND NOT
    (o_orderstatus = 'X') —
    the reference's multi-shop scoping emits exactly such OR-of-equality
    slices (src/EcomSourceReader.cs:175-183), which AND-only triples
    could not express.  Both versions are range-layed-out on o_custkey,
    and the query ASSERTS file skipping engages per disjunct (files
    outside both custkey windows are pruned by min/max before Spark
    lists them); v2 flips %5 keys to status X, so those rows leave the
    NOT slice and arrive as deletes."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("cdc_or_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    for v in (v1, v2):
        publish.publish_tables(
            spark, {"orders": v.repartitionByRange(8, "o_custkey")}, root
        )
    where = [
        ("or",
         ("and", ("o_custkey", ">=", 100), ("o_custkey", "<", 140)),
         ("and", ("o_custkey", ">=", 1000), ("o_custkey", "<", 1040))),
        ("not", ("o_orderstatus", "=", "X")),
    ]
    kept, total = publish.prune_files(root, "orders", where)
    if not (0 < len(kept) < total):  # skipping must engage per disjunct
        raise AssertionError(f"expected file skipping, kept {len(kept)}/{total}")
    return publish.read_changes(
        spark, root, "orders", from_version=1, to_version=2,
        keys=["o_orderkey"], where=where,
    )


ORACLE_CDC_FILTERED_OR = """
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders
  WHERE o_orderkey % 3 <> 0
    AND ((o_custkey >= 100 AND o_custkey < 140)
         OR (o_custkey >= 1000 AND o_custkey < 1040))
    AND NOT (o_orderstatus = 'X')
),
v2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
),
v2f AS (
  SELECT * FROM v2
  WHERE ((o_custkey >= 100 AND o_custkey < 140)
         OR (o_custkey >= 1000 AND o_custkey < 1040))
    AND NOT (o_orderstatus = 'X')
)
SELECT
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_orderkey ELSE v2f.o_orderkey END AS o_orderkey,
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_custkey ELSE v2f.o_custkey END AS o_custkey,
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_orderstatus ELSE v2f.o_orderstatus END AS o_orderstatus,
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_totalprice ELSE v2f.o_totalprice END AS o_totalprice,
  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
       WHEN v2f.o_orderkey IS NULL THEN 'delete'
       ELSE 'update' END AS change_type
FROM v1 FULL OUTER JOIN v2f ON v1.o_orderkey = v2f.o_orderkey
WHERE v1.o_orderkey IS NULL OR v2f.o_orderkey IS NULL
   OR v1.o_custkey IS DISTINCT FROM v2f.o_custkey
   OR v1.o_orderstatus IS DISTINCT FROM v2f.o_orderstatus
   OR v1.o_totalprice IS DISTINCT FROM v2f.o_totalprice
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The downstream half of the CDC loop: replay read_changes(v1 → v2)
    onto a replica of v1 (publish.apply_changes: upsert the insert/update
    rows, anti-join the deletes) — the result must be row-identical to v2,
    so the oracle IS v2's definition.  Proves an incremental consumer can
    follow the store without full re-reads (the reference's consumers
    re-run the whole job instead, src/EcomProvider.cs:937-966)."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("cdc_apply")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v1}, root)
    publish.publish_tables(spark, {"orders": v2}, root)
    replica = publish.read_table_at(spark, root, "orders", 1)
    delta = publish.read_changes(
        spark, root, "orders", from_version=1, to_version=2, keys=["o_orderkey"]
    )
    return publish.apply_changes(replica, delta, ["o_orderkey"])


def q_data_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data skipping over the versioned store (round 4): orders
    is published range-layed-out on o_custkey into 8 files with per-file
    min/max stats (publish.write_stats_sidecar, collected from the parquet
    footers at publish time); scan_table hands Spark ONLY the files whose
    [min, max] can satisfy the predicate — at 100 TB the difference between
    opening a million files and the few that matter (Delta/Iceberg's data
    skipping; the reference pushes WHERE clauses to SQL Server instead,
    src/EcomSourceReader.cs:151-226, which is the same
    prune-before-you-read idea).  Results are exact: the predicate is also
    applied as a residual Spark filter, so the oracle is a plain WHERE."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("skip_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    publish.publish_tables(
        spark, {"orders": base.repartitionByRange(8, "o_custkey")}, root
    )
    kept, total = publish.prune_files(
        root, "orders", [("o_custkey", ">", 50), ("o_custkey", "<=", 200)]
    )
    if not (0 < len(kept) < total):  # the point of the operator IS the skip
        raise AssertionError(f"expected file skipping, kept {len(kept)}/{total}")
    return publish.scan_table(
        spark, root, "orders", [("o_custkey", ">", 50), ("o_custkey", "<=", 200)]
    )


ORACLE_DATA_SKIPPING_SCAN = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_custkey > 50 AND o_custkey <= 200
"""


def q_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column RENAME/DROP over the versioned store
    (round 7, publish.rename_column / drop_column — the Delta
    column-mapping role): at 100 TB a rename must not cost an O(table)
    rewrite, so both commit a logical column map on the manifest entry
    while the physical files stay byte-identical (asserted in-query).
    Lifecycle: publish orders range-layed-out, rename o_totalprice →
    price and drop o_orderpriority (two O(1) metadata commits), merge-on-read
    a price bump staged in the NEW name, then scan with a predicate
    while file skipping still engages (asserted).  The result must equal
    the plain-SQL oracle over the final logical schema — a stale
    physical name or a resurrected dropped column breaks the match."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("cmap_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus", "o_orderpriority",
    )
    publish.publish_tables(
        spark, {"orders": base.repartitionByRange(8, "o_custkey")}, root,
        table_keys={"orders": ["o_orderkey"]},
    )
    files = sorted(
        publish._data_files(
            publish.current_manifest(root)["tables"]["orders"]["path"]
        )
    )
    publish.rename_column(spark, root, "orders", "o_totalprice", "price")
    publish.drop_column(spark, root, "orders", "o_orderpriority")
    after = sorted(
        publish._data_files(
            publish.current_manifest(root)["tables"]["orders"]["path"]
        )
    )
    if after != files:  # the point of the operator IS zero data movement
        raise AssertionError("rename/drop must not move data files")
    cur = publish.read_table(spark, root, "orders")
    publish.merge_into_mor(
        spark, root, "orders",
        cur.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("price", F.round(F.col("price") + 1.0, 2)),
    )
    kept, total = publish.prune_files(root, "orders", [("o_custkey", "<=", 100)])
    if not (0 < len(kept) < total):  # skipping must survive the rename
        raise AssertionError(f"expected file skipping, kept {len(kept)}/{total}")
    return publish.scan_table(
        spark, root, "orders", [("o_custkey", "<=", 100)]
    )


ORACLE_COLUMN_MAPPING = """
SELECT o_orderkey, o_custkey,
       ROUND(ROUND(o_totalprice, 2)
             + CASE WHEN o_orderkey % 10 = 0 THEN 1.0 ELSE 0.0 END,
             2) AS price,
       o_orderstatus
FROM orders WHERE o_custkey <= 100
"""


def q_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec EVOLUTION over the versioned store (round 8,
    publish.set_partition_spec — the Iceberg spec-evolution role): at
    100 TB "repartition by a different column" must not cost an O(table)
    rewrite up front.  Lifecycle: publish orders hive-partitioned by
    o_year → declare o_orderstatus as the new spec (O(1) metadata —
    asserted zero file movement) → merge-on-read a price bump against
    the OLD-era base (which still prunes under the spec its files were
    written under — asserted) → compact, the lazy migration point, after
    which the fresh files lie under o_orderstatus= directories and prune
    on the NEW spec (asserted) while time travel keeps serving the old
    era under o_year.  Returns a pruned scan on the new partition
    column; the oracle replays price bump + filter in plain SQL."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("pevo_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
        F.year("o_orderdate").alias("o_year"),
    )
    publish.publish_tables(
        spark, {"orders": base}, root,
        partition_by={"orders": ["o_year"]},
        table_keys={"orders": ["o_orderkey"]},
    )
    entry = publish.current_manifest(root)["tables"]["orders"]
    files = sorted(publish._data_files(entry["path"]))
    publish.set_partition_spec(spark, root, "orders", ["o_orderstatus"])
    entry = publish.current_manifest(root)["tables"]["orders"]
    if sorted(publish._data_files(entry["path"])) != files:
        raise AssertionError("spec declaration must not move data files")
    cur = publish.read_table(spark, root, "orders")
    publish.merge_into_mor(
        spark, root, "orders",
        cur.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("price", F.round(F.col("price") + 1.0, 2)),
    )
    # old era still prunes under the spec it was written under
    kept, total = publish.prune_files(root, "orders", [("o_year", "=", 1995)])
    if not (0 < len(kept) < total):
        raise AssertionError(f"old-spec pruning lost: kept {len(kept)}/{total}")
    publish.compact(spark, root, "orders")
    entry = publish.current_manifest(root)["tables"]["orders"]
    if entry.get("partition_by") != ["o_orderstatus"] or "partition_spec" in entry:
        raise AssertionError(f"migration did not fold the spec: {entry.keys()}")
    kept, total = publish.prune_files(
        root, "orders", [("o_orderstatus", "=", "O")]
    )
    if not (0 < len(kept) < total):
        raise AssertionError(f"new-spec pruning lost: kept {len(kept)}/{total}")
    return publish.scan_table(
        spark, root, "orders", [("o_orderstatus", "=", "O")]
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "price", "o_year")


ORACLE_PARTITION_EVOLUTION = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       ROUND(ROUND(o_totalprice, 2)
             + CASE WHEN o_orderkey % 10 = 0 THEN 1.0 ELSE 0.0 END,
             2) AS price,
       CAST(year(o_orderdate) AS INTEGER) AS o_year
FROM orders WHERE o_orderstatus = 'O'
"""


def q_constraints_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted constraints with QUARANTINE routing (round 7,
    publish.set_constraints — Delta CHECK constraints + the reference's
    S7 row-skipping sink at store level): not_null(price) and
    values_in(o_orderstatus) are declared ONCE on the manifest entry
    with on_violation='quarantine'; a merge batch carrying injected
    nulls (o_orderkey ≡ 0 mod 10) and bad statuses (≡ 0 mod 6) then
    lands WITHOUT caller-side validation wiring — clean rows upsert,
    violating rows divert to orders__quarantine tagged with the failed
    specs.  Returns main ∪ quarantine; the oracle replays the split and
    the upsert in SQL — a diverted row leaking into main (or vice
    versa), a wrong violation label, or a missed upsert breaks the
    hash."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("cq_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base.filter(F.col("o_orderkey") % 4 != 0)}, root,
        table_keys={"orders": ["o_orderkey"]},
    )
    publish.set_constraints(
        root, "orders",
        [["not_null", "price"], ["values_in", "o_orderstatus", ["O", "F", "P"]]],
        on_violation="quarantine",
    )
    staged = (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 6 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus")),
        )
        .withColumn(
            "price",
            F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
            .otherwise(F.round(F.col("price") + 1.0, 2)),
        )
    )
    publish.merge_into_mor(spark, root, "orders", staged)
    main = publish.read_table(spark, root, "orders").withColumn(
        "__violations", F.lit(None).cast("string")
    ).withColumn("tbl", F.lit("main"))
    quar = publish.read_table(spark, root, "orders__quarantine").withColumn(
        "tbl", F.lit("quarantine")
    )
    return main.unionByName(quar)


ORACLE_CONSTRAINTS_QUARANTINE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey % 4 <> 0
),
staged AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 6 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0 THEN NULL
              ELSE ROUND(ROUND(o_totalprice, 2) + 1.0, 2) END AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
clean AS (
  SELECT * FROM staged
  WHERE price IS NOT NULL AND o_orderstatus IN ('O', 'F', 'P')
),
quar AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, price,
         concat_ws(',',
           CASE WHEN price IS NULL THEN 'not_null:price' END,
           CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                THEN 'values_in:o_orderstatus' END) AS __violations
  FROM staged
  WHERE price IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P')
),
main AS (
  SELECT b.* FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM clean)
  UNION ALL
  SELECT * FROM clean
)
SELECT o_orderkey, o_custkey, o_orderstatus, price,
       CAST(NULL AS VARCHAR) AS __violations, 'main' AS tbl
FROM main
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, price, __violations,
       'quarantine' AS tbl
FROM quar
"""


def q_constraints_quarantine_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine routing on the COPY-ON-WRITE merge path (round 8):
    identical lifecycle to u12_constraints_quarantine, but the violating
    batch lands via merge_into (full-rewrite upsert) instead of
    merge_into_mor — the staging rows are the row provenance, so the
    same split applies: clean rows merge, violators divert to
    orders__quarantine with their violation labels.  Same oracle — both
    merge paths must produce the identical main ∪ quarantine state."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("cqc_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base.filter(F.col("o_orderkey") % 4 != 0)}, root,
        table_keys={"orders": ["o_orderkey"]},
    )
    publish.set_constraints(
        root, "orders",
        [["not_null", "price"], ["values_in", "o_orderstatus", ["O", "F", "P"]]],
        on_violation="quarantine",
    )
    staged = (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 6 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus")),
        )
        .withColumn(
            "price",
            F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
            .otherwise(F.round(F.col("price") + 1.0, 2)),
        )
    )
    publish.merge_into(spark, root, "orders", staged)
    main = publish.read_table(spark, root, "orders").withColumn(
        "__violations", F.lit(None).cast("string")
    ).withColumn("tbl", F.lit("main"))
    quar = publish.read_table(spark, root, "orders__quarantine").withColumn(
        "tbl", F.lit("quarantine")
    )
    return main.unionByName(quar)


def q_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML front-end over the store (round 8, plans/store_sql.py):
    `MERGE INTO ... USING ... ON ... WHEN MATCHED/NOT MATCHED` statements
    route to the same merge engine the Python API uses, opening the
    store's write surface to pure-SQL tooling (the reference's callers
    speak SQL to SQL Server; src/EcomProvider.cs:1018-1036 is the
    transaction envelope this rides).  Lifecycle: seed orders (keys
    recorded), MERGE a price-bump-plus-new-rows batch from a temp view
    (full upsert), a second MERGE ... WHEN MATCHED THEN DELETE prunes a
    slice, then a third MERGE with WHEN NOT MATCHED BY SOURCE THEN
    UPDATE (round 9 — U7 deactivate-missing in SQL: rows absent from the
    sync source get flagged, matched rows take the source row) — the
    oracle replays all three statements in plain SQL."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("sqlm_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base.filter(F.col("o_orderkey") % 4 != 0)}, root,
        table_keys={"orders": ["o_orderkey"]},
    )
    (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("price", F.round(F.col("price") + 1.0, 2))
        .createOrReplaceTempView("sqlm_staging")
    )
    s = store_sql(spark, root)
    s.sql(
        "MERGE INTO orders USING sqlm_staging ON orders.o_orderkey = "
        "sqlm_staging.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    base.filter(F.col("o_orderkey") % 9 == 0).createOrReplaceTempView(
        "sqlm_doomed"
    )
    s.sql(
        "MERGE INTO orders USING sqlm_doomed ON orders.o_orderkey = "
        "sqlm_doomed.o_orderkey WHEN MATCHED THEN DELETE"
    )
    (
        base.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("price", F.round(F.col("price") + 2.0, 2))
        .createOrReplaceTempView("sqlm_sync")
    )
    s.sql(
        "MERGE INTO orders USING sqlm_sync ON orders.o_orderkey = "
        "sqlm_sync.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'Z'"
    )
    return publish.read_table(spark, root, "orders")


ORACLE_SQL_MERGE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey % 4 <> 0
),
staged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(ROUND(o_totalprice, 2) + 1.0, 2) AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
merged AS (
  SELECT b.* FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM staged)
  UNION ALL
  SELECT * FROM staged
),
pruned AS (
  SELECT * FROM merged WHERE o_orderkey % 9 <> 0
)
SELECT p.o_orderkey, p.o_custkey,
       CASE WHEN p.o_orderkey % 5 <> 0 THEN 'Z'
            ELSE p.o_orderstatus END AS o_orderstatus,
       CASE WHEN p.o_orderkey % 5 = 0
            THEN (SELECT ROUND(ROUND(o.o_totalprice, 2) + 2.0, 2)
                  FROM orders o WHERE o.o_orderkey = p.o_orderkey)
            ELSE p.price END AS price
FROM pruned p
"""


def q_sql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UPDATE front-end (round 9, plans/store_sql.py): ``UPDATE t SET
    c = expr WHERE pred`` — the reference's callers issue exactly this
    shape against SQL Server (src/EcomProvider.cs price/status fixups).
    Two engines in one lifecycle: the first UPDATE rides the default
    copy-on-write rewrite; the second runs under ``mor=True`` and must
    land as an O(matched) update-only DELTA (asserted in-query from the
    manifest entry — the 100 TB path: a predicate fixup on a huge table
    should never rewrite the base).  SET expressions see PRE-update
    values."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("squ_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base}, root, table_keys={"orders": ["o_orderkey"]}
    )
    store_sql(spark, root).sql(
        "UPDATE orders SET price = price + o_custkey, "
        "o_orderstatus = 'D' WHERE o_custkey % 10 = 0"
    )
    store_sql(spark, root, mor=True).sql(
        "UPDATE orders SET price = price + 5.0 WHERE o_orderkey % 13 = 0"
    )
    entry = publish.current_manifest(root)["tables"]["orders"]
    if not (isinstance(entry, dict) and entry.get("deltas")):
        raise AssertionError(
            "mor=True UPDATE must commit an update-only delta, not "
            f"rewrite the base: {entry!r}"
        )
    return publish.read_table(spark, root, "orders")


ORACLE_SQL_UPDATE = """
WITH step1 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_custkey % 10 = 0 THEN 'D'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_custkey % 10 = 0
              THEN ROUND(o_totalprice, 2) + o_custkey
              ELSE ROUND(o_totalprice, 2) END AS price
  FROM orders
)
SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 13 = 0 THEN price + 5.0
            ELSE price END AS price
FROM step1
"""


def q_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata type widening on the merge-on-read path (round 9,
    publish._prepare_mor_delta / _TYPE_WIDENINGS): a staging batch
    carrying int→long and float→double columns widens the table's
    recorded schema WITHOUT rewriting the base — readers cast old files
    up at reconstruction; Delta/Iceberg treat widening as metadata for
    the same reason (at 100 TB the CoW rewrite is exactly what MoR
    exists to avoid).  The query runs the SAME lifecycle through BOTH
    engines (MoR metadata widening vs CoW rewrite) and returns both
    states tagged, so the oracle's single replay pins engine parity by
    value hash.  In-query asserts: the MoR base was not rewritten (entry
    still carries deltas + schema_json) and both engines land
    bigint/double."""
    from dataintegration_ecomprovider_spark.plans import publish

    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 100).cast("int").alias("qty"),
        F.round("o_totalprice", 2).cast("float").alias("price"),
    )
    narrow = (
        Catalog(spark, sf_dir).table("orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            ((F.col("o_custkey") % 100) + 1).cast("int").alias("qty"),
            (F.round("o_totalprice", 2).cast("float") + F.lit(1.0))
            .cast("float").alias("price"),
        )
    )
    wide = (
        Catalog(spark, sf_dir).table("orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            ((F.col("o_custkey") % 100).cast("long") + F.lit(5_000_000_000))
            .alias("qty"),
            (F.round("o_totalprice", 2) + F.lit(0.5)).alias("price"),
        )
    )
    out = {}
    for mode in ("mor", "cow"):
        root = _scratch_store_root(f"twide_{mode}")
        publish.publish_tables(
            spark, {"orders": base}, root,
            table_keys={"orders": ["o_orderkey"]},
        )
        if mode == "mor":
            publish.merge_into_mor(spark, root, "orders", narrow)
            publish.merge_into_mor(
                spark, root, "orders", wide, evolve_schema=True
            )
            entry = publish.current_manifest(root)["tables"]["orders"]
            if not (entry.get("deltas") and entry.get("schema_json")):
                raise AssertionError(
                    "widening must be metadata-only on MoR: "
                    f"{ {k: entry.get(k) for k in ('deltas', 'schema_json')} }"
                )
        else:
            publish.merge_into(spark, root, "orders", narrow)
            publish.merge_into(
                spark, root, "orders", wide, evolve_schema=True
            )
        df = publish.read_table(spark, root, "orders")
        if dict(df.dtypes)["qty"] != "bigint" or \
                dict(df.dtypes)["price"] != "double":
            raise AssertionError(f"{mode} did not widen: {df.dtypes}")
        out[mode] = df.withColumn("engine", F.lit(mode))
    return out["mor"].unionByName(out["cow"])


ORACLE_TYPE_WIDENING = """
WITH base AS (
  SELECT o_orderkey, CAST(o_custkey % 100 AS INTEGER) AS qty,
         CAST(ROUND(o_totalprice, 2) AS REAL) AS price
  FROM orders
),
narrow AS (
  SELECT o_orderkey, CAST(o_custkey % 100 + 1 AS INTEGER) AS qty,
         CAST(CAST(ROUND(o_totalprice, 2) AS REAL) + 1.0 AS REAL) AS price
  FROM orders WHERE o_orderkey % 7 = 0
),
m1 AS (
  SELECT b.* FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM narrow)
  UNION ALL SELECT * FROM narrow
),
wide AS (
  SELECT o_orderkey, CAST(o_custkey % 100 AS BIGINT) + 5000000000 AS qty,
         ROUND(o_totalprice, 2) + 0.5 AS price
  FROM orders WHERE o_orderkey % 5 = 0
),
m2 AS (
  SELECT m.o_orderkey, CAST(m.qty AS BIGINT) AS qty,
         CAST(m.price AS DOUBLE) AS price
  FROM m1 m WHERE m.o_orderkey NOT IN (SELECT o_orderkey FROM wide)
  UNION ALL SELECT * FROM wide
)
SELECT 'mor' AS engine, * FROM m2
UNION ALL
SELECT 'cow' AS engine, * FROM m2
"""


def q_partial_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL-COLUMN merge-on-read updates (round 9,
    publish.merge_into_mor(partial_update=True) — Hudi partial-update /
    Delta UPDATE-SET-subset trade): a staging of (key + the columns the
    batch sets) commits a delta as NARROW as the update; unset columns
    keep whatever the row holds at read time, later wins PER COLUMN.
    Lifecycle: seed orders → full-row MoR upsert (price bump on evens) →
    partial price+10 on %3 keys (key+price only) → partial status='P' on
    %5 keys (key+status only) → read.  In-query asserts: both partial
    deltas carry kinds=["partial"] with their set_cols recorded, and the
    partial delta FILES physically hold only key+set columns (the
    narrowness IS the 100 TB feature — a one-column fixup on a
    500-column table writes 1/250th the bytes)."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("partial_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base}, root, table_keys={"orders": ["o_orderkey"]}
    )
    publish.merge_into_mor(
        spark, root, "orders",
        base.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("price", F.round(F.col("price") + 1.0, 2)),
    )
    publish.merge_into_mor(
        spark, root, "orders",
        publish.read_table(spark, root, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", (F.col("price") + 10.0).alias("price")),
        partial_update=True, insert_new=False,
    )
    publish.merge_into_mor(
        spark, root, "orders",
        base.filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", F.lit("P").alias("o_orderstatus")),
        partial_update=True, insert_new=False,
    )
    entry = publish.current_manifest(root)["tables"]["orders"]
    partials = [d for d in entry["deltas"] if d.get("kinds") == ["partial"]]
    if [d.get("set_cols") for d in partials] != [["price"], ["o_orderstatus"]]:
        raise AssertionError(f"partial deltas malformed: {entry['deltas']}")
    import pyarrow.parquet as pq

    for d, want in zip(partials, (["o_orderkey", "price"],
                                  ["o_orderkey", "o_orderstatus"])):
        fields = [
            n for n in pq.read_schema(publish._data_files(d["path"])[0]).names
            if not n.startswith("__")
        ]
        if fields != want:
            raise AssertionError(f"partial delta not narrow: {fields}")
    return publish.read_table(spark, root, "orders")


ORACLE_PARTIAL_UPDATE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS price
  FROM orders
),
m1 AS (  -- full-row upsert: evens take the bumped price
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 2 = 0 THEN ROUND(price + 1.0, 2)
              ELSE price END AS price
  FROM base
),
m2 AS (  -- partial: price overlay on %3 keys, other columns untouched
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0 THEN price + 10.0
              ELSE price END AS price
  FROM m1
)
SELECT o_orderkey, o_custkey,  -- partial: status overlay on %5 keys
       CASE WHEN o_orderkey % 5 = 0 THEN 'P' ELSE o_orderstatus END
         AS o_orderstatus,
       price
FROM m2
"""


def q_sql_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL transaction trio (round 9, plans/store_sql.py): BEGIN /
    COMMIT / ROLLBACK — the statement form of transaction() for SQL-only
    orchestrators.  Lifecycle: a rolled-back block leaves NOTHING (the
    version is asserted unchanged in-query), then a committed block lands
    a MERGE + a DELETE FROM on two tables as ONE atomic version; the
    oracle replays only the committed block."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("sqltx_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark,
        {"orders": base.filter(F.col("o_orderkey") % 4 != 0),
         "audit": base.filter(F.col("o_orderkey") % 4 == 0)},
        root,
        table_keys={"orders": ["o_orderkey"], "audit": ["o_orderkey"]},
    )
    (
        base.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("price", F.round(F.col("price") + 1.0, 2))
        .createOrReplaceTempView("sqltx_staging")
    )
    s = store_sql(spark, root)
    v0 = publish.current_manifest(root)["version"]
    s.sql("BEGIN TRANSACTION")
    s.sql("MERGE INTO orders USING sqltx_staging ON orders.o_orderkey = "
          "sqltx_staging.o_orderkey "
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    s.sql("ROLLBACK")
    if publish.current_manifest(root)["version"] != v0:
        raise AssertionError("ROLLBACK must commit nothing")
    s.sql("BEGIN TRANSACTION AS 'sqltx' BATCH 1")
    s.sql("MERGE INTO orders USING sqltx_staging ON orders.o_orderkey = "
          "sqltx_staging.o_orderkey "
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    s.sql("DELETE FROM audit WHERE o_orderkey % 3 = 0")
    s.sql("COMMIT")
    if publish.current_manifest(root)["version"] != v0 + 1:
        raise AssertionError("the block must land as ONE version")
    # replay of the whole block (same app/batch) is an atomic no-op
    s.sql("BEGIN TRANSACTION AS 'sqltx' BATCH 1")
    s.sql("DELETE FROM audit WHERE o_orderkey >= 0")
    s.sql("COMMIT")
    if publish.current_manifest(root)["version"] != v0 + 1:
        raise AssertionError("a replayed block must be a no-op")
    return (
        publish.read_table(spark, root, "orders")
        .withColumn("src", F.lit("orders"))
        .unionByName(
            publish.read_table(spark, root, "audit")
            .withColumn("src", F.lit("audit"))
        )
    )


ORACLE_SQL_TRANSACTION = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS price
  FROM orders
),
staged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(ROUND(o_totalprice, 2) + 1.0, 2) AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
merged AS (
  SELECT b.* FROM base b
  WHERE b.o_orderkey % 4 <> 0
    AND b.o_orderkey NOT IN (SELECT o_orderkey FROM staged)
  UNION ALL
  SELECT * FROM staged
)
SELECT *, 'orders' AS src FROM merged
UNION ALL
SELECT *, 'audit' AS src FROM base
WHERE o_orderkey % 4 = 0 AND o_orderkey % 3 <> 0
"""


def q_object_store_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned store on the CONDITIONAL-WRITE commit backend
    (round 9, plans/commit_protocol.py ConditionalCommitProtocol): the
    store root durably opts in via ``persist_protocol`` (_PROTOCOL.json),
    after which every commit — publish, MoR merge, delete markers —
    rides etag-CAS conditional puts against a (directory-emulated)
    object store instead of POSIX rename/O_EXCL; the API maps 1:1 onto
    S3 conditional PUT / GCS ifGenerationMatch, which is where a 100 TB
    store's manifest actually lives.  Asserted in-query: the root holds
    NO MANIFEST.json (nothing bypassed the seam) and the lifecycle's
    versions all resolve through the backend (time travel reads v1).
    The reference semantic is the transaction envelope at
    src/EcomProvider.cs:1018-1036."""
    import os as _os

    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.commit_protocol import (
        persist_protocol,
    )

    root = _scratch_store_root("objstore_store")
    persist_protocol(root, "conditional")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base.filter(F.col("o_orderkey") % 3 != 0)}, root,
        table_keys={"orders": ["o_orderkey"]},
    )
    publish.merge_into_mor(
        spark, root, "orders",
        base.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("price", F.round(F.col("price") + 1.0, 2)),
        deletes=base.filter(F.col("o_orderkey") % 11 == 0)
        .select("o_orderkey"),
    )
    if _os.path.exists(_os.path.join(root, "MANIFEST.json")):
        raise AssertionError(
            "conditional backend must not write a root MANIFEST.json"
        )
    if publish.read_table_at(spark, root, "orders", 1).limit(1).count() != 1:
        raise AssertionError("time travel through the backend failed")
    return publish.read_table(spark, root, "orders")


ORACLE_OBJECT_STORE_COMMIT = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey % 3 <> 0
),
staged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(ROUND(o_totalprice, 2) + 1.0, 2) AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
merged AS (
  SELECT b.* FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM staged)
  UNION ALL
  SELECT * FROM staged
)
SELECT * FROM merged WHERE o_orderkey % 11 <> 0
"""


def q_bloom_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter data skipping (round 4): orders is published hash-
    scattered into 8 files (every file's o_orderkey [min, max] spans the
    domain — min/max stats prune NOTHING for a point lookup), then
    publish.write_bloom_sidecar builds a per-file Bloom index and
    scan_table proves most files cannot contain the probed keys.  This is
    the 100 TB needle lookup (order id / user id / doc hash against
    append-ordered files) — Delta's Bloom index / Parquet bloom pages
    role.  The query asserts pruning actually happened, then returns the
    exact rows; the oracle is a plain IN."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("bloom_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    # hash-scatter so min/max is useless on o_orderkey by construction
    publish.publish_tables(
        spark, {"orders": base.repartition(8, "o_orderstatus", "o_custkey")}, root
    )
    probes = [32, 323, 3200, 9999998]  # 3 present-ish keys + 1 absent
    baseline, total = publish.prune_files(root, "orders", [("o_orderkey", "in", probes)])
    publish.write_bloom_sidecar(spark, root, "orders", ["o_orderkey"], fpp=0.001)
    kept, _ = publish.prune_files(root, "orders", [("o_orderkey", "in", probes)])
    if not len(kept) < len(baseline):  # the point of the index IS the skip
        raise AssertionError(
            f"expected bloom skipping, kept {len(kept)}/{len(baseline)}/{total}"
        )
    return publish.scan_table(spark, root, "orders", [("o_orderkey", "in", probes)])


ORACLE_BLOOM_SCAN = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey IN (32, 323, 3200, 9999998)
"""


def q_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered compaction + multi-dimension data skipping
    (round 4): orders lands hash-layed-out (no file skippable), then
    `compact(cluster_by=["o_custkey", "o_totalprice"])` rewrites it
    ordered by an interleaved-bit Z value, so per-file [min, max] ranges
    are narrow on BOTH clustered columns — the OPTIMIZE ZORDER BY role.
    The in-query assertion requires a predicate on the SECOND clustered
    column alone to skip files, which a lexicographic sort can never do;
    results stay exact (residual Spark filter), so the oracle is a plain
    WHERE.  At 100 TB this is how point/range lookups on two independent
    dimensions of one fact table both avoid scanning it."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("zorder_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    publish.publish_tables(spark, {"orders": base.repartition(8)}, root)
    publish.compact(
        spark, root, "orders", target_files=8,
        cluster_by=["o_custkey", "o_totalprice"],
    )
    where = [("o_totalprice", "<", 50000.0)]
    kept, total = publish.prune_files(root, "orders", where)
    if not (0 < len(kept) < total):  # the point of the operator IS the skip
        raise AssertionError(f"expected z-order skipping, kept {len(kept)}/{total}")
    return publish.scan_table(spark, root, "orders", where)


ORACLE_ZORDER_SCAN = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE ROUND(o_totalprice, 2) < 50000.0
"""


def q_auto_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-DRIVEN re-clustering (round 5, publish.recluster — the
    Delta OPTIMIZE-when-needed / liquid-clustering role): orders lands
    hash-scattered (clustering_overlap ≈ num_files, so min/max skipping
    prunes nothing), then ONE maintain_store pass measures the
    fragmentation from the stats sidecar alone (no Spark job for the
    trigger) and rewrites the table ordered by o_custkey; the same range
    scan afterwards opens a fraction of the files.  In-query assertions
    pin the trigger firing and the layout improving; results stay exact
    (residual Spark filter), so the oracle is a plain WHERE."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("recluster_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    publish.publish_tables(
        spark, {"orders": base.repartition(8, "o_orderkey")}, root
    )
    before = publish.clustering_overlap(root, "orders", "o_custkey")
    report = publish.maintain_store(
        spark, root,
        recluster_specs={
            "orders": {"by": ["o_custkey"], "max_overlap": 2.0,
                       "target_files": 8},
        },
    )
    res = report["reclustered"]["orders"]
    after = publish.clustering_overlap(root, "orders", "o_custkey")
    if not (res["reclustered"] and after < before and after <= 2.0):
        raise AssertionError(
            f"recluster did not improve layout: {before:.1f} -> {after:.1f}"
        )
    # SF-relative range: the bottom ~10% of the custkey domain always
    # lands inside the first of 8 range-sorted files, at any scale
    # factor (the max lookup is a bounded one-value driver action)
    mx = base.agg(F.max("o_custkey")).collect()[0][0]
    where = [("o_custkey", "<", mx // 10)]
    kept, total = publish.prune_files(root, "orders", where)
    if not 0 < len(kept) < total:  # the point of the operator IS the skip
        raise AssertionError(f"expected post-recluster skipping, kept {len(kept)}/{total}")
    return publish.scan_table(spark, root, "orders", where)


ORACLE_AUTO_RECLUSTER = """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders WHERE o_custkey < (SELECT MAX(o_custkey) // 10 FROM orders)
"""


def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned publish + partition-pruned read (round 4): orders
    published partitioned by order year (publish_tables(partition_by=...));
    the year filter prunes whole `o_year=` directories at plan time
    (PartitionFilters — asserted in tests/test_store_layout.py; here the
    oracle checks the value semantics).  Partitioning a 100 TB fact table
    by ingest date is THE baseline layout this enables."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("part_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        F.year("o_orderdate").alias("o_year"),
    )
    publish.publish_tables(
        spark, {"orders": base}, root, partition_by={"orders": ["o_year"]}
    )
    scanned = publish.read_table(spark, root, "orders").filter(
        F.col("o_year") == 1996
    )
    return scanned.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("o_totalprice"), 1).alias("sum_total"),
    )


ORACLE_PARTITIONED_SCAN = """
SELECT o_orderpriority, COUNT(*) AS cnt,
       ROUND(SUM(o_totalprice), 1) AS sum_total
FROM orders WHERE year(o_orderdate) = 1996
GROUP BY o_orderpriority
"""


def q_store_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental store-to-store replication (publish.replicate_table):
    seed the replica at source v1, advance the source two more versions,
    then one delta sync ships read_changes(v1 → v3) and applies it — the
    replica must equal v3 exactly, so the oracle IS v3's definition.
    After the seed, each sync moves O(changed rows), never the table —
    the cross-region story at 100 TB (the reference would re-run the full
    job against the second destination, src/EcomProvider.cs:937-966)."""
    from dataintegration_ecomprovider_spark.plans import publish

    src = _scratch_store_root("repl_src")
    dst = _scratch_store_root("repl_dst")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": v1}, src, table_keys={"orders": ["o_orderkey"]}
    )
    publish.replicate_table(spark, src, dst, "orders")  # seed @ v1
    v2 = base.filter(F.col("o_orderkey") % 4 != 0)
    publish.publish_tables(spark, {"orders": v2}, src)
    v3 = v2.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v3}, src)
    res = publish.replicate_table(spark, src, dst, "orders")  # delta v1→v3
    if res["mode"] != "delta":
        raise AssertionError(f"expected a delta sync, got {res['mode']}")
    return publish.read_table(spark, dst, "orders")


def q_incremental_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (plans/materialize.py): seed a
    COUNT/SUM aggregate over orders-by-status at v1, advance the source a
    version (inserts + deletes + value updates + group MOVES via the
    status flip), refresh from the CDC delta — the maintained table must
    equal the direct aggregate of v2, which IS the oracle.  O(changed
    rows) per refresh where the reference re-runs the aggregation job
    (src/EcomProvider.cs:937-966)."""
    from dataintegration_ecomprovider_spark.plans import materialize, publish

    root = _scratch_store_root("ivm_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": v1}, root, table_keys={"orders": ["o_orderkey"]}
    )
    materialize.maintain_aggregate(
        spark, root, "orders", "orders_by_status",
        ["o_orderstatus"], ["o_totalprice"],
    )
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v2}, root)
    res = materialize.maintain_aggregate(
        spark, root, "orders", "orders_by_status",
        ["o_orderstatus"], ["o_totalprice"],
    )
    if res["mode"] != "delta":
        raise AssertionError(f"expected a delta refresh, got {res['mode']}")
    out = publish.read_table(spark, root, "orders_by_status")
    return out.select(
        "o_orderstatus", "cnt",
        F.round("sum_o_totalprice", 2).alias("sum_total"),
    )


def q_incremental_aggregate_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-slice IVM (round 5): the same two-version orders store as
    u12_incremental_aggregate, but the maintained aggregate covers ONLY
    the slice o_orderstatus = 'O' (maintain_aggregate(src_where=...),
    composing the predicate-scoped CDC) — the status flip moves rows OUT
    of the slice between versions, so the refresh retracts them.  The
    oracle is the direct aggregate of the filtered v2.  At 100 TB this
    is the per-tenant maintained view costing the tenant's delta."""
    from dataintegration_ecomprovider_spark.plans import materialize, publish

    root = _scratch_store_root("ivm_filtered_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": v1}, root, table_keys={"orders": ["o_orderkey"]}
    )
    spec = dict(
        src="orders", dst="open_by_key_band",
        group_cols=["o_orderstatus"], sum_cols=["o_totalprice"],
        src_where=[("o_orderstatus", "=", "O")],
    )
    materialize.maintain_aggregate(spark, root, **spec)
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v2}, root)
    res = materialize.maintain_aggregate(spark, root, **spec)
    if res["mode"] != "delta":
        raise AssertionError(f"expected a delta refresh, got {res['mode']}")
    out = publish.read_table(spark, root, "open_by_key_band")
    return out.select(
        "o_orderstatus", "cnt",
        F.round("sum_o_totalprice", 2).alias("sum_total"),
    )


ORACLE_INCREMENTAL_AGGREGATE_FILTERED = """
WITH v2 AS (
  SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(COALESCE(o_totalprice, 0)), 2) AS sum_total
FROM v2 WHERE o_orderstatus = 'O'
GROUP BY 1
"""


def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view maintenance (plans/materialize.py::maintain_join): seed an
    orders-⋈-customer export view at v1, advance BOTH sides a version —
    orders inserts/deletes, FK moves (custkey+1 for every 7th order), value
    updates (total+10 for every 11th); customer inserts/deletes plus a
    segment rewrite on every 3rd key — and refresh from the two CDC deltas.
    The maintained view must equal the direct join of v2, which IS the
    oracle.  Only affected fact keys are rebuilt (changed orders ∪ orders
    referencing changed customers) where the reference re-runs the whole
    export join per refresh (src/EcomProvider.cs:937-966)."""
    from dataintegration_ecomprovider_spark.plans import materialize, publish

    root = _scratch_store_root("ivm_join_store")
    cat = Catalog(spark, sf_dir)
    orders = cat.table("orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total")
    )
    cust = cat.table("customer").select("c_custkey", "c_name", "c_mktsegment")
    v1_orders = orders.filter(F.col("o_orderkey") % 3 != 0)
    v1_cust = cust.filter(F.col("c_custkey") % 2 != 0)
    publish.publish_tables(
        spark, {"orders": v1_orders, "customer": v1_cust}, root,
        table_keys={"orders": ["o_orderkey"], "customer": ["c_custkey"]},
    )
    kw = dict(fk="o_custkey", dim_key="c_custkey", how="left")
    materialize.maintain_join(
        spark, root, "orders", "customer", "orders_enriched", **kw
    )
    v2_orders = (
        orders.filter(F.col("o_orderkey") % 4 != 0)
        .withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_custkey") + 1)
            .otherwise(F.col("o_custkey")),
        )
        .withColumn(
            "total",
            F.when(
                F.col("o_orderkey") % 11 == 0,
                F.round(F.col("total") + 10.0, 2),
            ).otherwise(F.col("total")),
        )
    )
    v2_cust = cust.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    publish.publish_tables(
        spark, {"orders": v2_orders, "customer": v2_cust}, root
    )
    res = materialize.maintain_join(
        spark, root, "orders", "customer", "orders_enriched", **kw
    )
    if res["mode"] != "delta":
        raise AssertionError(f"expected a delta refresh, got {res['mode']}")
    return publish.read_table(spark, root, "orders_enriched").select(
        "o_orderkey", "o_custkey", "total", "c_name", "c_mktsegment"
    )


def q_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct maintenance (materialize distinct_cols, round 4):
    seed an approx-distinct-customers-per-status view, advance the source
    (inserts + deletes + status moves), refresh from the CDC delta —
    inserts ride the sketch union, retractions the per-group recompute.
    Oracle shape: exact columns ride with a BOOLEAN bounded-error
    assertion on the engine's own estimate (the sketch_hll_quantile
    contract), so the row hash is portable."""
    from dataintegration_ecomprovider_spark.plans import materialize, publish

    root = _scratch_store_root("ivm_hll_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": v1}, root, table_keys={"orders": ["o_orderkey"]}
    )
    kw = dict(sum_cols=[], distinct_cols=["o_custkey"])
    materialize.maintain_aggregate(
        spark, root, "orders", "cust_by_status", ["o_orderstatus"], **kw
    )
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v2}, root)
    res = materialize.maintain_aggregate(
        spark, root, "orders", "cust_by_status", ["o_orderstatus"], **kw
    )
    if res["mode"] != "delta":
        raise AssertionError(f"expected a delta refresh, got {res['mode']}")
    view = materialize.estimate_distinct(
        publish.read_table(spark, root, "cust_by_status"), ["o_custkey"]
    )
    exact = (
        publish.read_table(spark, root, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct")
        )
    )
    return view.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        F.col("cnt").cast("bigint").alias("n_orders"),
        "exact_distinct",
        (
            F.abs(
                F.col("approx_distinct_o_custkey").cast("double")
                - F.col("exact_distinct")
            )
            / F.col("exact_distinct")
            < 0.05
        ).alias("hll_within_5pct"),
    )


ORACLE_INCREMENTAL_DISTINCT = """
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_custkey
  FROM orders WHERE o_orderkey % 4 <> 0
),
agg AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
         CAST(approx_count_distinct(o_custkey) AS BIGINT) AS hll
  FROM v2 GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_orders, exact_distinct,
       ABS(CAST(hll AS DOUBLE) - exact_distinct) / exact_distinct < 0.05
         AS hll_within_5pct
FROM agg
"""


ORACLE_INCREMENTAL_JOIN = """
WITH v2_orders AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 11 = 0 THEN ROUND(ROUND(o_totalprice, 2) + 10.0, 2)
              ELSE ROUND(o_totalprice, 2) END AS total
  FROM orders WHERE o_orderkey % 4 <> 0
),
v2_cust AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 3 = 0 THEN 'MOVED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 5 <> 0
)
SELECT o.o_orderkey, o.o_custkey, o.total, c.c_name, c.c_mktsegment
FROM v2_orders o LEFT JOIN v2_cust c ON o.o_custkey = c.c_custkey
"""


ORACLE_INCREMENTAL_AGGREGATE = """
SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(COALESCE(ROUND(o_totalprice, 2), 0)), 2) AS sum_total
FROM orders WHERE o_orderkey % 4 <> 0
GROUP BY 1
"""


def q_sql_matview_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG + HAVING in SQL matviews (round 11, the r10 verdict's matview-
    expressiveness gap): ``AVG(c) AS avg_c`` is DECLARED in the view but
    physically maintained as sum_<c> + cnt — the only self-maintainable
    decomposition (an average admits no delta algebra; its parts do) —
    and derived at read time by the SELECT front-end's view overlay;
    ``HAVING`` compiles to a read-time post-filter over the canonical
    columns, so groups move in and out of the slice as counts evolve
    without touching the O(delta) maintenance path.  Same two-version
    lifecycle as u12_sql_matview (delta mode asserted); the oracle is
    the direct AVG + HAVING aggregate of v2."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("sql_matview_avg_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": v1}, root, table_keys={"orders": ["o_orderkey"]}
    )
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW prio_stats AS "
        "SELECT o_orderpriority, COUNT(*) AS cnt, "
        "AVG(o_totalprice) AS avg_o_totalprice "
        "FROM orders GROUP BY o_orderpriority HAVING cnt >= 5"
    )
    if seed["mode"] != "seed":
        raise AssertionError(f"expected a seed, got {seed['mode']}")
    # a HAVING referencing a column outside the canonical schema must
    # fail the CREATE *cleanly*: no declaration left for REFRESH to trip
    try:
        sq.sql(
            "CREATE MATERIALIZED VIEW bad_view AS SELECT o_orderpriority, "
            "COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority "
            "HAVING no_such_col > 1"
        )
        raise AssertionError("bad HAVING column must fail the CREATE")
    except AssertionError:
        raise
    except Exception:
        pass
    from dataintegration_ecomprovider_spark.plans import materialize

    if "bad_view" in materialize.declared_views(root):
        raise AssertionError("failed CREATE left a stale declaration")
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("9-SYNTH")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    publish.publish_tables(spark, {"orders": v2}, root)
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    if rep["errors"] or any(
        v["mode"] != "delta" for v in rep["views"].values()
    ):
        raise AssertionError(f"expected clean delta refreshes: {rep}")
    return sq.sql(
        "SELECT o_orderpriority, cnt, "
        "ROUND(avg_o_totalprice, 6) AS avg_total FROM store_prio_stats"
    )


ORACLE_SQL_MATVIEW_AVG = """
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN '9-SYNTH'
              ELSE o_orderpriority END AS o_orderpriority,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(o_totalprice) / COUNT(*), 6) AS avg_total
FROM v2
GROUP BY o_orderpriority
HAVING COUNT(*) >= 5
"""


def q_sql_matview_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression aggregates in SQL matviews (round 12, the r11
    verdict's matview-expressiveness ask), superset of the AVG+HAVING
    lifecycle it folds: ``SUM(<arithmetic expr>) AS sum_x`` maintains
    the expression's sum EXACTLY (the expression evaluates in the
    rowwise ± delta feed — over old column values on the retract side),
    and ``COUNT(DISTINCT c)`` is EXACT via a companion pair table
    ``<dst>__xd_<c>`` keyed by (group, c) — itself an ordinary
    self-maintainable aggregate view — counted per group at read time
    (the declared choice vs the O(1)-read APPROX_COUNT_DISTINCT HLL).
    AVG + HAVING ride along from the folded lifecycle; HAVING references
    the read-derived cntd column.  Two-version lifecycle, delta mode
    asserted for main AND companion; the oracle is the direct aggregate
    of v2."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("sql_matview_expr_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderpriority", "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": v1}, root, table_keys={"orders": ["o_orderkey"]}
    )
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW prio_stats AS "
        "SELECT o_orderpriority, COUNT(*) AS cnt, "
        "AVG(o_totalprice) AS avg_o_totalprice, "
        "SUM(o_orderkey % 97 * 2 + 1) AS sum_gross, "
        "COUNT(DISTINCT o_custkey) AS cntd_o_custkey "
        "FROM orders GROUP BY o_orderpriority HAVING cntd_o_custkey >= 3"
    )
    if seed["mode"] != "seed":
        raise AssertionError(f"expected a seed, got {seed['mode']}")
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("9-SYNTH")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    publish.publish_tables(spark, {"orders": v2}, root)
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    if rep["errors"] or any(
        v["mode"] != "delta" for v in rep["views"].values()
    ):
        raise AssertionError(f"expected clean delta refreshes: {rep}")
    # the companion pair table must ALSO have refreshed as a delta (its
    # own watermark; a re-seed here would mean O(source) refresh cost)
    comp = rep["views"]["prio_stats"].get("companions")
    if comp != {"prio_stats__xd_o_custkey": "delta"}:
        raise AssertionError(f"companion must delta-refresh, got {comp}")
    return sq.sql(
        "SELECT o_orderpriority, cnt, "
        "ROUND(avg_o_totalprice, 6) AS avg_total, sum_gross, "
        "cntd_o_custkey FROM store_prio_stats"
    )


ORACLE_SQL_MATVIEW_EXPR = """
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN '9-SYNTH'
              ELSE o_orderpriority END AS o_orderpriority,
         o_custkey,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(o_totalprice) / COUNT(*), 6) AS avg_total,
       CAST(SUM(o_orderkey % 97 * 2 + 1) AS BIGINT) AS sum_gross,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cntd_o_custkey
FROM v2
GROUP BY o_orderpriority
HAVING COUNT(DISTINCT o_custkey) >= 3
"""


def q_sql_matview_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-rollup materialized view (round 13, the r12 verdict's gap
    #2): ``CREATE MATERIALIZED VIEW v AS SELECT dim.c, AGG(fact.x) FROM
    fact JOIN dim ON ... GROUP BY dim.c`` — the first view a warehouse
    consumer declares, previously requiring a hand-split into a join
    view + an aggregate view.  The front-end composes exactly that: an
    internal join view ``<dst>__j`` (maintain_join) feeds an aggregate
    view ``<dst>`` (maintain_aggregate over the join view's CDC), so one
    REFRESH pass keeps the rollup current O(delta) through BOTH feeds —
    fact inserts/deletes/FK-moves/value-updates ride the join delta into
    the ± aggregation algebra, and a dim segment rename moves whole fact
    cohorts ACROSS groups (retract old group, add new) without touching
    unaffected groups.  Seed + one combined fact+dim delta version;
    delta mode asserted for both views.  The measure is integer cents so
    the maintained sum is exact cross-engine.  The oracle is the direct
    rollup of v2.  Reference: the whole export join + aggregation re-runs
    per refresh (src/EcomProvider.cs:937-966)."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("sql_matview_join_store")
    cat = Catalog(spark, sf_dir)
    orders = cat.table("orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cust = cat.table("customer").select("c_custkey", "c_mktsegment")
    v1_orders = orders.filter(F.col("o_orderkey") % 3 != 0)
    v1_cust = cust.filter(F.col("c_custkey") % 2 != 0)
    publish.publish_tables(
        spark, {"orders": v1_orders, "customer": v1_cust}, root,
        table_keys={"orders": ["o_orderkey"], "customer": ["c_custkey"]},
    )
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW seg_stats AS "
        "SELECT customer.c_mktsegment, COUNT(*) AS cnt, "
        "SUM(orders.cents) AS sum_cents "
        "FROM orders JOIN customer ON orders.o_custkey = customer.c_custkey "
        "GROUP BY customer.c_mktsegment"
    )
    if seed["mode"] != "seed" or seed["join_view"]["mode"] != "seed":
        raise AssertionError(f"expected rollup seed, got {seed}")
    v2_orders = (
        orders.filter(F.col("o_orderkey") % 4 != 0)
        .withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_custkey") + 1)
            .otherwise(F.col("o_custkey")),
        )
        .withColumn(
            "cents",
            F.when(
                F.col("o_orderkey") % 11 == 0, F.col("cents") + 1000
            ).otherwise(F.col("cents")),
        )
    )
    v2_cust = cust.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    publish.publish_tables(
        spark, {"orders": v2_orders, "customer": v2_cust}, root
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    if rep["errors"] or any(
        v["mode"] != "delta" for v in rep["views"].values()
    ):
        raise AssertionError(f"expected clean delta refreshes: {rep}")
    return sq.sql(
        "SELECT c_mktsegment, cnt, sum_cents FROM store_seg_stats"
    )


ORACLE_SQL_MATVIEW_JOIN = """
WITH v2_orders AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 11 = 0
              THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) + 1000
              ELSE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 4 <> 0
),
v2_cust AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN 'MOVED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 5 <> 0
)
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(o.cents) AS BIGINT) AS sum_cents
FROM v2_orders o JOIN v2_cust c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_sql_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-declared incremental materialized views (round 10,
    plans/store_sql.py): ``CREATE MATERIALIZED VIEW v AS SELECT ...
    GROUP BY ...`` parses the SELECT into a maintain_aggregate spec,
    persists it in the declared-view registry and seeds it;
    ``REFRESH MATERIALIZED VIEWS`` then consumes ONLY the source's CDC
    delta (mode == 'delta' asserted in-query, as is the registry
    round-trip via SHOW MATERIALIZED VIEWS).  Same two-version orders
    lifecycle as u12_incremental_aggregate (folded here) — inserts +
    deletes + value updates + group moves — but a SQL-only orchestrator
    owns every step; the oracle is the direct aggregate of v2."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("sql_matview_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    v1 = base.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": v1}, root, table_keys={"orders": ["o_orderkey"]}
    )
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW orders_by_status AS "
        "SELECT o_orderstatus, COUNT(*) AS cnt, SUM(o_totalprice) "
        "FROM orders GROUP BY o_orderstatus"
    )
    if seed["mode"] != "seed":
        raise AssertionError(f"expected a seed, got {seed['mode']}")
    # a per-row projection view rides the same registry + refresh pass
    sq.sql(
        "CREATE MATERIALIZED VIEW order_bands AS SELECT o_orderkey, "
        "ROUND(o_totalprice / 1000, 0) AS band FROM orders "
        "WHERE o_orderstatus <> 'X'"
    )
    shown = {r["view"]: r["kind"]
             for r in sq.sql("SHOW MATERIALIZED VIEWS").collect()}
    if shown != {"orders_by_status": "aggregate",
                 "order_bands": "projection"}:
        raise AssertionError(f"registry round-trip broke: {shown}")
    v2 = base.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    publish.publish_tables(spark, {"orders": v2}, root)
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    if rep["errors"] or any(
        v["mode"] != "delta" for v in rep["views"].values()
    ):
        raise AssertionError(f"expected clean delta refreshes: {rep}")
    # the projection view must equal its direct recompute (rows moved
    # INTO 'X' by the status flip retracted via stable-key markers)
    direct = publish.read_table(spark, root, "orders").filter(
        F.col("o_orderstatus") != "X"
    ).select(
        "o_orderkey", F.round(F.col("o_totalprice") / 1000, 0).alias("band")
    )
    maintained = publish.read_table(spark, root, "order_bands")
    # multiset equality in ONE job (guide §1.2 — the two exceptAll
    # counts ran two full-plan jobs for one yes/no answer): tag sides
    # +1/-1, group on the full row; any group with a non-zero sum means
    # the multisets differ.  Equivalent to (A\B) ∪ (B\A) being empty.
    tagged = maintained.withColumn("__side", F.lit(1)).unionByName(
        direct.withColumn("__side", F.lit(-1))
    )
    drift = (
        tagged.groupBy(*maintained.columns)
        .agg(F.sum("__side").alias("__d"))
        .filter(F.col("__d") != 0)
    )
    if drift.limit(1).count():
        raise AssertionError("projection view drifted from its recompute")
    return sq.sql(
        "SELECT o_orderstatus, cnt, ROUND(sum_o_totalprice, 2) AS sum_total "
        "FROM store_orders_by_status"
    )


ORACLE_STORE_REPLICATE = """
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey % 4 <> 0
"""


ORACLE_CDC_APPLY = """
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey % 4 <> 0
"""


ORACLE_VERSION_DIFF = """
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0
),
v2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
)
SELECT
  CASE WHEN v2.o_orderkey IS NULL THEN v1.o_orderkey ELSE v2.o_orderkey END AS o_orderkey,
  CASE WHEN v2.o_orderkey IS NULL THEN v1.o_custkey ELSE v2.o_custkey END AS o_custkey,
  CASE WHEN v2.o_orderkey IS NULL THEN v1.o_orderstatus ELSE v2.o_orderstatus END AS o_orderstatus,
  CASE WHEN v2.o_orderkey IS NULL THEN v1.o_totalprice ELSE v2.o_totalprice END AS o_totalprice,
  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
       WHEN v2.o_orderkey IS NULL THEN 'delete'
       ELSE 'update' END AS change_type
FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
   OR v1.o_custkey IS DISTINCT FROM v2.o_custkey
   OR v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
   OR v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
"""


def q_snapshot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-wide snapshot isolation (round 5, publish.snapshot): pin ONE
    consistent version of a two-table store, then publish junk to BOTH
    tables — the snapshot join still serves the pinned pair.  Per-table
    log formats (Delta/Iceberg/Hudi) version tables independently and
    cannot give this cross-table guarantee; this store's manifest commits
    all tables together, so the pin is free metadata.  The oracle is the
    pinned versions' join."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("snapshot_store")
    cat = Catalog(spark, sf_dir)
    orders = cat.table("orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    ).filter(F.col("o_orderkey") % 2 == 0)
    cust = cat.table("customer").select("c_custkey", "c_name", "c_nationkey")
    publish.publish_tables(spark, {"orders": orders, "customer": cust}, root)
    snap = publish.snapshot(spark, root)
    # both tables move on after the pin
    publish.publish_tables(
        spark,
        {"orders": orders.limit(1), "customer": cust.limit(1)},
        root,
    )
    return (
        snap.table("orders")
        .join(
            F.broadcast(snap.table("customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_nationkey")
    )


ORACLE_SNAPSHOT_JOIN = """
SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 2) AS o_totalprice,
       c.c_name, c.c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 2 = 0
"""


ORACLE_CDC_FILTERED = """
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderstatus = 'O'
),
v2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
),
v2f AS (SELECT * FROM v2 WHERE o_orderstatus = 'O')
SELECT
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_orderkey ELSE v2f.o_orderkey END AS o_orderkey,
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_custkey ELSE v2f.o_custkey END AS o_custkey,
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_orderstatus ELSE v2f.o_orderstatus END AS o_orderstatus,
  CASE WHEN v2f.o_orderkey IS NULL THEN v1.o_totalprice ELSE v2f.o_totalprice END AS o_totalprice,
  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
       WHEN v2f.o_orderkey IS NULL THEN 'delete'
       ELSE 'update' END AS change_type
FROM v1 FULL OUTER JOIN v2f ON v1.o_orderkey = v2f.o_orderkey
WHERE v1.o_orderkey IS NULL OR v2f.o_orderkey IS NULL
   OR v1.o_custkey IS DISTINCT FROM v2f.o_custkey
   OR v1.o_orderstatus IS DISTINCT FROM v2f.o_orderstatus
   OR v1.o_totalprice IS DISTINCT FROM v2f.o_totalprice
"""


def q_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read lifecycle over the U12 versioned store: publish an
    orders base, commit TWO O(delta) merges (merge_into_mor appends
    upsert/delete files, never rewriting the base — Hudi MERGE_ON_READ /
    Delta deletion-vector trade vs the reference re-writing destination
    rows in place per job run, src/EcomProvider.cs:937-966), then read the
    reconstructed current state.  Delta 1 re-prices %5 keys; delta 2
    re-flags %7 keys (some are brand-new inserts — their keys were
    excluded from the base) and deletes %11 keys.  The read-side plan
    touches the base with ONE broadcast anti-join: no base shuffle, no
    sort (tests/test_mor.py::test_mor_base_side_has_no_shuffle)."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("mor_store")
    full = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    base = full.filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(
        spark, {"orders": base}, root, table_keys={"orders": ["o_orderkey"]}
    )
    d1 = full.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") + 1, 2)
    ).withColumn("o_orderstatus", F.lit("M1"))
    publish.merge_into_mor(spark, root, "orders", d1)
    d2 = full.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_orderstatus", F.lit("M2")
    )
    dels = full.filter(F.col("o_orderkey") % 11 == 0).select("o_orderkey")
    publish.merge_into_mor(spark, root, "orders", d2, deletes=dels)
    return publish.read_table(spark, root, "orders")


ORACLE_MERGE_ON_READ = """
WITH full_t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders
),
base AS (SELECT * FROM full_t WHERE o_orderkey % 3 <> 0),
d1 AS (
  SELECT o_orderkey, o_custkey, 'M1' AS o_orderstatus,
         ROUND(o_totalprice + 1, 2) AS o_totalprice
  FROM full_t WHERE o_orderkey % 5 = 0
),
d2 AS (
  SELECT o_orderkey, o_custkey, 'M2' AS o_orderstatus, o_totalprice
  FROM full_t WHERE o_orderkey % 7 = 0
),
dels AS (SELECT o_orderkey FROM full_t WHERE o_orderkey % 11 = 0),
s1 AS (
  SELECT * FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d1)
  UNION ALL SELECT * FROM d1
),
-- delta 2: delete-wins within the call, upserts override s1, deletes drop
s2 AS (
  SELECT * FROM s1
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d2)
    AND o_orderkey NOT IN (SELECT o_orderkey FROM dels)
  UNION ALL
  SELECT * FROM d2 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dels)
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM s2
"""


def q_maintain_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly maintenance pass (publish.maintain_store) exercised as
    a query: seed an orders base, stack THREE merge-on-read deltas past
    the policy budget, run the pass (compact folds the log, the declared
    Bloom index is rebuilt on the fresh base, history vacuumed), then
    return the final state — which must equal the plain upsert chain (the
    oracle), with in-query assertions that the policy actually fired."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("maint_store")
    full = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    publish.publish_tables(
        spark, {"orders": full.filter(F.col("o_orderkey") % 3 != 0)}, root,
        table_keys={"orders": ["o_orderkey"]},
    )
    for mod, status in ((5, "M1"), (7, "M2"), (11, "M3")):
        publish.merge_into_mor(
            spark, root, "orders",
            full.filter(F.col("o_orderkey") % mod == 0).withColumn(
                "o_orderstatus", F.lit(status)
            ),
        )
    report = publish.maintain_store(
        spark, root, max_deltas=2,
        bloom_columns={"orders": ["o_orderkey"]}, keep_versions=1,
        orphan_min_age_seconds=0,
    )
    entry = publish.current_manifest(root)["tables"]["orders"]
    if (
        "orders" not in report["compacted"]
        or report["blooms"] != ["orders"]
        or report["errors"]
        or entry.get("deltas")
    ):
        raise AssertionError(f"maintenance pass misfired: {report}")
    kept, total = publish.prune_files(root, "orders", [("o_orderkey", "=", -1)])
    if kept:  # absent key: the rebuilt bloom must prune every file
        raise AssertionError(f"bloom not live after maintenance: {kept}/{total}")
    return publish.read_table(spark, root, "orders")


ORACLE_MAINTAIN_STORE = """
WITH full_t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders
),
base AS (SELECT * FROM full_t WHERE o_orderkey % 3 <> 0),
d1 AS (SELECT o_orderkey, o_custkey, 'M1' AS o_orderstatus, o_totalprice
       FROM full_t WHERE o_orderkey % 5 = 0),
d2 AS (SELECT o_orderkey, o_custkey, 'M2' AS o_orderstatus, o_totalprice
       FROM full_t WHERE o_orderkey % 7 = 0),
d3 AS (SELECT o_orderkey, o_custkey, 'M3' AS o_orderstatus, o_totalprice
       FROM full_t WHERE o_orderkey % 11 = 0),
s1 AS (
  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d1)
  UNION ALL SELECT * FROM d1
),
s2 AS (
  SELECT * FROM s1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d2)
  UNION ALL SELECT * FROM d2
),
s3 AS (
  SELECT * FROM s2 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM d3)
  UNION ALL SELECT * FROM d3
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM s3
"""


# --- U1/U3 under case-insensitive collation -------------------------------
def q_upsert_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert where staging keys differ from dest keys ONLY in case: the
    reference matches under SQL Server's case-insensitive collation
    (OrdinalIgnoreCase, src/EcomDestinationWriter.cs:50-52, :1053), so
    case-variant keys UPDATE rather than INSERT.  Matched rows keep the
    dest key casing (an UPDATE never rewrites the PK); inserts arrive with
    the staged casing."""
    cust = Catalog(spark, sf_dir).table("customer")
    dest = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_name").alias("cust_name"),
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    staging = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.upper("c_name").alias("cust_name"),
        "c_custkey",
        F.round(F.col("c_acctbal") + 1000.0, 2).alias("acctbal"),
    )
    out = merge.upsert(dest, staging, ["cust_name"], case_insensitive=True)
    return out.select("cust_name", "c_custkey", F.round("acctbal", 2).alias("acctbal"))


ORACLE_UPSERT_CASE_INSENSITIVE = """
WITH dest AS (
  SELECT c_name AS cust_name, c_custkey, ROUND(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_custkey % 3 <> 0
),
staging AS (
  SELECT UPPER(c_name) AS cust_name, c_custkey,
         ROUND(c_acctbal + 1000.0, 2) AS acctbal
  FROM customer WHERE c_custkey % 2 = 0
),
updated AS (
  SELECT d.cust_name,
         COALESCE(s.c_custkey, d.c_custkey) AS c_custkey,
         COALESCE(s.acctbal, d.acctbal) AS acctbal
  FROM dest d LEFT JOIN staging s ON lower(d.cust_name) = lower(s.cust_name)
),
inserted AS (
  SELECT s.* FROM staging s WHERE NOT EXISTS
    (SELECT 1 FROM dest d WHERE lower(d.cust_name) = lower(s.cust_name))
)
SELECT cust_name, c_custkey, ROUND(acctbal, 2) AS acctbal
FROM (SELECT * FROM updated UNION ALL SELECT * FROM inserted)
"""


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-job table profiling (publish.profile_table): per-column
    bounds, null fractions and exactness flags read from the stats
    sidecar alone — reconnaissance on an unfamiliar 100 TB table for the
    cost of one JSON parse.  The oracle recomputes every reported number
    from the data; the in-query assertion pins that no Spark job ran."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("profile_store")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    base = Catalog(spark, sf_dir).table("orders").select(*cols)
    publish.publish_tables(
        spark, {"t": base.filter(F.col("o_orderkey") % 3 == 0).repartition(4)},
        root, table_keys={"t": ["o_orderkey"]}, stats_columns={"t": cols},
    )
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    p = publish.profile_table(root, "t")
    if tracker.getJobIdsForGroup(None) != before:
        raise AssertionError("profile_table ran a Spark job")
    rows = [
        (
            c, str(p["columns"][c]["min"]), str(p["columns"][c]["max"]),
            float(p["columns"][c]["null_fraction"]),
            bool(p["columns"][c]["exact"]),
            int(p["files"]["rows"]),
        )
        for c in cols
    ]
    return spark.createDataFrame(
        rows,
        "col string, mn string, mx string, null_frac double, "
        "exact boolean, rows long",
    )


ORACLE_PROFILE_TABLE = """
WITH s AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0)
SELECT 'o_orderkey' AS col,
       CAST(MIN(o_orderkey) AS VARCHAR) AS mn,
       CAST(MAX(o_orderkey) AS VARCHAR) AS mx,
       ROUND(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS null_frac,
       TRUE AS exact, CAST(COUNT(*) AS BIGINT) AS rows FROM s
UNION ALL
SELECT 'o_custkey',
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR),
       ROUND(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
             / COUNT(*), 6),
       TRUE, CAST(COUNT(*) AS BIGINT) FROM s
UNION ALL
SELECT 'o_orderstatus',
       MIN(o_orderstatus), MAX(o_orderstatus),
       ROUND(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
             / COUNT(*), 6),
       TRUE, CAST(COUNT(*) AS BIGINT) FROM s
"""


def q_multi_table_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TABLE atomic MERGE (publish.merge_many_mor — the write-side
    form of the store's cross-table snapshot guarantee, which single-table
    log formats cannot give): one commit applies upserts AND deletes to
    TWO tables; the in-query assertion pins that exactly ONE version was
    created for the whole batch, so no reader can ever observe orders
    moved without customers.  The oracle recomputes both tables' final
    states independently."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("mttxn_store")
    orders = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    cust = Catalog(spark, sf_dir).table("customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    publish.publish_tables(
        spark,
        {"orders": orders.filter(F.col("o_orderkey") % 4 == 0),
         "customer": cust.filter(F.col("c_custkey") % 4 == 0)},
        root,
        table_keys={"orders": ["o_orderkey"], "customer": ["c_custkey"]},
    )
    v0 = publish.current_manifest(root)["version"]
    m = publish.merge_many_mor(
        spark, root,
        {
            "orders": {
                "staging": orders.filter(F.col("o_orderkey") % 4 == 2),
                "deletes": orders.filter(F.col("o_orderkey") % 8 == 0),
            },
            "customer": {
                "staging": cust.filter(F.col("c_custkey") % 4 == 2),
                "deletes": cust.filter(F.col("c_custkey") % 8 == 4),
            },
        },
        txn=("import-job", 1),
    )
    if m["version"] != v0 + 1:  # the point: ONE commit for the batch
        raise AssertionError(f"expected one atomic version, got {m['version']}")
    o = publish.read_table(spark, root, "orders").select(
        F.lit("orders").alias("tbl"),
        F.col("o_orderkey").alias("id"),
        F.col("price").alias("val"),
    )
    c = publish.read_table(spark, root, "customer").select(
        F.lit("customer").alias("tbl"),
        F.col("c_custkey").alias("id"),
        F.col("bal").alias("val"),
    )
    return o.unionByName(c)


ORACLE_MULTI_TABLE_TXN = """
SELECT 'orders' AS tbl, o_orderkey AS id, ROUND(o_totalprice, 2) AS val
FROM orders
WHERE (o_orderkey % 4 = 0 OR o_orderkey % 4 = 2) AND o_orderkey % 8 <> 0
UNION ALL
SELECT 'customer' AS tbl, c_custkey AS id, ROUND(c_acctbal, 2) AS val
FROM customer
WHERE (c_custkey % 4 = 0 OR c_custkey % 4 = 2) AND c_custkey % 8 <> 4
"""


def q_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregates (publish.metadata_aggregate — the
    Delta/Iceberg answer-COUNT-from-the-log role): COUNT / MIN / MAX /
    NULL_COUNT served from the stats sidecar with ZERO Spark jobs and
    zero data files opened.  The lifecycle pins the answerability
    boundary: a clean publish answers from metadata; a MoR delta commit
    makes file stats bounds-not-values, so aggregate_table transparently
    falls back to a scan; compact() folds the deltas and metadata answers
    again — and the in-query assertion requires the scan-phase and
    post-compact-metadata answers to be IDENTICAL (same dict), which is
    the correctness claim.  String min/max participate because
    o_orderstatus is provably under the 32-char truncation cap.  At 100 TB
    this is `SELECT COUNT(*)` as a driver-side sum over the manifest
    instead of a thousand-executor scan."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = _scratch_store_root("mdagg_store")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    base = Catalog(spark, sf_dir).table("orders").select(*cols)
    publish.publish_tables(
        spark, {"t": base.filter(F.col("o_orderkey") % 7 == 0).repartition(4)},
        root,
        table_keys={"t": ["o_orderkey"]},
        stats_columns={"t": cols},
    )
    aggs = [
        ("count",),
        ("min", "o_custkey"), ("max", "o_custkey"),
        ("min", "o_totalprice"), ("max", "o_totalprice"),
        ("min", "o_orderstatus"), ("max", "o_orderstatus"),
        ("null_count", "o_orderstatus"),
    ]
    phases = []
    r1, src1 = publish.aggregate_table(spark, root, "t", aggs)
    phases.append(("clean", src1, r1))
    publish.merge_into_mor(
        spark, root, "t", base.filter(F.col("o_orderkey") % 7 == 3)
    )
    r2, src2 = publish.aggregate_table(spark, root, "t", aggs)
    phases.append(("after_mor", src2, r2))
    publish.compact(spark, root, "t")
    r3, src3 = publish.aggregate_table(spark, root, "t", aggs)
    phases.append(("after_compact", src3, r3))
    if (src1, src2, src3) != ("metadata", "scan", "metadata"):
        raise AssertionError(f"wrong answer sources: {(src1, src2, src3)}")
    if r2 != r3:  # the scan and the folded metadata must agree exactly
        raise AssertionError(f"scan/metadata divergence: {r2} vs {r3}")
    rows = [
        (
            phase, src, int(r["count"]),
            int(r["min_o_custkey"]), int(r["max_o_custkey"]),
            float(r["min_o_totalprice"]), float(r["max_o_totalprice"]),
            r["min_o_orderstatus"], r["max_o_orderstatus"],
            int(r["null_count_o_orderstatus"]),
        )
        for phase, src, r in phases
    ]
    return spark.createDataFrame(
        rows,
        "phase string, source string, cnt long, min_ck long, "
        "max_ck long, min_price double, max_price double, "
        "min_st string, max_st string, null_st long",
    )


ORACLE_METADATA_AGG = """
WITH s0 AS (SELECT * FROM orders WHERE o_orderkey % 7 = 0),
     s1 AS (SELECT * FROM orders WHERE o_orderkey % 7 IN (0, 3)),
     a0 AS (
       SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
              MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
              MIN(o_totalprice) AS min_price,
              MAX(o_totalprice) AS max_price,
              MIN(o_orderstatus) AS min_st, MAX(o_orderstatus) AS max_st,
              CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_st
       FROM s0
     ),
     a1 AS (
       SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
              MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
              MIN(o_totalprice) AS min_price,
              MAX(o_totalprice) AS max_price,
              MIN(o_orderstatus) AS min_st, MAX(o_orderstatus) AS max_st,
              CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_st
       FROM s1
     )
SELECT 'clean' AS phase, 'metadata' AS source, * FROM a0
UNION ALL
SELECT 'after_mor' AS phase, 'scan' AS source, * FROM a1
UNION ALL
SELECT 'after_compact' AS phase, 'metadata' AS source, * FROM a1
"""


def q_sql_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL CDC read (round 10, plans/store_sql.py): Delta's
    ``table_changes('t', startVersion [, endVersion])`` table-valued
    function inside SELECT — the piece that lets a SQL-ONLY orchestrator
    build incremental consumers (the Python API's read_changes was the
    only door before).  Lifecycle: seed → CoW UPDATE (v2) → DELETE (v3)
    → keyed INSERT (v4), then ONE SQL statement reads the v2..head feed:
    deletes surface the pre-change row, updates the new row, unchanged
    rows drop.  startVersion maps to read_changes(from_version=start-1)
    — the first commit whose changes are included, exactly Delta's
    contract."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("stc_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base}, root, table_keys={"orders": ["o_orderkey"]}
    )
    s = store_sql(spark, root)
    s.sql("UPDATE orders SET price = price + 10 WHERE o_custkey % 10 = 0")
    s.sql("DELETE FROM orders WHERE o_orderkey % 7 = 0")
    s.sql(
        "INSERT INTO orders "
        "SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, "
        "'N' AS o_orderstatus, CAST(0 AS double) AS price "
        "FROM store_orders WHERE o_orderkey % 11 = 0"
    )
    return s.sql(
        "SELECT o_orderkey, o_custkey, o_orderstatus, price, change_type "
        "FROM table_changes('orders', 2)"
    )


ORACLE_SQL_TABLE_CHANGES = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) AS price
  FROM orders
),
-- v3 deletes: the feed returns the PRE-CHANGE (v1-state) row
deleted AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, price,
         'delete' AS change_type
  FROM base WHERE o_orderkey % 7 = 0
),
-- v2 updates still live at head: the new row
updated AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, price + 10 AS price,
         'update' AS change_type
  FROM base WHERE o_custkey % 10 = 0 AND o_orderkey % 7 <> 0
),
-- v4 inserts (selected from the post-delete state)
inserted AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, CAST(0 AS DOUBLE) AS price,
         'insert' AS change_type
  FROM base WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
)
SELECT * FROM deleted
UNION ALL SELECT * FROM updated
UNION ALL SELECT * FROM inserted
"""


def q_insert_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition/predicate-scoped replace as ONE statement (round 10,
    plans/store_sql.py): ``INSERT OVERWRITE t <select>`` rewrites the
    whole table in one commit (keys/layout carry forward), and ``INSERT
    INTO t REPLACE WHERE <pred> <select>`` atomically deletes the
    predicate's rows and upserts the incoming rows — Delta's
    replaceWhere, the one-statement backfill that previously needed a
    DELETE+MERGE transaction block.  The REPLACE WHERE runs under
    mor=True and must land as an O(matched + incoming) DELTA (asserted
    in-query from the manifest — at 100 TB a scoped backfill must never
    rewrite the base); incoming rows outside the predicate's scope are
    rejected (also asserted)."""
    from dataintegration_ecomprovider_spark.plans import publish
    from dataintegration_ecomprovider_spark.plans.store_sql import store_sql

    root = _scratch_store_root("siow_store")
    base = Catalog(spark, sf_dir).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish.publish_tables(
        spark, {"orders": base}, root, table_keys={"orders": ["o_orderkey"]}
    )
    s = store_sql(spark, root)
    s.sql(
        "INSERT OVERWRITE orders "
        "SELECT o_orderkey, o_custkey, o_orderstatus, price * 2 AS price "
        "FROM store_orders WHERE o_orderkey % 2 = 0"
    )
    s_mor = store_sql(spark, root, mor=True)
    try:
        s_mor.sql(
            "INSERT INTO orders REPLACE WHERE o_custkey % 5 = 0 "
            "SELECT o_orderkey, o_custkey, o_orderstatus, price "
            "FROM store_orders"
        )
        raise AssertionError("out-of-scope REPLACE WHERE must be rejected")
    except ValueError:
        pass
    s_mor.sql(
        "INSERT INTO orders REPLACE WHERE o_custkey % 5 = 0 "
        "SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus, "
        "CAST(7 AS double) AS price "
        "FROM store_orders WHERE o_custkey % 5 = 0 AND o_orderkey % 3 = 0"
    )
    entry = publish.current_manifest(root)["tables"]["orders"]
    if not (isinstance(entry, dict) and entry.get("deltas")):
        raise AssertionError(
            "mor=True REPLACE WHERE must commit a delta, not rewrite "
            f"the base: {entry!r}"
        )
    return publish.read_table(spark, root, "orders")


ORACLE_INSERT_OVERWRITE = """
WITH ow AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         ROUND(o_totalprice, 2) * 2 AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
kept AS (SELECT * FROM ow WHERE o_custkey % 5 <> 0),
repl AS (
  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
         CAST(7 AS DOUBLE) AS price
  FROM ow WHERE o_custkey % 5 = 0 AND o_orderkey % 3 = 0
)
SELECT * FROM kept UNION ALL SELECT * FROM repl
"""


from dataintegration_ecomprovider_spark.plans.registry import QueryDef
from dataintegration_ecomprovider_spark.plans.scratch import (
    scratch_store_root as _scratch_store_root,
)  # noqa: E402

QUERIES = {
    "e18_assortment_rebuild": QueryDef(q_assortment_rebuild, ORACLE_ASSORTMENT_REBUILD),
    "e5_primary_demotion": QueryDef(q_primary_demotion, ORACLE_PRIMARY_DEMOTION),
    "e15_e16_u12_pipeline_run_job": QueryDef(q_pipeline_run_job, ORACLE_PIPELINE_RUN_JOB),
    "u12_pipeline_run_job_bucketed": QueryDef(q_pipeline_run_job_bucketed, ORACLE_PIPELINE_RUN_JOB),
    "u12_version_diff": QueryDef(q_version_diff, ORACLE_VERSION_DIFF),
    # folded: the AND-triple filtered CDC is a special case of the
    # boolean-tree query below, which additionally asserts per-disjunct
    # file skipping (round-10 governance; oracle-checked in pytest)
    "u12_cdc_filtered": QueryDef(
        q_cdc_filtered, ORACLE_CDC_FILTERED,
        folded_into="u12_cdc_filtered_or",
    ),
    "u12_cdc_filtered_or": QueryDef(q_cdc_filtered_or, ORACLE_CDC_FILTERED_OR),
    # folded (round-11 governance): the cross-table consistency snapshot
    # READS is the guarantee u12_multi_table_txn WRITES (one manifest
    # version for N tables); the pin-then-join lifecycle still
    # value-checks in tests/test_retired_fastpaths.py
    "u12_snapshot_join": QueryDef(
        q_snapshot_join, ORACLE_SNAPSHOT_JOIN,
        folded_into="u12_multi_table_txn",
    ),
    "u12_cdc_apply": QueryDef(q_cdc_apply, ORACLE_CDC_APPLY),
    "u12_merge_on_read": QueryDef(q_merge_on_read, ORACLE_MERGE_ON_READ),
    "u12_maintain_store": QueryDef(q_maintain_store, ORACLE_MAINTAIN_STORE),
    "u12_data_skipping_scan": QueryDef(q_data_skipping_scan, ORACLE_DATA_SKIPPING_SCAN),
    "u12_column_mapping": QueryDef(q_column_mapping, ORACLE_COLUMN_MAPPING),
    "u12_partition_evolution": QueryDef(
        q_partition_evolution, ORACLE_PARTITION_EVOLUTION
    ),
    "u12_sql_merge": QueryDef(q_sql_merge, ORACLE_SQL_MERGE),
    "u12_sql_update": QueryDef(q_sql_update, ORACLE_SQL_UPDATE),
    "u12_sql_table_changes": QueryDef(
        q_sql_table_changes, ORACLE_SQL_TABLE_CHANGES
    ),
    "u12_insert_overwrite": QueryDef(
        q_insert_overwrite, ORACLE_INSERT_OVERWRITE
    ),
    "u12_type_widening": QueryDef(q_type_widening, ORACLE_TYPE_WIDENING),
    "u12_sql_transaction": QueryDef(q_sql_transaction, ORACLE_SQL_TRANSACTION),
    "u12_partial_update": QueryDef(q_partial_update, ORACLE_PARTIAL_UPDATE),
    "u12_object_store_commit": QueryDef(
        q_object_store_commit, ORACLE_OBJECT_STORE_COMMIT
    ),
    "u12_constraints_quarantine": QueryDef(
        q_constraints_quarantine, ORACLE_CONSTRAINTS_QUARANTINE
    ),
    # folded: identical lifecycle to u12_constraints_quarantine under
    # the copy-on-write engine flag, same oracle (round-10 governance;
    # CoW/MoR parity still value-checked in pytest)
    "u12_constraints_quarantine_cow": QueryDef(
        q_constraints_quarantine_cow, ORACLE_CONSTRAINTS_QUARANTINE,
        folded_into="u12_constraints_quarantine",
    ),
    "u12_bloom_scan": QueryDef(q_bloom_scan, ORACLE_BLOOM_SCAN),
    # folded (round-11 governance): directory-level partition pruning is
    # the coarse sibling of u12_data_skipping_scan's file-level min/max
    # pruning — same publish→prune-before-read→residual-filter lifecycle;
    # the PartitionFilters plan shape stays pinned in
    # tests/test_store_layout.py and the oracle in retired-fastpaths
    "u12_partitioned_scan": QueryDef(
        q_partitioned_scan, ORACLE_PARTITIONED_SCAN,
        folded_into="u12_data_skipping_scan",
    ),
    "u12_zorder_scan": QueryDef(q_zorder_scan, ORACLE_ZORDER_SCAN),
    "u12_metadata_agg": QueryDef(q_metadata_agg, ORACLE_METADATA_AGG),
    "u12_multi_table_txn": QueryDef(q_multi_table_txn, ORACLE_MULTI_TABLE_TXN),
    # folded (round-11 governance): zero-job per-column profiling reads
    # the same stats sidecar u12_metadata_agg's COUNT/MIN/MAX answers
    # come from — both assert no Spark job ran; oracle retained in
    # tests/test_retired_fastpaths.py
    "u12_profile_table": QueryDef(
        q_profile_table, ORACLE_PROFILE_TABLE,
        folded_into="u12_metadata_agg",
    ),
    "u12_auto_recluster": QueryDef(q_auto_recluster, ORACLE_AUTO_RECLUSTER),
    "u12_store_replicate": QueryDef(q_store_replicate, ORACLE_STORE_REPLICATE),
    # folded (round-10 governance): the SQL-front-end lifecycle below
    # drives the IDENTICAL maintain_aggregate machinery over the same
    # two-version store and shares its oracle — the Python-API twin
    # still value-checks in tests/test_retired_fastpaths.py
    "u12_incremental_aggregate": QueryDef(
        q_incremental_aggregate, ORACLE_INCREMENTAL_AGGREGATE,
        folded_into="u12_sql_matview",
    ),
    "u12_sql_matview": QueryDef(q_sql_matview, ORACLE_INCREMENTAL_AGGREGATE),
    # folded (round-12 governance, funding u12_sql_matview_expr at the
    # 150 = 3×50 cap): the expr lifecycle is the strict superset — same
    # source, same two-version lifecycle, AVG + HAVING included — and
    # this oracle still value-checks every pytest run in
    # tests/test_retired_fastpaths.py
    "u12_sql_matview_avg": QueryDef(
        q_sql_matview_avg, ORACLE_SQL_MATVIEW_AVG,
        folded_into="u12_sql_matview_expr",
    ),
    "u12_sql_matview_expr": QueryDef(
        q_sql_matview_expr, ORACLE_SQL_MATVIEW_EXPR
    ),
    # folded (round-11 governance): the WHERE-scoped aggregate IVM is the
    # same maintain_aggregate machinery u12_sql_matview drives, whose
    # SQL WHERE compiles to the identical boolean-tree skipping algebra
    # (parse_predicate_tree); oracle retained in retired-fastpaths
    "u12_incremental_aggregate_filtered": QueryDef(
        q_incremental_aggregate_filtered, ORACLE_INCREMENTAL_AGGREGATE_FILTERED,
        folded_into="u12_sql_matview",
    ),
    "u12_incremental_distinct": QueryDef(
        q_incremental_distinct, ORACLE_INCREMENTAL_DISTINCT
    ),
    # round-13 note: a mid-build fold (into u12_sql_matview_join) was
    # reverted by the optimization round — the optimization driver
    # re-runs every declared query and treats a disappeared name as a
    # regression, so the Python-API join view stays declared alongside
    # the star rollup that drives the same maintain_join machinery
    "u12_incremental_join": QueryDef(
        q_incremental_join, ORACLE_INCREMENTAL_JOIN
    ),
    "u12_sql_matview_join": QueryDef(
        q_sql_matview_join, ORACLE_SQL_MATVIEW_JOIN
    ),
    "u6_remove_missing_union": QueryDef(q_remove_missing_union, ORACLE_REMOVE_MISSING_UNION),
    "u10_relation_prune_partial": QueryDef(q_relation_prune_partial, ORACLE_RELATION_PRUNE_PARTIAL),
    "e3_adopt_id_by_number": QueryDef(q_adopt_id_by_number, ORACLE_ADOPT_ID_BY_NUMBER),
    "e6_variant_option_explode": QueryDef(q_variant_option_explode, ORACLE_VARIANT_OPTION_EXPLODE),
    "e7_related_resolve_default": QueryDef(q_related_resolve_default, ORACLE_RELATED_RESOLVE_DEFAULT),
    "e8_sorting_inheritance": QueryDef(q_sorting_inheritance, ORACLE_SORTING_INHERITANCE),
    "e10_user_fanout": QueryDef(q_user_fanout, ORACLE_USER_FANOUT),
    "e11_default_injection": QueryDef(q_default_injection, ORACLE_DEFAULT_INJECTION),
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
    "u1_ci_upsert_case_insensitive": QueryDef(
        q_upsert_case_insensitive, ORACLE_UPSERT_CASE_INSENSITIVE
    ),
}
