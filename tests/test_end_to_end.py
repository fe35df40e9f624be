"""End-to-end reference-job flow (SURVEY §3.1): dimension + product
mappings normalized and ordered (E15/E16), shaped (P2/P7), relation rows
derived and swapped (E5→U9), merged (U1-U3), published atomically (U12),
and idempotent under re-run — the reference's whole RunJob in one test."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.operators.explode import explode_membership
from dataintegration_ecomprovider_spark.plans import publish
from dataintegration_ecomprovider_spark.plans.pipeline import (
    ColumnRule, MappingSpec, RelationOutput, run_job,
)
from tests.conftest import SF_DIR


def _job_mappings():
    dim_mapping = MappingSpec(
        source_table="nation",
        dest_table="nation",
        columns=(
            ColumnRule("n_nationkey", "n_nationkey", is_key=True),
            ColumnRule("n_name", "n_name"),
        ),
    )

    def derive_groups(staged):
        return explode_membership(staged, ["product_id"], "groups", "member").select(
            "product_id", "member", F.col("pos").cast("int").alias("pos")
        )

    product_mapping = MappingSpec(
        source_table="part",
        dest_table="products",
        columns=(
            ColumnRule("product_id", "p_partkey", is_key=True),
            ColumnRule("product_name", "p_name", script="prepend", script_value="N:"),
            ColumnRule("groups", "p_brand"),
        ),
        conditional=F.col("p_size") < 30,
        virtual_columns=("groups",),
        relation_outputs=(
            RelationOutput("product_groups", derive_groups, ("product_id",)),
        ),
    )
    # deliberately out of order: run_job must put the dimension first (E15)
    return [product_mapping, dim_mapping]


def test_full_job_publish_and_idempotent_rerun(spark, tmp_path):
    root = str(tmp_path / "store")
    cat = Catalog(spark, SF_DIR)

    # initial destination state, committed as v1
    dest0 = {
        "nation": cat.table("nation").select("n_nationkey", "n_name").limit(10),
        "products": cat.table("part").select(
            F.col("p_partkey").alias("product_id"),
            F.concat(F.lit("OLD:"), F.col("p_name")).alias("product_name"),
        ),
        "product_groups": spark.createDataFrame(
            [(1, "STALE", 0)], "product_id bigint, member string, pos int"
        ),
    }
    publish.publish_tables(spark, dest0, root)

    def run_once():
        current = {
            name: publish.read_table(spark, root, name)
            for name in ("nation", "products", "product_groups")
        }
        state = run_job(
            cat, current, _job_mappings(),
            dest_keys={"nation": ["n_nationkey"], "products": ["product_id"]},
        )
        return publish.publish_tables(spark, state, root)

    m2 = run_once()
    assert m2["version"] == 2

    products = publish.read_table(spark, root, "products")
    staged_keys = {
        r.p_partkey for r in cat.table("part").filter(F.col("p_size") < 30)
        .select("p_partkey").collect()
    }
    for r in products.collect():
        if r.product_id in staged_keys:
            assert r.product_name.startswith("N:")   # P7 prepend applied
        else:
            assert r.product_name.startswith("OLD:")  # untouched rows survive
    assert "groups" not in products.columns           # E17

    groups_rel = publish.read_table(spark, root, "product_groups")
    members = {r.product_id: r.member for r in groups_rel.collect()}
    for pid in staged_keys:
        assert members[pid].startswith("Brand#")      # E5 explode landed
    # nation dim grew to the full dimension via the U2 insert leg (E15 ran it)
    assert publish.read_table(spark, root, "nation").count() == cat.table("nation").count()

    # idempotence across the published store: run the identical job again
    m3 = run_once()
    assert m3["version"] == 3
    v2 = publish.read_table_at(spark, root, "products", 2)
    v3 = publish.read_table(spark, root, "products")
    assert v3.exceptAll(v2).count() == 0 and v2.exceptAll(v3).count() == 0
    g2 = publish.read_table_at(spark, root, "product_groups", 2)
    g3 = publish.read_table(spark, root, "product_groups")
    assert g3.exceptAll(g2).count() == 0 and g2.exceptAll(g3).count() == 0


def test_full_job_bucketed_lifecycle_matches_default(spark, tmp_path):
    """Round-3 composition: bucketed publish -> run_job with bucketed
    staging (dest layout reused via dest_bucketed, relation outputs
    crossing a bucket-staged destination) -> bucketed republish ->
    vacuum -> staging cleanup.  The whole lifecycle must be row-identical
    to the default (unbucketed) pipeline."""
    from dataintegration_ecomprovider_spark.operators.bucketing import (
        drop_staging_tables,
    )

    root = str(tmp_path / "store")
    cat = Catalog(spark, SF_DIR)
    dest0 = {
        "nation": cat.table("nation").select("n_nationkey", "n_name").limit(10),
        "products": cat.table("part").select(
            F.col("p_partkey").alias("product_id"),
            F.concat(F.lit("OLD:"), F.col("p_name")).alias("product_name"),
        ),
        "product_groups": spark.createDataFrame(
            [(1, "STALE", 0)], "product_id bigint, member string, pos int"
        ),
    }
    publish.publish_tables(
        spark, dest0, root,
        bucket_keys={"nation": ["n_nationkey"], "products": ["product_id"]},
        num_buckets=8,
    )

    current = {
        name: publish.read_table(spark, root, name)
        for name in ("nation", "products", "product_groups")
    }
    keys = {"nation": ["n_nationkey"], "products": ["product_id"]}
    bucketed_state = run_job(
        cat, current, _job_mappings(), dest_keys=keys,
        bucketed_staging=True, staging_buckets=8,
        staging_prefix="e2e_bq", dest_bucketed=("nation", "products"),
    )
    manifest = publish.publish_tables(
        spark, bucketed_state, root,
        bucket_keys={"nation": ["n_nationkey"], "products": ["product_id"]},
        num_buckets=8,
    )
    assert manifest["version"] == 2

    # reference result: the same job through the default path
    default_state = run_job(cat, dest0, _job_mappings(), dest_keys=keys)
    for name in ("nation", "products", "product_groups"):
        got = publish.read_table(spark, root, name)
        want = default_state[name]
        assert got.count() == want.count(), name
        assert got.exceptAll(want).count() == 0, name
        assert want.exceptAll(got).count() == 0, name

    publish.vacuum(spark, root, keep_versions=1)
    assert publish.current_manifest(root)["history"] == []
    assert publish.read_table(spark, root, "products").count() > 0
    assert drop_staging_tables(spark, "e2e_bq") > 0
