"""Job-spec serde contract (reference job-XML persistence,
src/EcomProvider.cs:505-507, 706-732): a serialized-and-reloaded job runs
run_job to the IDENTICAL output as the in-memory spec, including
Column-valued conditionals (round-tripped through Expression.sql) and
deactivate flags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.plans import jobspec
from dataintegration_ecomprovider_spark.plans.pipeline import (
    ColumnRule,
    MappingSpec,
    RelationOutput,
    run_job,
)
from tests.conftest import SF_DIR


def _mappings():
    def mapping(cond, status):
        return MappingSpec(
            source_table="orders",
            dest_table="orders",
            columns=(
                ColumnRule("o_orderkey", "o_orderkey"),
                ColumnRule("o_custkey", "o_custkey"),
                ColumnRule("o_orderstatus", script="constant", script_value=status),
                ColumnRule("o_totalprice", "o_totalprice"),
            ),
            conditional=cond,
        )

    return [
        mapping(F.col("o_orderkey") % 2 == 0, "U"),
        mapping(F.col("o_orderkey") % 5 == 0, "V"),
    ]


def _run(spark, mappings, dest_keys):
    cat = Catalog(spark, SF_DIR)
    dest0 = cat.table("orders").filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    state = run_job(cat, {"orders": dest0}, mappings, dest_keys=dest_keys)
    return (
        state["orders"]
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                F.round("o_totalprice", 2).alias("o_totalprice"))
        .toPandas()
        .sort_values(by=["o_orderkey"])
        .reset_index(drop=True)
    )


def test_job_round_trip_runs_identically(spark):
    cat = Catalog(spark, SF_DIR)
    mappings = _mappings()
    dest_keys = {"orders": ["o_orderkey"]}
    text = jobspec.job_to_json(mappings, dest_keys, catalog=cat)
    loaded_mappings, loaded_keys = jobspec.job_from_json(text)
    assert loaded_keys == {"orders": ["o_orderkey"]}
    a = _run(spark, mappings, dest_keys)
    b = _run(spark, loaded_mappings, loaded_keys)
    assert a.equals(b)
    # and the document itself is stable under a second round trip (diffable)
    again = jobspec.job_to_json(loaded_mappings, loaded_keys, catalog=cat)
    assert text == again


def test_deactivate_flags_and_modes_round_trip(spark):
    spec = MappingSpec(
        source_table="part",
        dest_table="part",
        columns=(ColumnRule("p_partkey", "p_partkey", is_key=True),
                 ColumnRule("p_name", "p_name")),
        deactivate_flags={"p_name": F.lit("inactive")},
        insert_new=False,
        remove_missing=True,
        on_duplicate_keys="error",
        case_insensitive_keys=False,
    )
    resolver = Catalog(spark, SF_DIR).table("part")
    loaded = jobspec.mapping_from_dict(jobspec.mapping_to_dict(spec, resolver))
    assert loaded.insert_new is False
    assert loaded.remove_missing is True
    assert loaded.on_duplicate_keys == "error"
    assert loaded.case_insensitive_keys is False
    assert loaded.key_columns() == ("p_partkey",)
    assert set(loaded.deactivate_flags) == {"p_name"}


def test_relation_outputs_need_registry():
    spec = MappingSpec(
        source_table="orders",
        dest_table="orders",
        columns=(ColumnRule("o_orderkey", "o_orderkey", is_key=True),),
        relation_outputs=(
            RelationOutput("rel_t", lambda df: df, ("o_orderkey",)),
        ),
    )
    d = jobspec.mapping_to_dict(spec)
    assert d["relation_outputs"] == ["rel_t"]
    with pytest.raises(KeyError, match="relation_registry"):
        jobspec.mapping_from_dict(d)
    reg = {"rel_t": RelationOutput("rel_t", lambda df: df, ("o_orderkey",))}
    loaded = jobspec.mapping_from_dict(d, reg)
    assert loaded.relation_outputs[0].dest_table == "rel_t"


def test_version_gate():
    with pytest.raises(ValueError, match="format_version"):
        jobspec.job_from_json('{"format_version": 99, "mappings": []}')


# --- property: serde is lossless over the declarative subset --------------
from hypothesis import given, settings, strategies as st

_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1, max_size=12,
)
_rules = st.builds(
    ColumnRule,
    dest=_names,
    source=st.one_of(st.none(), _names),
    script=st.sampled_from(["none", "constant", "append", "prepend", "new_guid"]),
    script_value=st.text(max_size=10),
    is_key=st.booleans(),
)
_specs = st.builds(
    MappingSpec,
    source_table=_names,
    dest_table=_names,
    columns=st.lists(_rules, min_size=1, max_size=6).map(tuple),
    conditional_sql=st.one_of(st.none(), st.just("o_orderkey % 2 = 0")),
    virtual_columns=st.lists(_names, max_size=3).map(tuple),
    insert_new=st.booleans(),
    update_existing=st.booleans(),
    remove_missing=st.booleans(),
    delete_incoming=st.booleans(),
    discard_duplicates=st.booleans(),
    on_duplicate_keys=st.sampled_from(["first_wins", "error", "allow"]),
    case_insensitive_keys=st.booleans(),
)


@settings(max_examples=200, deadline=None)
@given(spec=_specs)
def test_serde_round_trip_is_lossless(spec):
    loaded = jobspec.mapping_from_dict(jobspec.mapping_to_dict(spec))
    assert loaded == spec


def test_save_load_job_file(spark, tmp_path):
    path = str(tmp_path / "job.json")
    mappings = [
        MappingSpec(
            source_table="orders", dest_table="orders",
            columns=(ColumnRule("o_orderkey", "o_orderkey", is_key=True),
                     ColumnRule("o_orderstatus", script="constant", script_value="X")),
            conditional_sql="o_orderkey % 2 = 0",
        )
    ]
    jobspec.save_job(path, mappings, {"orders": ["o_orderkey"]})
    loaded, keys = jobspec.load_job(path)
    assert loaded == mappings
    assert keys == {"orders": ["o_orderkey"]}
