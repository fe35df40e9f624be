"""Job-spec persistence — serialize/load a whole pipeline definition.

The reference round-trips its entire job through XML: the discovered
schema plus every mapping with column mappings, key flags and conditionals
(SaveAsXml, reference src/EcomProvider.cs:706-732; reload `new
Schema(node)` :505-507) — a job is DATA that can be stored, diffed and
shipped.  This module is the Spark engine's analog with JSON: MappingSpec
and ColumnRule become a versioned JSON document.  Column-valued
conditionals and flags serialize through their ANALYZED SQL form — the
expression is resolved against the mapping's source table (the same
schema binding the reference's job XML embeds) and rendered with
Catalyst's Expression.sql, so the reloaded spec parses back to the same
plan via F.expr.

Not serialized, by design:
- ``relation_outputs`` — their ``derive`` members are Python callables.
  In the reference the relation derivations are compiled provider code,
  not job XML; likewise here they re-attach at load time via the
  ``relation_registry`` argument (name → RelationOutput).
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans.pipeline import (
    ColumnRule,
    MappingSpec,
    RelationOutput,
)

FORMAT_VERSION = 1


def _column_sql(col: Column, resolver: DataFrame | None) -> str:
    """Persistable SQL text of a Column expression: resolve it against
    `resolver` (the mapping's source table) and render the analyzed
    expression with Expression.sql; F.expr() re-parses it on load.  The
    schema binding is the same commitment the reference makes when its
    job XML embeds the discovered schema (src/EcomProvider.cs:706-732)."""
    if resolver is None:
        raise ValueError(
            "serializing a Column-valued conditional/flag needs the source "
            "table to resolve against — pass catalog= to job_to_json / "
            "resolver= to mapping_to_dict, or use conditional_sql"
        )
    try:
        alias = resolver.select(col.alias("__c"))
        expr = alias._jdf.queryExecution().analyzed().expressions().apply(0)
        return expr.child().sql()
    except Exception as exc:
        raise ValueError(
            "conditional/flag Column cannot be rendered to SQL for "
            "serialization — express it with conditional_sql / an expr() "
            f"string instead ({exc})"
        ) from None


def rule_to_dict(rule: ColumnRule) -> dict:
    return {
        "dest": rule.dest,
        "source": rule.source,
        "script": rule.script,
        "script_value": rule.script_value,
        "is_key": rule.is_key,
    }


def rule_from_dict(d: Mapping) -> ColumnRule:
    return ColumnRule(
        dest=d["dest"],
        source=d.get("source"),
        script=d.get("script", "none"),
        script_value=d.get("script_value", ""),
        is_key=bool(d.get("is_key", False)),
    )


def mapping_to_dict(spec: MappingSpec, resolver: DataFrame | None = None) -> dict:
    if spec.relation_outputs:
        rel = [r.dest_table for r in spec.relation_outputs]
    else:
        rel = []
    return {
        "source_table": spec.source_table,
        "dest_table": spec.dest_table,
        "columns": [rule_to_dict(r) for r in spec.columns],
        "conditional": (
            _column_sql(spec.conditional, resolver)
            if spec.conditional is not None
            else None
        ),
        "conditional_sql": spec.conditional_sql,
        "virtual_columns": list(spec.virtual_columns),
        "insert_new": spec.insert_new,
        "update_existing": spec.update_existing,
        "remove_missing": spec.remove_missing,
        "delete_incoming": spec.delete_incoming,
        "discard_duplicates": spec.discard_duplicates,
        "deactivate_flags": (
            {k: _column_sql(v, resolver) for k, v in spec.deactivate_flags.items()}
            if spec.deactivate_flags
            else None
        ),
        "relation_outputs": rel,
        "on_duplicate_keys": spec.on_duplicate_keys,
        "case_insensitive_keys": spec.case_insensitive_keys,
    }


def mapping_from_dict(
    d: Mapping,
    relation_registry: Mapping[str, RelationOutput] | None = None,
) -> MappingSpec:
    rel_names = d.get("relation_outputs") or []
    rels: list[RelationOutput] = []
    for name in rel_names:
        if not relation_registry or name not in relation_registry:
            raise KeyError(
                f"mapping references relation output {name!r}; pass it in "
                "relation_registry (derivations are code, not job data)"
            )
        rels.append(relation_registry[name])
    flags = d.get("deactivate_flags")
    return MappingSpec(
        source_table=d["source_table"],
        dest_table=d["dest_table"],
        columns=tuple(rule_from_dict(r) for r in d["columns"]),
        conditional=(
            F.expr(d["conditional"]) if d.get("conditional") is not None else None
        ),
        conditional_sql=d.get("conditional_sql"),
        virtual_columns=tuple(d.get("virtual_columns", ())),
        insert_new=bool(d.get("insert_new", True)),
        update_existing=bool(d.get("update_existing", True)),
        remove_missing=bool(d.get("remove_missing", False)),
        delete_incoming=bool(d.get("delete_incoming", False)),
        discard_duplicates=bool(d.get("discard_duplicates", False)),
        deactivate_flags=(
            {k: F.expr(v) for k, v in flags.items()} if flags else None
        ),
        relation_outputs=tuple(rels),
        on_duplicate_keys=d.get("on_duplicate_keys", "first_wins"),
        case_insensitive_keys=bool(d.get("case_insensitive_keys", True)),
    )


def job_to_json(
    mappings: Sequence[MappingSpec],
    dest_keys: Mapping[str, Sequence[str]] | None = None,
    catalog=None,
    indent: int | None = 2,
) -> str:
    """One JSON document = one job definition (the reference's job XML:
    mappings + key metadata, src/EcomProvider.cs:706-732).  `catalog`
    (plans.pipeline's Catalog) is needed only when a mapping carries a
    Column-valued conditional/flag — the expression resolves against the
    mapping's source table before rendering to SQL."""
    doc = {
        "format_version": FORMAT_VERSION,
        "dest_keys": {t: list(ks) for t, ks in (dest_keys or {}).items()},
        "mappings": [
            mapping_to_dict(
                m, catalog.table(m.source_table) if catalog is not None else None
            )
            for m in mappings
        ],
    }
    return json.dumps(doc, indent=indent)


def job_from_json(
    text: str,
    relation_registry: Mapping[str, RelationOutput] | None = None,
) -> tuple[list[MappingSpec], dict[str, list[str]]]:
    """Inverse of job_to_json; returns (mappings, dest_keys) ready for
    run_job."""
    doc = json.loads(text)
    version = doc.get("format_version")
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported job-spec format_version {version!r}")
    mappings = [
        mapping_from_dict(m, relation_registry) for m in doc.get("mappings", [])
    ]
    dest_keys = {t: list(ks) for t, ks in doc.get("dest_keys", {}).items()}
    return mappings, dest_keys


def save_job(
    path: str,
    mappings: Sequence[MappingSpec],
    dest_keys: Mapping[str, Sequence[str]] | None = None,
    catalog=None,
) -> None:
    """Persist a job definition to a file (the reference persists jobs as
    XML files the UI reloads, src/EcomProvider.cs:706-732)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(job_to_json(mappings, dest_keys, catalog=catalog))


def load_job(
    path: str,
    relation_registry: Mapping[str, RelationOutput] | None = None,
) -> tuple[list[MappingSpec], dict[str, list[str]]]:
    with open(path, encoding="utf-8") as fh:
        return job_from_json(fh.read(), relation_registry)
