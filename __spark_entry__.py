"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(names carry the operator ids); ``oracle_sql()`` gives the DuckDB-equivalent
SQL. Implementations live in ``dataintegration_ecomprovider_spark``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.operators import export_views
from dataintegration_ecomprovider_spark.plans.registry import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the EcomProducts export view (SURVEY.md §7 phase 0 —
    scan + broadcast dim join + order-preserving string-agg + top-1-per-group)
    on /root/testdata/sf0.001."""
    return export_views.products_export_view(Catalog(spark, _SMOKE_SF_DIR))


def _q_products_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    return export_views.products_export_view(Catalog(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {"products_export_j4_p6_a1_a8": _q_products_export}
    for name, qd in all_queries().items():
        out[name] = qd.fn
    return out


def oracle_sql() -> dict[str, str]:
    out = {"products_export_j4_p6_a1_a8": export_views.products_export_oracle()}
    for name, qd in all_queries().items():
        if qd.oracle is not None:
            out[name] = qd.oracle
    return out
