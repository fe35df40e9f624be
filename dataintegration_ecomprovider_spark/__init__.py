"""dataintegration_ecomprovider_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference provider (dynamicweb/DataIntegration.EcomProvider, studied at
/root/reference), re-expressed Spark-first:

- the reference's generated-SQL read surface (projected scans, multi-way
  joins, correlated string-aggregation, PIVOT) becomes declarative DataFrame
  expression trees that Catalyst optimizes (pushdown, pruning, broadcast);
- the reference's staged bulk-load -> upsert -> delete-missing -> cleanup
  write pipeline becomes a set-based merge algebra over staged DataFrames;
- the per-row entity-resolution handlers become joins/explodes/windows;
- net-new large-scale training-data operators (dedup, similarity search,
  multimodal columns, text analysis) live in `llm/`.

Design notes for 100 TB scale are in each module's docstring: broadcast the
small dimensions, pre-aggregate before joining (never correlated per-row
work), keep everything inside whole-stage codegen, and use AQE for skew.
"""

__version__ = "0.1.0"

from dataintegration_ecomprovider_spark.session import get_spark  # noqa: F401
from dataintegration_ecomprovider_spark.catalog import Catalog  # noqa: F401
