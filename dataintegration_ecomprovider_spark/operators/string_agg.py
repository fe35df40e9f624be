"""Order-preserving grouped string aggregation (reference A1/A2).

The reference emits, per parent row, a correlated subquery
``STUFF((SELECT ',"'+X+'"' ... ORDER BY ... FOR XML PATH('')),1,1,'')`` —
8 instances building the Groups / Shops / ParentGroups / VariantGroups /
RelatedProducts list columns (src/EcomSourceReader.cs:336-352, :393-446),
sometimes over DISTINCT child values (src/EcomSourceReader.cs:434-435).

Spark-first shape: NEVER correlated per-row — pre-aggregate the child table
once with collect_list over a (sort_key, value) struct, sort_array for a
deterministic order, then hash-join the aggregate back to the parent.
At 100 TB this is one shuffle on the parent key with map-side partial
aggregation; the correlated form would be O(parents) subquery executions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.functions.lists import encode_quoted_list


def collect_ordered(value: Column, order_by: Sequence[Column], distinct: bool = False) -> Column:
    """Aggregate expression: array of `value` ordered by `order_by`.

    Deterministic regardless of shuffle order because the sort happens
    after collection (sort_array over structs sorts lexicographically on
    (order keys..., value)).
    """
    struct = F.struct(*order_by, value.alias("__v"))
    arr = F.sort_array(F.collect_list(struct))
    out = F.transform(arr, lambda s: s["__v"])
    if distinct:
        out = F.array_distinct(out)
    return out


def grouped_string_agg(
    child: DataFrame,
    group_keys: Sequence[str],
    value: Column,
    order_by: Sequence[Column],
    out_name: str,
    distinct: bool = False,
    quoted: bool = True,
) -> DataFrame:
    """child -> one row per group_keys with `out_name` = '"v1","v2"' string.

    `quoted=False` yields a plain comma-joined list (used by the sorting
    columns, e.g. ShopSorting at src/EcomSourceReader.cs:346-352, which are
    parallel to the quoted value columns).
    """
    arr = collect_ordered(value, order_by, distinct=distinct)
    encoded = encode_quoted_list(arr) if quoted else F.concat_ws(",", arr)
    return child.groupBy(*group_keys).agg(encoded.alias(out_name))
