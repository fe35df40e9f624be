"""Progress / row-count metrics (A7) — observation-based, zero extra jobs.

The reference counts rows as it writes (RowsToWriteCount logging every
10,000 rows, src/EcomDestinationWriter.cs:1196-1204) and accumulates
rows-affected from each statement (:3322-3327).  Running `df.count()` for
that would double-scan; Spark's `DataFrame.observe` attaches aggregate
metrics to the SAME pass that executes the query — the counters ride the
action for free and arrive via the observation handle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_row_metrics(
    df: DataFrame,
    *extra: Column,
) -> tuple[DataFrame, Observation]:
    """Attach (rows_seen + any extra aggregate metrics) to df's execution.

    Returns (instrumented_df, observation); read `observation.get` AFTER an
    action has run the plan.  Example:

        out, obs = with_row_metrics(staged, F.sum("qty").alias("total_qty"))
        out.write.parquet(path)
        log(obs.get["rows_seen"], obs.get["total_qty"])
    """
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("rows_seen"), *extra]
    return df.observe(obs, *metrics), obs
