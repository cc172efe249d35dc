"""As-of join — for each left row, the most recent right row at or before
its timestamp within the same key. Spark has no native ASOF JOIN; the
range-join formulation explodes (every left row × every earlier right
row), so this implements the union + window forward-fill plan:

    tag right rows, union both sides, ONE window
    ``last(right_payload, ignorenulls) OVER (PARTITION BY key
    ORDER BY ts, side)`` — a single shuffle on (key), no row explosion,
    sort-spill-safe on hot keys.

Oracle: DuckDB's native ``ASOF JOIN`` reproduces it exactly (both engines
use inclusive ``right.ts <= left.ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the columns of the latest
    ``right`` row with ``right[right_ts] <= left[left_ts]`` and the same
    ``on`` key (nulls when no such row exists).

    Ties: a right row at exactly the left timestamp matches (inclusive);
    among right rows sharing (key, ts) the caller should pre-dedupe — the
    window keeps the last in (ts, side) order, which is deterministic only
    if (key, ts) is unique on the right.
    """
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in rcols]
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        *[F.lit(None).cast(f.dataType).alias(f"_l_{f.name}") for f in left.schema],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(f.name).alias(f"_l_{f.name}") for f in left.schema],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_match", F.last("_p", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_l_{f.name}").alias(f.name) for f in left.schema]
    out_cols += [
        F.col("_match").getField(c).alias(c + suffix if c in left.columns else c)
        for c in rcols
    ]
    out_cols.append(F.col("_match").getField("_ts").alias(right_ts + suffix))
    return merged.filter(F.col("_side") == 1).select(*out_cols)
