"""Explicit skew handling (SURVEY §4 custom-work item 1; north_rule:
"skew handled by salting hot conversations and AQE-managed shuffles").

AQE's skew-join splitting covers joins; these utilities cover the cases
AQE cannot touch:

* :func:`top_hot_keys` — the heavy-hitter pre-pass (one cheap groupBy).
* :func:`salted_count` / :func:`salted_agg` — two-phase aggregation:
  phase 1 groups on (key, salt) so a hot key's rows spread over ``buckets``
  reducers, phase 2 re-aggregates the partials. Worth it when a single
  key's group would otherwise exceed one reducer's memory (e.g. counting
  statements per hot conversation at 10¹²-turn scale).
* :func:`replicate_broadcast_side` — for salted broadcast joins: the small
  side is cross-joined with the salt domain so every salted probe finds
  its row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_hot_keys(df: DataFrame, key: str, min_count: int) -> list:
    """Keys whose row count exceeds ``min_count`` (driver-collected: the
    heavy-hitter set is small by definition)."""
    rows = (
        df.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > min_count)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def auto_hot_keys(
    df: DataFrame,
    key: str,
    factor: float = 2.0,
    floor: int = 1000,
    sample_fraction: float = 1.0,
) -> list:
    """Heavy hitters relative to the session's reducer target: a key is hot
    when its row count exceeds ``factor × (total rows / shuffle partitions)``
    — i.e. that key alone would overfill one reducer — and at least
    ``floor`` rows (tiny inputs have no skew worth a pre-pass).

    This is the data-derived default for north_rule's "salting beyond AQE":
    callers don't hand-tune a count, the threshold tracks the shuffle
    layout. One map-side-combinable groupBy (over a ``sample_fraction``
    sample when the exact pre-pass is too expensive — skew detection only
    needs keys ~factor× above the mean, well inside sampling error)."""
    src = df if sample_fraction >= 1.0 else df.sample(fraction=sample_fraction, seed=42)
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    counts = src.groupBy(key).agg(F.count("*").alias("_n")).persist()
    try:
        total = counts.agg(F.sum("_n")).collect()[0][0] or 0
        thresh = max(int(factor * total / max(parts, 1)), int(floor * sample_fraction))
        return [r[0] for r in counts.filter(F.col("_n") > thresh).select(key).collect()]
    finally:
        counts.unpersist()


def with_salt(
    df: DataFrame, key: str, hot_keys: list, buckets: int = 16, salt_col: str = "_salt"
) -> DataFrame:
    """Add a salt column: 0 for cold keys; hash-spread 0..buckets-1 for hot
    keys (deterministic per row via xxhash64 over all columns)."""
    if not hot_keys:
        return df.withColumn(salt_col, F.lit(0))
    is_hot = F.col(key).isin(*hot_keys)
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(
        salt_col, F.when(is_hot, F.pmod(row_hash, F.lit(buckets))).otherwise(F.lit(0)).cast("int")
    )


def salted_count(
    df: DataFrame, key: str, hot_min_count: int = 1_000_000, buckets: int = 16
) -> DataFrame:
    """groupBy(key).count() with two-phase aggregation for hot keys.

    (For plain counts Spark's map-side partial aggregation already defuses
    skew; this exists for the general ``salted_agg`` pattern and as the
    documented recipe.)"""
    return salted_agg(
        df, key, {"n": F.count("*")}, {"n": F.sum("n")}, hot_min_count, buckets
    )


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: dict,
    merge_aggs: dict,
    hot_min_count: int = 1_000_000,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: name → agg expr over raw rows (phase 1, keyed by
    (key, salt)); ``merge_aggs``: name → agg expr over phase-1 partials
    (phase 2, keyed by key). The two must compose (sum/sum, count/sum,
    min/min, max/max, collect_list/flatten...).
    """
    hot = top_hot_keys(df, key, hot_min_count)
    salted = with_salt(df, key, hot, buckets)
    phase1 = salted.groupBy(key, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(key).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )


def replicate_broadcast_side(
    small: DataFrame, buckets: int = 16, salt_col: str = "_salt"
) -> DataFrame:
    """Cross the broadcast side with the salt domain 0..buckets-1 so a
    salted equi-join ``on [key, _salt]`` finds every row."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    return small.withColumn(salt_col, salts)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    hot_keys: list | None = None,
    hot_min_count: int = 1_000_000,
    buckets: int = 16,
) -> DataFrame:
    """Equi-join with explicit hot-key salting (beyond AQE's skew split).

    Heavy hitters of ``left[on]`` (pre-pass unless ``hot_keys`` is given)
    get their left rows hash-spread over ``buckets`` salt values while ONLY
    the matching right rows are replicated across the salt domain — cold
    keys join on salt 0 with no replication, so the extra right-side volume
    is |hot right rows|·buckets, not |right|·buckets. Row-identical to
    ``left.join(right, on, how)`` for inner and left joins.

    Use when one probe-side key concentrates enough rows that even a split
    shuffle partition would straggle (e.g. hub entities in the 2-hop
    existential join, north_rule's "salting hot conversations").
    """
    if hot_keys is None:
        hot_keys = top_hot_keys(left, on, hot_min_count)
    if not hot_keys:
        return left.join(right, on, how)
    lhs = with_salt(left, on, hot_keys, buckets)
    r_cold = right.filter(~F.col(on).isin(*hot_keys)).withColumn("_salt", F.lit(0))
    r_hot = replicate_broadcast_side(right.filter(F.col(on).isin(*hot_keys)), buckets)
    return lhs.join(r_cold.unionByName(r_hot), [on, "_salt"], how).drop("_salt")
