"""Iceberg-or-parquet storage shim (SURVEY §7: "sandbox has no Iceberg
runtime jar; cluster deployments flip one config").

The engine's table layout is identical either way; what changes is the
writer API:

* **Iceberg** (``spark.sql.catalog.<name>`` configured, e.g.
  ``org.apache.iceberg.spark.SparkCatalog``): ``df.writeTo(ident)
  .partitionedBy(...).createOrReplace()`` — snapshot-isolated, gives the
  checkpoint stages time-travel for free.
* **parquet fallback** (this sandbox): ``df.write.parquet(path)`` with the
  same partitioning.

``table_identifier`` values look like ``catalog.db.table``; anything
containing a ``/`` is treated as a filesystem path → parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:  # unset key raises in Spark 4.1 classic
        return False
    return impl is not None and "iceberg" in (impl or "").lower()


def write_table(
    df: DataFrame,
    target: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to an Iceberg table identifier or a parquet path."""
    spark = df.sparkSession
    is_path = "/" in target
    if not is_path and iceberg_available(spark, target.split(".")[0]):
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read an Iceberg table identifier or a parquet path."""
    if "/" in target:
        return spark.read.parquet(target)
    return spark.read.table(target)
