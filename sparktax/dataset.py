"""Typed entity samples (reference ``Dataset``, libs/dataset/dataset.py:12-36,
creation at libs/dataset/_creation.py).

A dataset is a pair of DataFrames:
  dataset(sample_id, entity_id, class_id) + classes(class_id, class_name).

All sampling is seeded (``xxhash64(id, seed)`` order) — the reference uses
unseeded ``random.sample`` (SURVEY §2.12); we need reproducibility for the
oracle tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sparktax.graph.kg import KnowledgeGraph


def _attach_sample_ids(df: DataFrame) -> DataFrame:
    w = Window.orderBy("class_id", "entity_id")
    return df.select(
        (F.row_number().over(w) - 1).cast("long").alias("sample_id"),
        "entity_id",
        "class_id",
    )


def create_from_classes(
    kg: KnowledgeGraph,
    classes: list[str | int],
    class_size: int | list[int] = 100,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Stratified sample: ``class_size`` entities per listed class, sampled
    sequentially with already-picked entities excluded (reference
    create_from_classes semantics, libs/dataset/_creation.py:8-30).

    Returns (dataset, classes) DataFrames; class_id = position in
    ``classes``.
    """
    sizes = [class_size] * len(classes) if isinstance(class_size, int) else class_size
    if len(sizes) != len(classes):
        raise ValueError("class_size list must match classes")
    spark = kg.triples.sparkSession
    picked: DataFrame | None = None
    parts = []
    rows = []
    for class_id, (cls, n) in enumerate(zip(classes, sizes)):
        cls_id = kg._coerce(cls, "t")
        rows.append((class_id, str(cls)))
        pool = kg.instances_of_type(cls_id)
        if picked is not None:
            pool = pool.join(picked, "h", "left_anti")
        sample = (
            pool.orderBy(F.xxhash64(F.col("h"), F.lit(seed + class_id)))
            .limit(n)
            .select("h")
            .localCheckpoint()
        )
        picked = sample if picked is None else picked.union(sample).localCheckpoint()
        parts.append(
            sample.select(
                F.col("h").alias("entity_id"), F.lit(class_id).cast("int").alias("class_id")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    classes_df = spark.createDataFrame(rows, "class_id int, class_name string")
    return _attach_sample_ids(out), classes_df


def create_from_instances(
    kg: KnowledgeGraph,
    instances: DataFrame,
    valid_types: DataFrame | None = None,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Label each instance with ONE of its valid types, picked
    deterministically-at-random (reference create_from_instances,
    libs/dataset/_creation.py:32-61 uses unseeded random.sample; here the
    pick is min ``xxhash64(type, seed)`` per entity). Untyped instances are
    dropped.

    ``instances``: one column ``h``. ``valid_types``: one column ``id``
    (defaults to :meth:`KnowledgeGraph.valid_type_ids`).
    """
    chosen = choose_instance_types(kg, instances, valid_types, seed)
    classes_df = classes_from_chosen(chosen, kg.entities)
    return (
        dataset_from_chosen(chosen, classes_df),
        classes_df.select("class_id", "class_name"),
    )


def choose_instance_types(
    kg: KnowledgeGraph,
    instances: DataFrame,
    valid_types: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """(h, t) — each instance's single deterministically-random valid type
    (the expensive half of dataset creation: typed-triples semi-joins + a
    per-entity window). Split out so a checkpointed pipeline materializes
    it ONCE and derives both the dataset and the class map from the stored
    result (round-2 verdict item #4)."""
    if valid_types is None:
        valid_types = kg.valid_type_ids()
    typed = (
        kg.triples.filter(F.col("r") == kg.isa)
        .join(instances.select("h"), "h", "left_semi")
        .join(broadcast(valid_types.withColumnRenamed("id", "t")), "t", "left_semi")
        .select("h", "t")
        .distinct()
    )
    w = Window.partitionBy("h").orderBy(F.xxhash64(F.col("t"), F.lit(seed)))
    return (
        typed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("h", "t")
    )


def classes_from_chosen(chosen: DataFrame, entities: DataFrame) -> DataFrame:
    """(class_id, class_name, t) — dense class ids over the chosen types,
    named via the entity dictionary. Cheap relative to ``chosen``."""
    type_ids = chosen.select("t").distinct()
    wt = Window.orderBy("t")
    return (
        type_ids.select(
            (F.row_number().over(wt) - 1).cast("int").alias("class_id"),
            F.col("t"),
        )
        .join(broadcast(entities.withColumnRenamed("id", "t")), "t")
        .select("class_id", F.col("uri").alias("class_name"), "t")
    )


def dataset_from_chosen(
    chosen: DataFrame,
    classes_df: DataFrame,
    per_class: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(sample_id, entity_id, class_id) from the chosen (h, t) pairs and
    the (class_id, ..., t) class map.

    ``per_class`` caps each class to a seeded uniform sample (window rank
    on ``xxhash64(h, seed)``). The downstream single-task HAC is O(n²)
    memory in the dataset size — an uncapped corpus that types millions
    of entities would ask for a ~200 GiB distance matrix (observed on the
    100M-triple probe), while the reference's own design is
    sample-bounded (P10). ``None`` keeps every typed instance."""
    ds = chosen.join(broadcast(classes_df.select("class_id", "t")), "t").select(
        F.col("h").alias("entity_id"), "class_id"
    )
    if per_class is not None:
        w = Window.partitionBy("class_id").orderBy(
            F.xxhash64(F.col("entity_id"), F.lit(seed)), F.col("entity_id")
        )
        ds = (
            ds.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= per_class)
            .drop("_rk")
        )
    return _attach_sample_ids(ds)


def class_counts(dataset: DataFrame) -> DataFrame:
    """(class_id, n) — reference Dataset.class_count
    (libs/dataset/dataset.py:101-103)."""
    return dataset.groupBy("class_id").agg(F.count("*").alias("n"))


def class_instances(dataset: DataFrame) -> DataFrame:
    """(class_id, entity_ids) — reference class_instances
    (libs/dataset/dataset.py:105-111)."""
    return dataset.groupBy("class_id").agg(
        # array_sort: collect_set order is task-arrival-dependent; sorted
        # arrays make the "set" reproducible across runs
        F.array_sort(F.collect_set("entity_id")).alias("entity_ids")
    )
