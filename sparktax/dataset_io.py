"""Reference-format Dataset IO: the text files the reference repo ships
(`cluster.indices`, `cluster.labels`, `name_to_index`, `axioms` —
reference libs/dataset/io.py:4-126), so artifacts like
``data/dataset/toy`` load directly into the Spark-native Dataset shape
(dataset(sample_id, entity_id, class_id) + classes(class_id, class_name)).

These files are driver-side by design — a dataset is a *sample*
(thousands of rows), not the KG. The parquet pair in
:mod:`sparktax.dataset` remains the native format; this module is the
compatibility bridge in both directions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

INDICES_FILE = "cluster.indices"
LABELS_FILE = "cluster.labels"
NAMES_FILE = "name_to_index"
AXIOMS_FILE = "axioms"


# ------------------------------------------------------------------ raw files
def load_instances(dirname: str) -> tuple[list[int], list[int]]:
    """(indices, labels) from cluster.indices / cluster.labels — one int
    per line (reference io.py:13-27)."""
    with open(os.path.join(dirname, INDICES_FILE)) as fi:
        indices = [int(line.rstrip()) for line in fi]
    with open(os.path.join(dirname, LABELS_FILE)) as fl:
        labels = [int(line.rstrip()) for line in fl]
    return indices, labels


def save_instances(indices: list[int], labels: list[int], dirname: str) -> None:
    with open(os.path.join(dirname, INDICES_FILE), "w") as fi:
        fi.writelines(f"{i}\n" for i in indices)
    with open(os.path.join(dirname, LABELS_FILE), "w") as fl:
        fl.writelines(f"{l}\n" for l in labels)


def load_classes(dirname: str) -> tuple[dict[str, int], dict[int, str]]:
    """name_to_index → (name→id, id→name); one 'Name id' pair per line
    (reference io.py:43-58)."""
    name2cls: dict[str, int] = {}
    cls2name: dict[int, str] = {}
    with open(os.path.join(dirname, NAMES_FILE)) as f:
        for line in f:
            name, cls = line.split()
            name2cls[name] = int(cls)
            cls2name[int(cls)] = name
    return name2cls, cls2name


def save_classes(name2cls: dict[str, int], dirname: str) -> None:
    with open(os.path.join(dirname, NAMES_FILE), "w") as f:
        f.writelines(f"{name} {label}\n" for name, label in name2cls.items())


def load_axioms(dirname: str) -> list[tuple[str, str]]:
    """axioms file → [(child, parent)] (reference io.py:79-89)."""
    out = []
    with open(os.path.join(dirname, AXIOMS_FILE)) as f:
        for line in f:
            child, parent = line.split()
            out.append((child, parent))
    return out


def save_axioms(axioms: list[tuple[str, str]], dirname: str) -> None:
    with open(os.path.join(dirname, AXIOMS_FILE), "w") as f:
        f.writelines(f"{c} {p}\n" for c, p in axioms)


# ------------------------------------------------------------------ DataFrames
def load_dataset(
    spark: SparkSession, dirname: str
) -> tuple[DataFrame, DataFrame, list[tuple[str, str]]]:
    """Reference-layout directory → (dataset, classes, axioms).

    dataset(sample_id, entity_id, class_id) + classes(class_id, class_name)
    match :mod:`sparktax.dataset`'s native shape; axioms stay a driver
    list (they seed a :class:`sparktax.tree.Tree`)."""
    indices, labels = load_instances(dirname)
    if len(indices) != len(labels):
        raise ValueError(
            f"{INDICES_FILE} and {LABELS_FILE} disagree: "
            f"{len(indices)} vs {len(labels)} rows"
        )
    _, cls2name = load_classes(dirname)
    axioms = load_axioms(dirname)
    dataset = spark.createDataFrame(
        [(i, int(e), int(c)) for i, (e, c) in enumerate(zip(indices, labels))],
        "sample_id long, entity_id long, class_id int",
    )
    classes = spark.createDataFrame(
        sorted(cls2name.items()), "class_id int, class_name string"
    )
    return dataset, classes, axioms


def save_dataset(
    dataset: DataFrame,
    classes: DataFrame,
    axioms: list[tuple[str, str]],
    dirname: str,
    overwrite: bool = False,
) -> None:
    """Write the reference text layout (reference io.py:115-126; the
    interactive overwrite prompt is replaced by the ``overwrite`` flag)."""
    if os.path.exists(os.path.join(dirname, INDICES_FILE)) and not overwrite:
        raise FileExistsError(f"{dirname} already holds a dataset")
    os.makedirs(dirname, exist_ok=True)
    rows = (
        dataset.select("sample_id", "entity_id", "class_id")
        .orderBy("sample_id")
        .collect()
    )
    save_instances([r.entity_id for r in rows], [r.class_id for r in rows], dirname)
    name2cls = {
        r.class_name: r.class_id
        for r in classes.orderBy("class_id").collect()
    }
    save_classes(name2cls, dirname)
    save_axioms(axioms, dirname)
