"""Entity linking against a broadcast candidate dictionary.

The scalable shape: the candidate dictionary (surface → entity_id, prior) is
small relative to the mention stream, so linking is a **broadcast hash join**
on the normalized surface plus a windowed argmax on prior — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def normalize_surface(col):
    """Casefold + collapse separators: the join key for exact linking."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[_\-\s]+", " ")
    c = F.regexp_replace(c, r"[^\w ]", "")
    return F.trim(c)


def link_mentions(
    mentions: DataFrame,
    candidates: DataFrame,
    surface_col: str = "surface",
    keep_ambiguous: bool = False,
) -> DataFrame:
    """Join mentions to dictionary candidates; resolve ambiguity by max prior.

    ``candidates``: (surface, entity_id, prior). Ambiguous surfaces (one
    surface → several entities) are resolved by the highest prior
    (deterministic tiebreak on entity_id); ``keep_ambiguous=True`` returns
    every candidate with its rank instead.
    """
    cand = candidates.select(
        normalize_surface(F.col("surface")).alias("_key"),
        "entity_id",
        "prior",
    )
    m = mentions.withColumn("_key", normalize_surface(F.col(surface_col)))
    joined = m.join(broadcast(cand), "_key", "left")
    w = Window.partitionBy(*mentions.columns).orderBy(
        F.desc("prior"), F.asc("entity_id")
    )
    ranked = joined.withColumn("cand_rank", F.row_number().over(w))
    if keep_ambiguous:
        return ranked.drop("_key")
    return ranked.filter(F.col("cand_rank") == 1).drop("_key", "cand_rank")
