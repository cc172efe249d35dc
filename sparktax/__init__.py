"""sparktax — a from-scratch, PySpark-native knowledge-graph construction and
taxonomy-extraction engine.

Capabilities mirror the reference repo felix-martel/taxonomy-extraction
(research code: KG → entity embeddings → hierarchical clustering → subClassOf
taxonomy), re-expressed Spark-first:

* distributed lane: Spark SQL / DataFrame for scans, joins, aggregations,
  2-hop pattern mining, sampling, composition/F matrices, connected
  components, evaluation;
* kernel lane: Arrow-batched ``applyInPandas`` UDFs + driver numpy for the
  sample-bounded numeric kernels (HAC dendrograms, beam search, Hungarian /
  soft mapping, tree surgery) — mirroring the reference's own scalability
  lever (sample size caps, see reference libs/expressive/params.py:9).

The pipeline entry (north star) is: multi-turn agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` → batched mention/triple
extraction → entity linking (broadcast dict + MinHash/LSH) →
canonicalization (connected components) → materialized ``nodes``/``edges``
→ taxonomy algorithms on the materialized graph.
"""

__version__ = "0.1.0"

from sparktax.session import get_spark  # noqa: F401
