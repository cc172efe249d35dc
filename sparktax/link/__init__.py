from sparktax.link.dictionary import link_mentions, normalize_surface  # noqa: F401
from sparktax.link.minhash import (  # noqa: F401
    exact_jaccard,
    fuzzy_match_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle,
)
from sparktax.link.components import connected_components  # noqa: F401
from sparktax.link.canonicalize import canonical_entity_map, rewrite_triples  # noqa: F401
