from sparktax.graph.kg import KnowledgeGraph, encode_triples  # noqa: F401
from sparktax.graph.io import (  # noqa: F401
    normalize_literals,
    read_openke_dir,
    read_ttl_lines,
    shorten_uri,
    write_openke_dir,
)
