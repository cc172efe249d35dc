from sparktax.extract.rules import STATEMENT_RE, extract_turn, reference_extract_pdf  # noqa: F401
from sparktax.extract.pipeline import (  # noqa: F401
    extract_mentions,
    extract_triples,
    extract_triples_contextual,
)
