from sparktax.extraction.assign import (  # noqa: F401
    greedy_mapping,
    hard_mapping,
    linear_sum_assignment,
)
from sparktax.extraction.common import mapping_to_axioms  # noqa: F401
from sparktax.extraction.soft import (  # noqa: F401
    build_taxonomy,
    compress_axioms,
    margin_prob,
    soft_mapping,
    softmax_columns,
)
