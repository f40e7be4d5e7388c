from rmcl_tpu.objectives.losses import (  # noqa: F401
    bce_with_logits,
    cross_entropy,
)
from rmcl_tpu.objectives.ot import (  # noqa: F401
    cost_matrix_cosine,
    ipot,
    optimal_transport_dist,
)
