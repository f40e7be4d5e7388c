from rmcl_tpu.objectives.losses import (  # noqa: F401
    bce_with_logits,
    cross_entropy,
)
from rmcl_tpu.objectives.ot import (  # noqa: F401
    cost_matrix_cosine,
    ipot,
    optimal_transport_dist,
)
from rmcl_tpu.objectives.contrastive import (  # noqa: F401
    compute_barlowtwins_contrastive, compute_moco_contrastive)
from rmcl_tpu.objectives.downstream import (  # noqa: F401
    compute_irtr, compute_nlvr2, compute_vqa)
from rmcl_tpu.objectives.pretrain import (  # noqa: F401
    compute_itm_wpa, compute_mlm, compute_mpp)
