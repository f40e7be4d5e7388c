from rmcl_tpu.eval.metrics import (  # noqa: F401
    Accuracy, MetricBag, Scalar, VQAScore, change_rate)
from rmcl_tpu.eval.retrieval import (  # noqa: F401
    compute_attacked_irtr_recall, compute_irtr_recall, recall_at_k)
from rmcl_tpu.eval.vqa import (  # noqa: F401
    VQASubmissionWriter, evaluate_submission, vqa_accuracy)
