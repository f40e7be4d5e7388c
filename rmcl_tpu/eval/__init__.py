from rmcl_tpu.eval.metrics import (  # noqa: F401
    Accuracy, MetricBag, Scalar, VQAScore, change_rate)
