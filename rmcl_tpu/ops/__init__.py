from rmcl_tpu.ops.attention import masked_attention, mha_xla  # noqa: F401
from rmcl_tpu.ops.pallas_attention import flash_masked_attention  # noqa: F401
