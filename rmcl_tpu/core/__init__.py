from rmcl_tpu.core.config import (  # noqa: F401
    RMCLConfig,
    build_config,
    loss_names,
    named_configs,
)
