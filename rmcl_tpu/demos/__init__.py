from rmcl_tpu.demos.inference import (  # noqa: F401
    DemoEngine, prepare_image)
