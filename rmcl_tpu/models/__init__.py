from rmcl_tpu.models.vilt import ViLTModel, infer, init_vilt, make_spec  # noqa: F401
from rmcl_tpu.models.vit import ViTSpec, visual_embed  # noqa: F401
