from rmcl_tpu.models.vilt import ViLTModel, init_vilt  # noqa: F401
