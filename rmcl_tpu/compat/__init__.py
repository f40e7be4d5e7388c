from rmcl_tpu.compat.torch_loader import (  # noqa: F401
    convert_state_dict, export_state_dict, graft_pretrain_heads,
    load_torch_checkpoint)
