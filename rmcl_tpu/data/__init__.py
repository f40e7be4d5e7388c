from rmcl_tpu.data.tokenizer import WordPieceTokenizer, get_tokenizer  # noqa: F401
from rmcl_tpu.data.transforms import (  # noqa: F401
    keys_to_transforms, min_max_resize, min_max_size, pixelbert_transform)
from rmcl_tpu.data.mlm import MLMCollator  # noqa: F401
from rmcl_tpu.data.arrow_dataset import ArrowDataset, collate  # noqa: F401
from rmcl_tpu.data.datasets import DATASETS  # noqa: F401
from rmcl_tpu.data.loader import ConcatDataset, DataLoader  # noqa: F401
from rmcl_tpu.data.datamodule import MultitaskDataModule  # noqa: F401
