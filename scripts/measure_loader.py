"""Host input-pipeline throughput: can the loader feed the chip?

The b64 fused-kernel step consumes 116 pairs/s/chip; production is
only as fast as min(device, host loader).  This script measures the
loader alone — arrow read -> PNG decode -> C++ bicubic resize +
normalize -> patch-row collate -> numpy batch — on the same synthetic
full-size data the TPU smoke uses (400x520 px images, bucket canvas
384x576), across a worker sweep.

Usage: python scripts/measure_loader.py [n_images] [batch_size]
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from smoke_tpu_e2e import make_data  # noqa: E402  (same dataset)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    arrow_dir, vocab, vectors = make_data(n)

    from rmcl_tpu.core.config import build_config, loss_names
    from rmcl_tpu.data.datamodule import MultitaskDataModule

    cfg = build_config(
        "task_moco",
        data_root=arrow_dir, datasets=("coco",), tokenizer=vocab,
        loss_names=loss_names({"moco": 1}),
        per_device_batchsize=bs, batch_size=bs, num_workers=4)

    for workers in (1, 2, 4, 8):
        dm = MultitaskDataModule(cfg.replace(num_workers=workers),
                                 vocab_path=vocab)
        dm.setup()
        loader = dm.train_loader(bs)
        it = iter(loader)
        next(it)                                   # warm the pool
        t0 = time.perf_counter()
        nb = 0
        for b in it:
            nb += 1
            if nb >= max(4, (n // bs) - 2):
                break
        dt = time.perf_counter() - t0
        ips = nb * bs / dt
        print(f"workers={workers}: {ips:7.1f} images/s "
              f"({nb} batches of {bs} in {dt:.2f}s)")


if __name__ == "__main__":
    main()
