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


def gil_probe(loader, n_batches: int) -> float:
    """Measured GIL-held fraction of the loader's sample work.

    A pure-Python spinner thread counts increments; on a 1-core box its
    rate while the loader runs, relative to its solo rate, is the
    fraction of wall-clock the GIL was FREE (loader inside GIL-releasing
    C calls: PIL decode, the ctypes imageproc/wordpiece extensions,
    numpy).  Thread-based worker scaling on a many-core host is capped
    at ~1/gil_frac workers; this turns the 1-core box into a real data
    point for the production sizing model instead of an assumption.
    """
    import threading

    stop = threading.Event()
    counts = [0]

    def spin():
        c = 0
        while not stop.is_set():
            c += 1
        counts[0] = c

    # solo spinner rate
    t = threading.Thread(target=spin)
    t.start(); time.sleep(1.0); stop.set(); t.join()
    solo_rate = counts[0] / 1.0

    # spinner vs the loader
    stop.clear()
    t = threading.Thread(target=spin)
    it = iter(loader)
    next(it)                                       # warm the pool
    t.start()
    t0 = time.perf_counter()
    for i, _ in enumerate(it):
        if i >= n_batches:
            break
    dt = time.perf_counter() - t0
    stop.set(); t.join()
    during_rate = counts[0] / dt
    return max(0.0, 1.0 - during_rate / solo_rate)


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

    # process-pool workers (cfg.num_worker_procs): GIL-free scaling;
    # on this 1-core box the sweep measures fork+IPC overhead only —
    # the per-worker rate curve is the datum for many-core sizing
    for procs in (1, 2, 4):
        dm = MultitaskDataModule(
            cfg.replace(num_worker_procs=procs), vocab_path=vocab)
        dm.setup()
        loader = dm.train_loader(bs)
        it = iter(loader)
        next(it)
        t0 = time.perf_counter()
        nb = 0
        for b in it:
            nb += 1
            if nb >= max(4, (n // bs) - 2):
                break
        dt = time.perf_counter() - t0
        print(f"procs={procs}:   {nb * bs / dt:7.1f} images/s "
              f"({nb} batches of {bs} in {dt:.2f}s)")

    # GIL-held fraction -> thread-scaling ceiling on a many-core host
    dm = MultitaskDataModule(cfg.replace(num_workers=1), vocab_path=vocab)
    dm.setup()
    frac = gil_probe(dm.train_loader(bs), n_batches=max(2, n // bs - 2))
    ceil = (1.0 / frac) if frac > 1e-3 else float("inf")
    print(f"gil_held_frac={frac:.3f} -> thread-scaling ceiling "
          f"~{ceil:.1f} effective workers "
          f"(host img/s ceiling ~ per-core rate x min(vCPUs, {ceil:.1f}))")


if __name__ == "__main__":
    main()
