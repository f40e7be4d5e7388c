"""Full-size production-path smoke on REAL TPU hardware.

bench.py times the jitted step on synthetic device arrays; the CPU CI
e2e (tests/test_cli.py) runs the full pipeline but at toy size on the
XLA fallback path.  This script closes the gap: the PRODUCTION config
(ViLT-B/32, bucket canvas 384x576, fused Pallas kernels, one-program
greedy-attack+PGD+step) driven end-to-end through the CLI — arrow data
-> datamodule -> host prefetch -> fused attack tables -> train step ->
validation — on the real chip, with wall-clock per step reported.

Usage:  python scripts/smoke_tpu_e2e.py  [max_steps]      (default 8)
Writes its synthetic dataset under /tmp/rmcl_smoke (re-used if present).
"""

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/rmcl_smoke"

CAPTIONS = [
    "a dog running in the park",
    "a puppy sprinting in the garden",
    "the dog sleeping near the park",
    "a cat running in the garden",
    "the puppy playing in the park",
    "a bird flying over the garden",
]

SYNONYM_GROUPS = [
    ["dog", "puppy"], ["park", "garden"], ["running", "sprinting"],
    ["cat", "bird"], ["sleeping", "playing"], ["flying"],
]


def make_data(n=64):
    import pyarrow as pa
    from PIL import Image

    os.makedirs(ROOT, exist_ok=True)
    arrow_dir = os.path.join(ROOT, "arrow")
    vocab = os.path.join(ROOT, "vocab.txt")
    vectors = os.path.join(ROOT, "vectors.txt")
    done = os.path.join(ROOT, f".done_{n}")
    if os.path.exists(done):
        return arrow_dir, vocab, vectors
    os.makedirs(arrow_dir, exist_ok=True)

    def png(seed):
        rng = np.random.RandomState(seed)
        img = Image.fromarray(rng.randint(0, 255, (400, 520, 3), np.uint8))
        b = io.BytesIO()
        img.save(b, format="PNG")
        return b.getvalue()

    rows = {
        "image": [png(i) for i in range(n)],
        "caption": [[CAPTIONS[i % len(CAPTIONS)]] for i in range(n)],
        "image_id": [f"{i}.jpg" for i in range(n)],
        "split": ["train"] * n,
    }
    t = pa.table(rows)
    for name in ("coco_caption_karpathy_train",
                 "coco_caption_karpathy_test"):
        with pa.OSFile(os.path.join(arrow_dir, f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, t.schema) as w:
                w.write_table(t)

    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    words = sorted({w for c in CAPTIONS for w in c.split()}
                   | {w for g in SYNONYM_GROUPS for w in g})
    make_tiny_vocab(vocab, words)

    rng = np.random.RandomState(0)
    with open(vectors, "w") as f:
        for group in SYNONYM_GROUPS:
            base = rng.randn(32)
            for w in group:
                v = base + 0.05 * rng.randn(32)
                f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
        for w in ("a", "the", "in", "over", "near"):
            v = rng.randn(32)
            f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
    open(done, "w").close()
    return arrow_dir, vocab, vectors


def run_cli(arrow_dir, vocab, vectors, max_steps, resume=False):
    from rmcl_tpu.cli.run import main as cli_main
    return cli_main([
        "with", "task_moco",
        f"data_root={arrow_dir}", "datasets=('coco',)",
        f"tokenizer={vocab}",
        f"embedding_path={vectors}",
        f"sim_path={os.path.join(ROOT, 'cos_sim_cache.npy')}",
        "text_view=True", "image_view=True",
        "per_device_batchsize=16", "batch_size=16",
        f"max_steps={max_steps}",
        "warmup_steps=2", "num_workers=2",
        "get_recall_metric=False",
        f"log_dir={os.path.join(ROOT, 'out')}",
    ] + (["resume_from=last"] if resume else [])
      + [a for a in os.environ.get("SMOKE_EXTRA", "").split() if a])


def main():
    max_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    arrow_dir, vocab, vectors = make_data()

    t0 = time.perf_counter()
    rc = run_cli(arrow_dir, vocab, vectors, max_steps)
    dt = time.perf_counter() - t0
    print(f"[smoke] rc={rc} wall={dt:.1f}s for {max_steps} steps "
          f"(incl. compile + validation)")
    if rc:
        return rc

    # resume leg: restart from the 'last' checkpoint the first run
    # wrote and train max_steps more (exercises on-chip orbax restore
    # and the re-run-into-existing-workdir path)
    t0 = time.perf_counter()
    rc = run_cli(arrow_dir, vocab, vectors, 2 * max_steps, resume=True)
    dt = time.perf_counter() - t0
    print(f"[smoke] resume rc={rc} wall={dt:.1f}s "
          f"(steps {max_steps}->{2 * max_steps})")
    return rc


if __name__ == "__main__":
    sys.exit(main())
