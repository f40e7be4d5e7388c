"""On-chip VQAv2 test-dev submission wall-clock.

The reference produces the test-dev submission with per-rank eval loops
+ barrier file dances (reference vilt/modules/objectives.py:1518-1581);
no wall-clock is published, so this records ours: slope-timed jitted
single-image VQA eval step at full ViLT-B size, extrapolated to the
VQAv2 test-dev set (107,394 questions).

Run: python scripts/measure_vqa_eval.py   (needs the TPU tunnel)
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import bench_prog

BATCH = int(os.environ.get("VQA_BATCH", "64"))
N_TESTDEV = 107394


def main():
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.models.heads import vqa_classifier
    from rmcl_tpu.models.vilt import ViLTModel

    cfg = build_config(
        "task_finetune_vqa_randaug",
        image_bucket_hw=(384, 576), max_image_len=200,
        compute_dtype="bfloat16", image_layout="patch")
    print(f"devices: {jax.devices()}  batch={BATCH}", file=sys.stderr,
          flush=True)
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))

    r = np.random.RandomState(0)
    H, W = cfg.image_bucket_hw
    P = cfg.patch_size
    N, F = (H // P) * (W // P), P * P * 3
    batch = {
        "image": jnp.asarray(r.rand(BATCH, N, F), jnp.float32),
        "text_ids": jnp.asarray(
            r.randint(1000, 2000, (BATCH, cfg.max_text_len)), jnp.int32),
        "text_masks": jnp.ones((BATCH, cfg.max_text_len), jnp.int32),
    }
    batch["text_labels"] = jnp.full_like(batch["text_ids"], -100)

    def make_eval(n):
        @jax.jit
        def f(params, batch):
            def body(i, acc):
                b = dict(batch, text_ids=batch["text_ids"]
                         + (acc > 1e30).astype(jnp.int32))
                infer = model.infer(params, b, deterministic=True)
                logits = vqa_classifier(params["vqa_classifier"],
                                        infer["cls_feats"])
                return acc + jnp.sum(logits).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    t, _ = bench_prog(make_eval, params, batch, verbose=True)
    print(f"vqa eval step b{BATCH}: {t*1e3:.2f} ms "
          f"-> {BATCH/t:,.0f} questions/s", flush=True)
    total = N_TESTDEV * t / BATCH
    print(f"\nVQAv2 test-dev ({N_TESTDEV} questions) extrapolation:")
    print(f"  one v5e chip : {total:.1f} s")
    print(f"  8-chip DP    : {total/8:.1f} s")


if __name__ == "__main__":
    main()
