"""On-chip NLVR2 eval wall-clock (BASELINE.md: reference = 1 min 31 s
on 8 GPUs for the dev+test-P evaluation, reference EVAL.md:35).

Slope-times the jitted NLVR2 eval step (two-image forward + classifier)
at full ViLT-B size and extrapolates to the NLVR2 splits
(dev = 6982, test-P = 6967 pairs).

Run: python scripts/measure_nlvr2_eval.py   (needs the TPU tunnel)
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import bench_prog

BATCH = int(os.environ.get("NLVR2_BATCH", "32"))
N_DEV, N_TEST = 6982, 6967


def main():
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.models.heads import nlvr2_classifier
    from rmcl_tpu.models.vilt import ViLTModel

    cfg = build_config(
        "task_finetune_nlvr2_randaug",
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
        "image_0": jnp.asarray(r.rand(BATCH, N, F), jnp.float32),
        "image_1": jnp.asarray(r.rand(BATCH, N, F), jnp.float32),
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
                i1 = model.infer(params, b, image_token_type_idx=1,
                                 deterministic=True)
                i2 = model.infer(params, b, image_token_type_idx=2,
                                 deterministic=True)
                cls = jnp.concatenate([i1["cls_feats"], i2["cls_feats"]],
                                      axis=-1)
                logits = nlvr2_classifier(params["nlvr2_classifier"], cls)
                return acc + jnp.sum(logits).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    t, _ = bench_prog(make_eval, params, batch, verbose=True)
    per_pair = t / BATCH
    print(f"nlvr2 eval step b{BATCH}: {t*1e3:.2f} ms "
          f"-> {BATCH/t:,.0f} pairs/s", flush=True)
    total = (N_DEV + N_TEST) * per_pair
    print(f"\nNLVR2 dev+test-P ({N_DEV}+{N_TEST}) extrapolation:")
    print(f"  one v5e chip : {total:.1f} s "
          f"(reference: 91 s on 8 GPUs, EVAL.md:35)")
    print(f"  8-chip DP    : {total/8:.1f} s")


if __name__ == "__main__":
    main()
