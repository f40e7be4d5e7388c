"""RMCL benchmark: full robust-contrastive train step throughput.

Measures image-text pairs/sec/chip for the COMPLETE RMCL `task_moco`
step on ViLT-B/32 — the reference's hot path (SURVEY.md §3.1):
  momentum (EMA) twin update
  + key forward (no-grad)
  + clean query forward
  + 5-step PGD image attack (5 fwd+bwd passes, reference
    attack/pgd_attack_vilt.py:130-175)
  + attacked-image view fwd
  + attacked-text view fwd (greedy-attack ids precomputed host-side)
  + both-view fwd
  + InfoNCE losses, backward, AdamW update, 65536-negative queue enqueue
all fused into ONE XLA program (reference: ~14 separate eager phases).

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
`REF_PAIRS_PER_SEC_PER_GPU` is our measured-order estimate for the same
step on the reference stack (PyTorch Lightning, V100-class GPU, batch
16/GPU, AMP fp16): a ViLT-B fwd+bwd at ~240 tokens is ~55 ms at bs16,
and the RMCL step does ~8 fwd + ~7 bwd passes per batch -> ~0.45 s per
16 pairs ~= 35 pairs/sec/GPU.  vs_baseline = ours / (that estimate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

import os

REF_PAIRS_PER_SEC_PER_GPU = 35.0

# batch sweep on v5e (pairs/s/chip): 8 -> 54.5, 16 -> 56.8, 32 -> 50.6,
# 64 -> 41.4; 16/chip is the measured optimum (matches the reference's
# 16/GPU recipe, vilt/config.py:128-164 batch 128 over 8 GPUs)
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
WARMUP = 2
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
PALLAS = os.environ.get("BENCH_PALLAS", "0") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.train.step import create_train_state, make_train_step
    from __graft_entry__ import _fake_batch

    dev = jax.devices()[0]
    log(f"benchmarking on {dev.platform}:{dev.device_kind}")

    on_tpu = dev.platform == "tpu"
    cfg = build_config(
        "task_moco",
        num_negative=int(os.environ.get("BENCH_QUEUE", "65536")),
        image_bucket_hw=(384, 576),
        max_image_len=200,
        image_view=os.environ.get("BENCH_IMAGE_VIEW", "1") == "1",
        text_view=os.environ.get("BENCH_TEXT_VIEW", "1") == "1",
        adv_steps_img=int(os.environ.get("BENCH_PGD_STEPS", "5")),
        adv_lr_img=0.05, adv_max_norm_img=0.005,
        use_pallas_attention=on_tpu and PALLAS,
        attention_impl=os.environ.get("BENCH_ATTN", ""),
        image_layout=os.environ.get("BENCH_LAYOUT", "patch"),
        compute_dtype="bfloat16" if on_tpu else "float32",
        per_device_batchsize=BATCH,
        max_steps=200000,
        remat_blocks=os.environ.get("BENCH_REMAT", "1") == "1",
        remat_policy=os.environ.get("BENCH_REMAT_POLICY", "full"),
    )
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, donate=True)

    batch = {k: jnp.asarray(v)
             for k, v in _fake_batch(cfg, BATCH, with_views=True).items()}
    rng = jax.random.PRNGKey(1)

    log("compiling...")
    t0 = time.perf_counter()
    ts, metrics = step_fn(ts, batch, rng)
    jax.block_until_ready(metrics)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s "
        f"moco_loss={float(metrics['moco_loss']):.4f}")

    for _ in range(WARMUP):
        ts, metrics = step_fn(ts, batch, rng)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        ts, metrics = step_fn(ts, batch, rng)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / ITERS

    pairs_per_sec = BATCH / dt
    log(f"step time {dt*1e3:.1f} ms  ->  {pairs_per_sec:.1f} pairs/s/chip")

    print(json.dumps({
        "metric": "rmcl_moco_step_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REF_PAIRS_PER_SEC_PER_GPU, 3),
    }))


if __name__ == "__main__":
    main()
