"""Bisect the Pallas-attention compile-time explosion (VERDICT r2 #1).

Round-2 fact: the rmcl Pallas kernel (ops/pallas_attention.py) took
>580 s to compile inside the RMCL step twice, while XLA/flash compile
in 25-40 s.  This script times `.lower().compile()` for increasingly
composed programs at the bench shapes to find WHERE the blow-up starts:

  probe      tiny matmul (tunnel sanity)
  fwd        the fwd kernel alone
  fwd_bwd    jax.grad through fwd+bwd kernels
  infer      full ViLT forward (12-block scan) with the kernel
  infer_grad forward+backward through the scan with the kernel
  step       the full RMCL train step with attention_impl="pallas"

Run one variant per invocation or several:
  python scripts/bisect_pallas_compile.py probe fwd fwd_bwd
Each prints "BISECT <name> compile=<sec> run=<sec|skip>".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BIS_B", "16"))
H, D = 12, 64
S = int(os.environ.get("BIS_S", "241"))
DTYPE = jnp.bfloat16


def report(name, fn, args, run=True):
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    tc = time.perf_counter() - t0
    tr = "skip"
    if run:
        t0 = time.perf_counter()
        out = compiled(*args)
        jax.block_until_ready(out)
        tr = f"{time.perf_counter() - t0:.2f}"
    print(f"BISECT {name} compile={tc:.1f}s run={tr}", flush=True)


def qkvm(seed=0):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, H, S, D), DTYPE)
    k = jnp.asarray(r.randn(B, H, S, D), DTYPE)
    v = jnp.asarray(r.randn(B, H, S, D), DTYPE)
    mask = jnp.asarray((r.rand(B, S) > 0.1).astype(np.int32))
    return q, k, v, mask


def make_cfg(attn_impl):
    from rmcl_tpu.core.config import build_config
    return build_config(
        "task_moco", num_negative=65536, image_bucket_hw=(384, 576),
        max_image_len=200, image_view=True, text_view=True,
        adv_steps_img=5, adv_lr_img=0.05, adv_max_norm_img=0.005,
        attention_impl=attn_impl, image_layout="patch",
        compute_dtype="bfloat16", per_device_batchsize=B,
        max_steps=200000, remat_blocks=True, drop_rate=0.1,
        dropout_impl="rbg")


def main():
    variants = sys.argv[1:] or ["probe", "fwd", "fwd_bwd"]
    dev = jax.devices()[0]
    print(f"on {dev.platform}:{dev.device_kind}", flush=True)

    for v in variants:
        if v == "probe":
            x = jnp.ones((256, 256), DTYPE)
            report("probe", lambda a: a @ a, (x,))
        elif v == "fwd":
            from rmcl_tpu.ops.pallas_attention import flash_masked_attention
            q, k, vv, m = qkvm()
            report("fwd", lambda q_, k_, v_, m_: flash_masked_attention(
                q_, k_, v_, m_, 0.125), (q, k, vv, m))
        elif v == "fwd_bwd":
            from rmcl_tpu.ops.pallas_attention import flash_masked_attention
            q, k, vv, m = qkvm()

            def loss(q_, k_, v_, m_):
                return jnp.sum(flash_masked_attention(
                    q_, k_, v_, m_, 0.125).astype(jnp.float32))

            report("fwd_bwd", jax.grad(loss, argnums=(0, 1, 2)),
                   (q, k, vv, m))
        elif v in ("infer", "infer_grad", "step"):
            from __graft_entry__ import _fake_batch
            from rmcl_tpu.models.vilt import ViLTModel, init_vilt
            cfg = make_cfg(os.environ.get("BIS_ATTN", "pallas"))
            model = ViLTModel(cfg)
            params, state = init_vilt(jax.random.PRNGKey(0), cfg)
            batch = {k2: jnp.asarray(v2) for k2, v2 in
                     _fake_batch(cfg, B, with_views=(v == "step")).items()}
            det = os.environ.get("BIS_TRAIN", "0") != "1"
            rng0 = jax.random.PRNGKey(7)
            if v == "infer":
                def f(p, b):
                    return model.infer(p, b, deterministic=det,
                                       rng=None if det else rng0)[
                        "cls_feats"].astype(jnp.float32).sum()
                report("infer", f, (params, batch))
            elif v == "infer_grad":
                def f(p, b):
                    return model.infer(p, b, deterministic=det,
                                       rng=None if det else rng0)[
                        "cls_feats"].astype(jnp.float32).sum()
                report("infer_grad", jax.grad(f), (params, batch))
            else:
                from rmcl_tpu.train.step import (create_train_state,
                                                 make_train_step)
                model2, ts, tx = create_train_state(
                    jax.random.PRNGKey(0), cfg)
                step_fn = make_train_step(cfg, model2, tx, donate=False)
                rng = jax.random.PRNGKey(1)
                t0 = time.perf_counter()
                ts2, metrics = step_fn(ts, batch, rng)
                jax.block_until_ready(metrics)
                print(f"BISECT step compile+run="
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
        else:
            print(f"unknown variant {v}", flush=True)


if __name__ == "__main__":
    main()
