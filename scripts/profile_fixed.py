"""Decompose the RMCL step's FIXED per-step cost (ROADMAP round-3
"fixed 17.6 ms" at b16: everything that is neither a PGD iteration nor
a training view).

Phases (all timed as ONE chained program, scripts/_timing.py slope
method — per-call timing lies over the remote tunnel):
  ema        momentum_update tree_map over the k_* twin groups
  key_fwd    model.infer_k deterministic forward + k projection
  opt        AdamW update: tx.update + apply_updates (donated chain)
  queue_nce  dequeue_and_enqueue + 4x infonce against the 65k queue

Measured b16 (v5e, round 3): ema 1.62 + key_fwd 5.56 + opt 5.30 +
queue_nce 0.04 = 12.5 of the 17.6 ms derivation-matrix intercept; the
EMA and AdamW numbers sit at their HBM read/write floors (~1.5 and
~3.9 ms for ~100M twin / 113M param fp32 trees).

Usage:  python scripts/profile_fixed.py [B ...]     (default: 16 64)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import bench_prog


def log(*a):
    print(*a, flush=True)


def timed(name, fn_of_iters, *args):
    per, n = bench_prog(fn_of_iters, *args)
    log(f"  {name:12s} {per * 1e3:8.3f} ms/iter   (n={n})")
    return per


def main():
    import jax
    import jax.numpy as jnp
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.models.vilt import ViLTModel
    from rmcl_tpu.models.heads import moco_head
    from rmcl_tpu.objectives.contrastive import (
        dequeue_and_enqueue, infonce, momentum_update)
    from rmcl_tpu.objectives.losses import l2_normalize
    from rmcl_tpu.train.schedule import make_optimizer
    from __graft_entry__ import _fake_batch

    dev = jax.devices()[0]
    log(f"profiling on {dev.platform}:{dev.device_kind}")
    on_tpu = dev.platform == "tpu"

    batches = [int(b) for b in sys.argv[1:]] or [16, 64]
    for B in batches:
        cfg = build_config(
            "task_moco",
            num_negative=65536,
            image_bucket_hw=(384, 576), max_image_len=200,
            image_view=True, text_view=True,
            image_layout="patch",
            compute_dtype="bfloat16" if on_tpu else "float32",
            per_device_batchsize=B, max_steps=200000,
        )
        model = ViLTModel(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        batch = {k: jnp.asarray(v)
                 for k, v in _fake_batch(cfg, B, with_views=False).items()}
        log(f"\n== B={B} dtype={cfg.compute_dtype} ==")

        # every updated leaf must feed the scalar output or XLA DCEs
        # that leaf's update chain right through the fori_loop
        def _l1_all(tree):
            return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                       for x in jax.tree.leaves(tree))

        # ---- EMA twins ----
        def run_ema(n):
            @jax.jit
            def run(p):
                def body(i, p):
                    return momentum_update(p, 0.999)
                p = jax.lax.fori_loop(0, n, body, p)
                return _l1_all({k: v for k, v in p.items()
                                if k.startswith("k_")})
            return run

        # ---- key forward ----
        def run_key(n):
            @jax.jit
            def run(p, b):
                def body(i, carry):
                    img, acc = carry
                    inf = model.infer_k(p, dict(b, image=img),
                                        deterministic=True)
                    k = l2_normalize(moco_head(p["k_moco_head"],
                                               inf["cls_feats"]), axis=1)
                    m = jnp.mean(k.astype(jnp.float32))
                    return (img + (0.0 * m).astype(img.dtype), acc + m)
                _, acc = jax.lax.fori_loop(
                    0, n, body, (b["image"], jnp.zeros((), jnp.float32)))
                return acc
            return run

        # ---- optimizer ----
        tx, _labels = make_optimizer(cfg, params, cfg.max_steps)
        opt_state = tx.init(params)
        grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-6), params)

        def run_opt(n):
            @jax.jit
            def run(p, os_, g):
                import optax

                def body(i, carry):
                    p, os_ = carry
                    updates, os_ = tx.update(g, os_, p)
                    return (optax.apply_updates(p, updates), os_)
                p, os_ = jax.lax.fori_loop(0, n, body, (p, os_))
                return _l1_all(p)
            return run

        # ---- queue + 4x infonce ----
        q = l2_normalize(jnp.asarray(
            np.random.RandomState(1).randn(B, 128), jnp.float32), 1)
        k = l2_normalize(jnp.asarray(
            np.random.RandomState(2).randn(B, 128), jnp.float32), 1)

        def run_queue(n):
            @jax.jit
            def run(st, q, k):
                def body(i, carry):
                    st, acc = carry
                    st = dequeue_and_enqueue(st, k, B)
                    neg = jax.lax.stop_gradient(st["proj_queue"])
                    tot = 0.0
                    for j in range(4):
                        # distinct q per view — identical calls would CSE
                        loss, _lg = infonce(q * (1.0 + 0.25 * j), k, neg,
                                            0.07)
                        tot = tot + loss
                    return (st, acc + tot)
                st, acc = jax.lax.fori_loop(
                    0, n, body, (st, jnp.zeros((), jnp.float32)))
                return acc + jnp.sum(st["proj_queue_ptr"].astype(jnp.float32))
            return run

        t_ema = timed("ema", run_ema, params)
        t_key = timed("key_fwd", run_key, params, batch)
        t_opt = timed("opt", run_opt, params, opt_state, grads)
        t_q = timed("queue_nce", run_queue, state, q, k)
        tot = t_ema + t_key + t_opt + t_q
        log(f"  {'sum':12s} {tot * 1e3:8.3f} ms  (ROADMAP fixed @b16: 17.6)")


if __name__ == "__main__":
    main()
