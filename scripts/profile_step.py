"""On-chip decomposition profile of the RMCL moco step (ROADMAP lever 4).

Times each phase of the step as ONE jitted program with N internally
chained iterations (the only trustworthy methodology over the remote
tunnel — see .claude/skills/verify/SKILL.md): per-call timing loops
under-report because independent dispatches get elided.

Phases:
  fwd          full infer fwd + moco head + InfoNCE
  fwd_bwd      + backward to params (what the main loss pays per view)
  pgd_iter     one PGD iteration (fwd + bwd-to-delta), remat as configured
  pgd_iter_nr  same with remat disabled (the attack needs no param grads)
  tr_fwd       bare 12-block transformer fwd at the same (B, S)
  tr_fwd_bwd   bare transformer fwd + bwd-to-input
  vis_embed    visual_embed alone (patchify + pos interp + select)
  step         the full train step (bench.py's program) for cross-check

Usage:  python scripts/profile_step.py [B ...]   (default: 16 32)
Env:    PROF_REMAT (default 1)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import bench_prog


def log(*a):
    print(*a, flush=True)


def timed(name, fn_of_iters, *args):
    """fn_of_iters(n) -> jitted fn(*args) returning a scalar."""
    per, n = bench_prog(fn_of_iters, *args)
    log(f"  {name:14s} {per * 1e3:8.2f} ms/iter   (n={n})")
    return per


def main():
    import jax
    import jax.numpy as jnp
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.models.vilt import ViLTModel, make_spec
    from rmcl_tpu.models.heads import moco_head
    from rmcl_tpu.models.vit import transformer_apply, visual_embed
    from rmcl_tpu.objectives.contrastive import infonce
    from rmcl_tpu.objectives.losses import l2_normalize
    from rmcl_tpu.attacks.pgd import make_pgd_moco
    from rmcl_tpu.train.step import create_train_state, make_train_step
    from __graft_entry__ import _fake_batch

    dev = jax.devices()[0]
    log(f"profiling on {dev.platform}:{dev.device_kind}")
    on_tpu = dev.platform == "tpu"

    batches = [int(b) for b in sys.argv[1:]] or [16, 32]
    for B in batches:
        cfg = build_config(
            "task_moco",
            num_negative=65536,
            image_bucket_hw=(384, 576), max_image_len=200,
            image_view=True, text_view=True,
            adv_steps_img=5, adv_lr_img=0.05, adv_max_norm_img=0.005,
            image_layout="patch",
            compute_dtype="bfloat16" if on_tpu else "float32",
            per_device_batchsize=B, max_steps=200000,
            remat_blocks=os.environ.get("PROF_REMAT", "1") == "1",
        )
        model = ViLTModel(cfg)
        model_nr = ViLTModel(cfg.replace(remat_blocks=False))
        params, state = model.init(jax.random.PRNGKey(0))
        batch = {k: jnp.asarray(v)
                 for k, v in _fake_batch(cfg, B, with_views=True).items()}
        dtype = jnp.dtype(cfg.compute_dtype)
        log(f"\n== B={B} remat={cfg.remat_blocks} dtype={cfg.compute_dtype} ==")

        # ---- fwd: full infer + head + infonce, chained via image feedback
        def moco_loss(p, b, queue):
            inf = model.infer(p, b, deterministic=True)
            q = l2_normalize(moco_head(p["moco_head"], inf["cls_feats"]), axis=1)
            loss, _ = infonce(q, q, queue, cfg.temperature)
            return loss

        def run_fwd(n):
            @jax.jit
            def run(p, b, queue):
                def body(i, carry):
                    img, acc = carry
                    loss = moco_loss(p, dict(b, image=img), queue)
                    return (img + (0.0 * loss).astype(img.dtype), acc + loss)
                _, acc = jax.lax.fori_loop(
                    0, n, body, (b["image"], jnp.zeros((), jnp.float32)))
                return acc
            return run

        # ---- fwd+bwd to params
        def run_fwd_bwd(n):
            @jax.jit
            def run(p, b, queue):
                def body(i, carry):
                    img, acc = carry
                    loss, g = jax.value_and_grad(moco_loss)(
                        p, dict(b, image=img), queue)
                    gnorm = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                                for x in jax.tree.leaves(g))
                    return (img + (0.0 * gnorm).astype(img.dtype), acc + loss)
                _, acc = jax.lax.fori_loop(
                    0, n, body, (b["image"], jnp.zeros((), jnp.float32)))
                return acc
            return run

        # ---- PGD: the production fori_loop with adv_steps=n
        def run_pgd_with(m, fast=True):
            def make(n):
                pgd = make_pgd_moco(m, n, cfg.adv_lr_img,
                                    cfg.adv_max_norm_img, cfg.temperature,
                                    fast=fast)

                @jax.jit
                def run(p, b, k, queue):
                    d = pgd(p, b, k, queue)
                    return jnp.sum(jnp.abs(d.astype(jnp.float32)))
                return run
            return make

        # ---- bare transformer at same (B, S)
        S = cfg.max_text_len + cfg.max_image_len + 1
        spec = make_spec(cfg)
        spec_nr = make_spec(cfg.replace(remat_blocks=False))
        x0 = jnp.asarray(
            np.random.RandomState(0).randn(B, S, cfg.hidden_size), dtype)
        mask = jnp.ones((B, S), jnp.int32)

        def run_tr_fwd(n):
            @jax.jit
            def run(tr, x):
                def body(i, carry):
                    x, acc = carry
                    out = transformer_apply(tr, x, mask, spec=spec)
                    m = jnp.mean(out[:, 0].astype(jnp.float32))
                    return (x + (0.0 * m).astype(x.dtype), acc + m)
                _, acc = jax.lax.fori_loop(
                    0, n, body, (x, jnp.zeros((), jnp.float32)))
                return acc
            return run

        def run_tr_fwd_bwd(n):
            @jax.jit
            def run(tr, x):
                def loss(xx):
                    out = transformer_apply(tr, xx, mask, spec=spec)
                    return jnp.mean(out[:, 0].astype(jnp.float32))

                def body(i, carry):
                    x, acc = carry
                    l, g = jax.value_and_grad(loss)(x)
                    return (x + (0.0 * l).astype(x.dtype) + 0.0 * g, acc + l)
                _, acc = jax.lax.fori_loop(
                    0, n, body, (x, jnp.zeros((), jnp.float32)))
                return acc
            return run

        # ---- visual_embed alone
        def run_vis(n):
            @jax.jit
            def run(tr, img):
                def body(i, carry):
                    img, acc = carry
                    x, xm, _, _ = visual_embed(
                        tr, img, spec=spec, max_image_len=cfg.max_image_len,
                        dtype=dtype,
                        grid_hw=cfg.grid_hw if img.ndim == 3 else None)
                    m = jnp.mean(x[:, 0].astype(jnp.float32))
                    return (img + (0.0 * m).astype(img.dtype), acc + m)
                _, acc = jax.lax.fori_loop(
                    0, n, body, (img, jnp.zeros((), jnp.float32)))
                return acc
            return run

        queue = jax.lax.stop_gradient(
            jnp.asarray(np.random.RandomState(1).randn(128, cfg.num_negative),
                        jnp.float32))
        k_mod = l2_normalize(
            jnp.asarray(np.random.RandomState(2).randn(B, 128), jnp.float32), 1)

        t_fwd = timed("fwd", run_fwd, params, batch, queue)
        t_fb = timed("fwd_bwd", run_fwd_bwd, params, batch, queue)
        t_pgd = timed("pgd_iter", run_pgd_with(model), params, batch, k_mod,
                      queue)
        t_pgd_slow = timed("pgd_iter_slow", run_pgd_with(model, fast=False),
                           params, batch, k_mod, queue)
        t_trf = timed("tr_fwd", run_tr_fwd, params["transformer"], x0)
        t_trfb = timed("tr_fwd_bwd", run_tr_fwd_bwd, params["transformer"], x0)
        t_vis = timed("vis_embed", run_vis, params["transformer"], batch["image"])

        # ---- full train step cross-check (bench.py program)
        model_b, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
        step_fn = make_train_step(cfg, model_b, tx, donate=True)
        rng = jax.random.PRNGKey(1)
        ts, metrics = step_fn(ts, batch, rng)
        _ = float(metrics["moco_loss"])
        t0 = time.perf_counter()
        for _ in range(10):
            ts, metrics = step_fn(ts, batch, rng)
        _ = float(metrics["moco_loss"])
        t_step = (time.perf_counter() - t0) / 10
        log(f"  {'step':14s} {t_step * 1e3:8.2f} ms   "
            f"({B / t_step:.1f} pairs/s)")
        log(f"  decomposition: 5*pgd={5 * t_pgd * 1e3:.0f}ms"
            f" + key fwd {t_fwd * 1e3:.0f} + 4view fwd_bwd {4 * t_fb * 1e3:.0f}"
            f" vs step={t_step * 1e3:.0f}ms")


if __name__ == "__main__":
    main()
