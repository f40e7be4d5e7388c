"""On-chip decomposition of the ONE-program greedy-attack+train step.

VERDICT r3 Next #1: the production `task_moco text_view=True` recipe
runs at ~39 pairs/s vs the 107 clean step; before pulling any lever
(no-grad scoring megakernel, text-length-bucketed scoring, bf16
scoring) this script measures where the attacked step actually spends
its time:

  clean          the attack-free train step (bench.py's program)
  attacked(L)    the one-program attack+step at max_loops = L in
                 {1, 2, 3, 10} on the worst-case mix -> per-loop slope
  attacked(NC)   same at n_candidates in {2, 5} -> scoring-row slope
  score_pass     one candidate-scoring forward (B*NC rows) alone
  grad_pass      one loss_per_sample grad-to-word-embeds pass alone

Timing: bench.py's chained-dispatch method (N donated steps back to
back, fetch once) — per ROADMAP this is sound over the tunnel; the
slope between loop counts cancels the fixed dispatch cost.

Usage: python scripts/profile_attack.py [B]   (default 16)
Env:   PROF_ITERS (default 10), PROF_MIX (worst|realistic)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rmcl_tpu.core.tpu_env import ensure_scoped_vmem_flag  # noqa: E402

ensure_scoped_vmem_flag()


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from bench import _greedy_setup
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.train.step import (
        create_train_state, make_attacked_train_step, make_train_step)
    from __graft_entry__ import _fake_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ITERS = int(os.environ.get("PROF_ITERS", "10"))
    MIX = os.environ.get("PROF_MIX", "worst")
    dev = jax.devices()[0]
    log(f"profiling on {dev.platform}:{dev.device_kind}  B={B} mix={MIX}")
    on_tpu = dev.platform == "tpu"

    def make_cfg(**kw):
        return build_config(
            "task_moco", num_negative=65536,
            image_bucket_hw=(384, 576), max_image_len=200,
            image_view=True, text_view=True,
            adv_steps_img=5, adv_lr_img=0.05, adv_max_norm_img=0.005,
            compute_dtype="bfloat16" if on_tpu else "float32",
            per_device_batchsize=B, max_steps=200000,
            use_pallas_attention=False, **kw)

    rng = jax.random.PRNGKey(1)

    def timed_steps(step_fn, ts, batch, n=ITERS, warm=2):
        t0 = time.perf_counter()
        ts, m = step_fn(ts, batch, rng)
        jax.block_until_ready(m)
        log(f"    compile+first: {time.perf_counter() - t0:.1f}s")
        for _ in range(warm):
            ts, m = step_fn(ts, batch, rng)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(n):
            ts, m = step_fn(ts, batch, rng)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / n
        return dt, m

    # ---------------- clean step
    cfg = make_cfg()
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v)
             for k, v in _fake_batch(cfg, B, with_views=True).items()}
    step_fn = make_train_step(cfg, model, tx, donate=True)
    dt_clean, _ = timed_steps(step_fn, ts, batch)
    log(f"  clean step          {dt_clean*1e3:8.1f} ms  "
        f"({B/dt_clean:6.1f} pairs/s)")

    # ---------------- attacked step at several loop caps
    base = {k: v for k, v in batch.items() if not k.startswith("attacked")}
    results = {}
    for L in (1, 2, 3, 10):
        cfgL = make_cfg(max_loops=L)
        modelL, tsL, txL = create_train_state(jax.random.PRNGKey(0), cfgL)
        greedy, ids, masks = _greedy_setup(cfgL, modelL, B, mix=MIX)
        b = dict(base, text_ids=jnp.asarray(ids),
                 text_masks=jnp.asarray(masks),
                 text_labels=jnp.full_like(jnp.asarray(ids), -100))
        b.update({k: jnp.asarray(v)
                  for k, v in greedy.prep_tables(ids).items()})
        step2 = make_attacked_train_step(cfgL, modelL, txL, greedy,
                                         donate=True)
        dt, m = timed_steps(step2, tsL, b)
        results[L] = dt
        log(f"  attacked L={L:<2d}       {dt*1e3:8.1f} ms  "
            f"({B/dt:6.1f} pairs/s)  num_changes="
            f"{float(m['num_changes']):.2f}")
    if 2 in results and 1 in results:
        log(f"  -> per-extra-loop slope (L1->L2): "
            f"{(results[2]-results[1])*1e3:6.1f} ms, (L2->L3): "
            f"{(results[3]-results[2])*1e3:6.1f} ms")
        log(f"  -> attack fixed cost (L1 - clean): "
            f"{(results[1]-dt_clean)*1e3:6.1f} ms")

    # ---------------- candidate-count slope at max_loops=10
    for NC in (2,):
        cfgN = make_cfg(n_candidates=NC)
        modelN, tsN, txN = create_train_state(jax.random.PRNGKey(0), cfgN)
        greedy, ids, masks = _greedy_setup(cfgN, modelN, B, mix=MIX)
        b = dict(base, text_ids=jnp.asarray(ids),
                 text_masks=jnp.asarray(masks),
                 text_labels=jnp.full_like(jnp.asarray(ids), -100))
        b.update({k: jnp.asarray(v)
                  for k, v in greedy.prep_tables(ids).items()})
        step2 = make_attacked_train_step(cfgN, modelN, txN, greedy,
                                         donate=True)
        dt, m = timed_steps(step2, tsN, b)
        log(f"  attacked NC={NC}       {dt*1e3:8.1f} ms  "
            f"({B/dt:6.1f} pairs/s)  num_changes="
            f"{float(m['num_changes']):.2f}")

    # ---------------- isolated passes (slope-timed chained programs)
    from scripts._timing import bench_prog
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
    from rmcl_tpu.train.loop import greedy_attack_extras
    from rmcl_tpu.models.vit import normalize_image_inputs

    cfg5 = make_cfg()
    model5, ts5, _ = create_train_state(jax.random.PRNGKey(0), cfg5)
    greedy, ids, masks = _greedy_setup(cfg5, model5, B, mix=MIX)
    assert isinstance(greedy, FusedGreedyAttack)
    gb = greedy.base
    NC = cfg5.n_candidates
    clean = dict(base, text_ids=jnp.asarray(ids),
                 text_masks=jnp.asarray(masks),
                 text_labels=jnp.full_like(jnp.asarray(ids), -100))
    clean = normalize_image_inputs(clean, grid_hw=cfg5.grid_hw,
                                   patch_size=cfg5.patch_size)
    extras = greedy_attack_extras(cfg5, model5, "moco", ts5.params,
                                  ts5.state, clean)
    extras = jax.tree.map(jnp.asarray, extras)

    flat = {k: (jnp.repeat(v, NC, axis=0)
                if getattr(v, "ndim", 0) >= 1 and v.shape[0] == B else v)
            for k, v in clean.items()}

    def score_prog(n):
        def run(params, flat, extras):
            def body(i, acc):
                s = gb.score_candidates(params, flat, B, NC, extras, None)
                return acc + jnp.sum(s)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return jax.jit(run)

    per, n = bench_prog(score_prog, ts5.params, flat, extras)
    log(f"  score_pass ({B*NC} rows) {per*1e3:8.2f} ms  (n={n})")

    def grad_prog(n):
        def run(params, batch, extras):
            from rmcl_tpu.models.layers import embedding

            def body(i, acc):
                we = embedding(params["text_embeddings"]["word_embeddings"],
                               batch["text_ids"])

                def scalar_loss(w):
                    p, _ = gb.loss_per_sample(params, batch, extras,
                                              word_embeds=w)
                    return jnp.mean(p)

                g = jax.grad(scalar_loss)(we)
                return acc + jnp.sum(g.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return jax.jit(run)

    per, n = bench_prog(grad_prog, ts5.params, clean, extras)
    log(f"  grad_pass (B={B})      {per*1e3:8.2f} ms  (n={n})")


if __name__ == "__main__":
    main()
