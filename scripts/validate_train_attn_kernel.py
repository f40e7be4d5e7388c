"""Validate fused_attn_half_train and the fused_mlp_half_train tail on
REAL TPU (the Mosaic PRNG has no CPU/interpret lowering — companion to
scripts/validate_train_mlp_kernel.py).

Strategy: the pre-dropout value f(x) is obtainable from the
deterministic kernels with the SAME weights; with the same seeds the
train kernel's output is x + keep·f(x)/(1-p), so the keep mask is
inferred elementwise from (out - x) vs {f/(1-p), 0} proximity.  An XLA
twin fed the inferred mask then checks forward AND all gradients
(which proves the backward kernel regenerates the identical mask and
that the in-VMEM weight-grad accumulation is correct).

Usage: python scripts/validate_train_attn_kernel.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rmcl_tpu.ops.pallas_block import (  # noqa: E402
    _mlp_train_fwd_impl, _mlp_train_twin, _xla_twin, fused_attn_half,
    fused_attn_half_train, fused_mlp_half_train)

EPS = 1e-6


def infer_keep(out, x, f, p):
    """Per-element keep mask from out = x + keep*f/(1-p)."""
    r = np.asarray(out, np.float32) - np.asarray(x, np.float32)
    fi = np.asarray(f, np.float32) / (1.0 - p)
    keep = np.abs(r - fi) < np.abs(r)          # closer to f/(1-p) than 0
    return jnp.asarray(keep.astype(np.float32))


def check_grads(loss_k, loss_t, args, names, atol):
    gk = jax.grad(loss_k, argnums=tuple(range(len(args))))(*args)
    gt = jax.grad(loss_t, argnums=tuple(range(len(args))))(*args)
    for n, a, b in zip(names, gk, gt):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        err = np.abs(a - b).max() / scale
        assert err < atol, f"{n} rel err {err}"


def attn_case(B, S, C, H, p, atol_fwd, atol_bwd):
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.2).astype(np.int32))
    seeds = jnp.asarray(r.randint(0, 2 ** 31 - 1, (B,)), jnp.int32)
    lnw = jnp.asarray(1.0 + 0.1 * r.randn(C), jnp.float32)
    lnb = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    wqkv = jnp.asarray(r.randn(C, 3 * C) * 0.03, jnp.float32)
    bqkv = jnp.asarray(r.randn(3 * C) * 0.03, jnp.float32)
    wproj = jnp.asarray(r.randn(C, C) * 0.03, jnp.float32)
    bproj = jnp.asarray(r.randn(C) * 0.03, jnp.float32)
    scale = (C // H) ** -0.5

    o1 = fused_attn_half_train(x, seeds, mask, lnw, lnb, wqkv, bqkv,
                               wproj, bproj, H, scale, EPS, p)
    o2 = fused_attn_half_train(x, seeds, mask, lnw, lnb, wqkv, bqkv,
                               wproj, bproj, H, scale, EPS, p)
    assert (np.asarray(o1) == np.asarray(o2)).all(), "non-deterministic"

    f = fused_attn_half(x, mask, lnw, lnb, wqkv, bqkv, wproj, bproj,
                        H, scale, EPS)
    keep = infer_keep(o1, x, f, p)
    rate = float(np.asarray(keep).mean())
    assert abs(rate - (1 - p)) < 0.01, f"keep rate {rate} vs {1 - p}"

    def twin(x, lnw, lnb, wqkv, bqkv, wproj, bproj):
        ft = _xla_twin(x, mask, lnw, lnb, wqkv, bqkv, wproj, bproj,
                       H, scale, EPS)
        return x + keep * ft / (1.0 - p)

    ref = twin(x, lnw, lnb, wqkv, bqkv, wproj, bproj)
    err_f = np.abs(np.asarray(o1, np.float32)
                   - np.asarray(ref, np.float32)).max()
    assert err_f < atol_fwd, f"fwd err {err_f}"

    def loss_k(x, lnw, lnb, wqkv, bqkv, wproj, bproj):
        o = fused_attn_half_train(x, seeds, mask, lnw, lnb, wqkv, bqkv,
                                  wproj, bproj, H, scale, EPS, p)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_t(x, lnw, lnb, wqkv, bqkv, wproj, bproj):
        return jnp.sum(twin(x, lnw, lnb, wqkv, bqkv, wproj,
                            bproj).astype(jnp.float32) ** 2)

    check_grads(loss_k, loss_t,
                (x, lnw, lnb, wqkv, bqkv, wproj, bproj),
                ["dx", "dlnw", "dlnb", "dwqkv", "dbqkv", "dwproj",
                 "dbproj"], atol_bwd)
    print(f"  attn OK B={B} S={S} C={C} p={p} (keep {rate:.3f}, "
          f"fwd err {err_f:.2e})")


def mlp_tail_case(B, S, C, p, atol_fwd, atol_bwd):
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    seeds = jnp.asarray(r.randint(0, 2 ** 31 - 1, (B,)), jnp.int32)
    lnw = jnp.asarray(1.0 + 0.1 * r.randn(C), jnp.float32)
    lnb = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    w1 = jnp.asarray(r.randn(C, 4 * C) * 0.03, jnp.float32)
    b1 = jnp.asarray(r.randn(4 * C) * 0.03, jnp.float32)
    w2 = jnp.asarray(r.randn(4 * C, C) * 0.03, jnp.float32)
    b2 = jnp.asarray(r.randn(C) * 0.03, jnp.float32)

    o1 = fused_mlp_half_train(x, seeds, lnw, lnb, w1, b1, w2, b2, p,
                              EPS, True)
    o2 = fused_mlp_half_train(x, seeds, lnw, lnb, w1, b1, w2, b2, p,
                              EPS, True)
    assert (np.asarray(o1) == np.asarray(o2)).all(), "non-deterministic"

    # same seeds -> same FIRST draw: the non-tail kernel yields the
    # pre-drop2 value f, and mask1 comes from emit_mask
    f, mask1 = _mlp_train_fwd_impl(x, seeds, lnw, lnb, w1, b1, w2, b2,
                                   p, EPS, emit_mask=True)
    keep2 = infer_keep(o1, x, f, p)
    rate = float(np.asarray(keep2).mean())
    assert abs(rate - (1 - p)) < 0.01, f"keep2 rate {rate} vs {1 - p}"

    def twin(x, lnw, lnb, w1, b1, w2, b2):
        ft = _mlp_train_twin(x, mask1, lnw, lnb, w1, b1, w2, b2, p, EPS)
        return x + keep2 * ft / (1.0 - p)

    ref = twin(x, lnw, lnb, w1, b1, w2, b2)
    err_f = np.abs(np.asarray(o1, np.float32)
                   - np.asarray(ref, np.float32)).max()
    assert err_f < atol_fwd, f"fwd err {err_f}"

    def loss_k(x, lnw, lnb, w1, b1, w2, b2):
        o = fused_mlp_half_train(x, seeds, lnw, lnb, w1, b1, w2, b2,
                                 p, EPS, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_t(x, lnw, lnb, w1, b1, w2, b2):
        return jnp.sum(twin(x, lnw, lnb, w1, b1, w2,
                            b2).astype(jnp.float32) ** 2)

    check_grads(loss_k, loss_t, (x, lnw, lnb, w1, b1, w2, b2),
                ["dx", "dlnw", "dlnb", "dw1", "db1", "dw2", "db2"],
                atol_bwd)
    print(f"  mlp tail OK B={B} S={S} C={C} p={p} (keep2 {rate:.3f}, "
          f"fwd err {err_f:.2e})")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on the TPU tunnel"
    # fp32 tolerances per validate_train_mlp_kernel.py: TPU fp32
    # matmuls are multi-pass bf16 MXU products scheduled differently
    # by Mosaic vs XLA.  p=0 cases are EXACT (keep=all, no mask
    # inference) and carry the tight tolerance; p>0 cases infer the
    # mask from (out-x) element proximity, and elements with |f|~0
    # can misclassify — their twin-grad residue shows up mostly in
    # dwproj/dw2 (attn^T gm contractions), hence the looser bound.
    attn_case(2, 241, 768, 12, 0.0, 2e-3, 5e-3)
    attn_case(2, 241, 768, 12, 0.1, 2e-3, 3e-2)
    attn_case(2, 128, 768, 12, 0.5, 2e-3, 3e-2)
    mlp_tail_case(2, 241, 768, 0.0, 2e-3, 5e-3)
    mlp_tail_case(2, 241, 768, 0.1, 2e-3, 3e-2)
    print("train attention kernel + MLP tail: all parity checks passed")
