"""Validate fused_mlp_half_train (in-kernel-dropout MLP half) on REAL TPU.

The Mosaic PRNG has no CPU/interpret lowering, so this kernel cannot be
covered by the CPU test suite — this script is its parity harness (run
on the axon tunnel; see .claude/skills/verify/SKILL.md):

  1. determinism: same seeds -> bit-identical output
  2. keep-rate of the emitted mask ~= 1 - p
  3. forward parity: kernel output == XLA twin fed the EMITTED mask
  4. backward parity: all 7 gradients == autodiff of the same twin
     (proves the bwd kernel regenerates the identical mask and that
     the in-VMEM dW1/dW2/db1/dlnw/dlnb accumulation is correct)

Usage: python scripts/validate_train_mlp_kernel.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rmcl_tpu.ops.pallas_block import (  # noqa: E402
    _mlp_train_fwd_impl, _mlp_train_twin, fused_mlp_half_train)


def run_case(B, S, C, dtype, p, atol_fwd, atol_bwd):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, S, C), dtype)
    seeds = jnp.asarray(r.randint(0, 2 ** 31 - 1, (B,)), jnp.int32)
    lnw = jnp.asarray(1.0 + 0.1 * r.randn(C), jnp.float32)
    lnb = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    w1 = jnp.asarray(r.randn(C, 4 * C) * 0.03, jnp.float32)
    b1 = jnp.asarray(r.randn(4 * C) * 0.03, jnp.float32)
    w2 = jnp.asarray(r.randn(4 * C, C) * 0.03, jnp.float32)
    b2 = jnp.asarray(r.randn(C) * 0.03, jnp.float32)
    eps = 1e-6

    # 1. determinism
    o1 = fused_mlp_half_train(x, seeds, lnw, lnb, w1, b1, w2, b2, p, eps)
    o2 = fused_mlp_half_train(x, seeds, lnw, lnb, w1, b1, w2, b2, p, eps)
    assert (np.asarray(o1) == np.asarray(o2)).all(), "non-deterministic"

    # 2-3. emitted mask -> keep rate + forward parity vs twin
    out, mask = _mlp_train_fwd_impl(x, seeds, lnw, lnb, w1, b1, w2, b2,
                                    p, eps, emit_mask=True)
    rate = float(np.asarray(mask, np.float32).mean())
    assert abs(rate - (1 - p)) < 0.01, f"keep rate {rate} vs {1 - p}"
    ref = _mlp_train_twin(x, mask, lnw, lnb, w1, b1, w2, b2, p, eps)
    err_f = np.abs(np.asarray(out, np.float32)
                   - np.asarray(ref, np.float32)).max()
    assert err_f < atol_fwd, f"fwd err {err_f}"
    assert (np.asarray(out) == np.asarray(o1)).all(), \
        "emit_mask variant changed the output"

    # 4. gradient parity (kernel bwd regenerates the mask; twin uses
    # the emitted one)
    def loss_k(x, lnw, lnb, w1, b1, w2, b2):
        o = fused_mlp_half_train(x, seeds, lnw, lnb, w1, b1, w2, b2,
                                 p, eps)
        return jnp.sum((o.astype(jnp.float32)) ** 2)

    def loss_t(x, lnw, lnb, w1, b1, w2, b2):
        o = _mlp_train_twin(x, mask, lnw, lnb, w1, b1, w2, b2, p, eps)
        return jnp.sum((o.astype(jnp.float32)) ** 2)

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(
        x, lnw, lnb, w1, b1, w2, b2)
    gt = jax.grad(loss_t, argnums=tuple(range(7)))(
        x, lnw, lnb, w1, b1, w2, b2)
    names = ["dx", "dlnw", "dlnb", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, gk, gt):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        err = np.abs(a - b).max() / scale
        assert err < atol_bwd, f"{n} rel err {err}"
    print(f"  OK B={B} S={S} C={C} {np.dtype(dtype).name} p={p} "
          f"(keep {rate:.3f}, fwd err {err_f:.2e})")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on the TPU tunnel"
    # fp32 atol 1e-3: on TPU, fp32 matmuls lower to multi-pass bf16 MXU
    # products and Mosaic/XLA choose pass structure independently —
    # observed diff ~2e-4 (production runs bf16 end-to-end anyway)
    run_case(2, 37, 256, jnp.float32, 0.1, 1e-3, 2e-3)
    run_case(4, 241, 768, jnp.bfloat16, 0.1, 0.15, 2e-2)
    run_case(2, 128, 768, jnp.bfloat16, 0.5, 0.15, 2e-2)
    print("fused_mlp_half_train: all parity checks passed")
