"""Slope-timed micros of the fused half-block Pallas kernels.

Times each kernel (attn fwd / attn dx bwd / attn full bwd / mlp fwd /
mlp dx bwd / mlp train fwd / mlp train bwd) as ONE jitted program with
n chained calls, and prints achieved TF/s against each kernel's
EXECUTED matmul-flop model (recompute inside the bwd kernels counted),
so intra-kernel inefficiency is separated from algorithm cost.

  python scripts/profile_halfblock.py        # B=16 S=241 C=768
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import bench_prog

B = int(os.environ.get("PROF_B", "16"))
S = int(os.environ.get("PROF_S", "241"))
C = int(os.environ.get("PROF_C", "768"))
H = 12
C4 = 4 * C
SCALE = (C // H) ** -0.5
EPS = 1e-6
SP = (S + 127) // 128 * 128     # padded S the kernels run at


def flops_attn_fwd():
    # qkv + scores + PV + proj at S_pad
    return B * (2 * SP * C * 3 * C + 2 * H * SP * SP * (C // H) * 2
                + 2 * SP * C * C)


def flops_attn_dx():
    # recompute qkv+scores (PV DCE'd) + dattn/dp/dq/dk/dv/dy
    return B * (2 * SP * C * 3 * C + 2 * H * SP * SP * (C // H)
                + 2 * SP * C * C + 4 * 2 * H * SP * SP * (C // H)
                + 2 * SP * C * 3 * C)


def flops_attn_full_bwd():
    return flops_attn_dx() + B * 2 * H * SP * SP * (C // H)


def flops_mlp_fwd():
    return B * 2 * 2 * SP * C * C4


def flops_mlp_dx():
    return B * 3 * 2 * SP * C * C4      # recompute fc1 + da + dy


def flops_mlp_train_bwd():
    return B * 5 * 2 * SP * C * C4      # + in-kernel dW1/dW2


def timed(name, make_fn, flop_model, *args):
    per, n = bench_prog(make_fn, *args)
    tf = flop_model / per / 1e12
    print(f"  {name:16s} {per * 1e3:7.3f} ms  {tf:6.1f} TF/s "
          f"({tf / 197 * 100:4.1f}% of peak)  n={n}", flush=True)
    return per


def main():
    from rmcl_tpu.ops import pallas_block as PB

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    lnw = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.float32)
    bproj = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, C4)) * 0.02, jnp.float32)
    b1 = jnp.zeros((C4,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((C4, C)) * 0.02, jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    seeds = jnp.arange(B, dtype=jnp.int32)

    print(f"half-block kernel micros  B={B} S={S} (pad {SP}) C={C} "
          f"on {jax.devices()[0].device_kind}", flush=True)

    def chain(fn):
        """fn(x, i) -> x-like; returns make(n) -> jitted scalar prog."""
        def make(n):
            def prog(x0):
                def body(i, acc):
                    return fn(acc, i)
                out = jax.lax.fori_loop(0, n, body, x0)
                return jnp.sum(out.astype(jnp.float32))
            return jax.jit(prog)
        return make

    # ---- attn fwd
    timed("attn_fwd", chain(lambda a, i: PB.fused_attn_half(
        a, mask, lnw, lnb, wqkv, bqkv, wproj, bproj, H, SCALE, EPS)),
        flops_attn_fwd(), x)

    # ---- attn dx bwd (kernel alone, via the internal impl)
    timed("attn_dx_bwd", chain(lambda a, i: PB._dx_bwd_impl(
        x, mask, lnw, lnb, wqkv, bqkv, wproj, a, H, SCALE, EPS)),
        flops_attn_dx(), g)

    # ---- attn full bwd (dx output chained)
    timed("attn_full_bwd", chain(lambda a, i: PB._bwd_impl(
        x, mask, lnw, lnb, wqkv, bqkv, wproj, bproj, a, H, SCALE,
        EPS)[0]), flops_attn_full_bwd(), g)

    # ---- mlp fwd
    timed("mlp_fwd", chain(lambda a, i: PB.fused_mlp_half(
        a, lnw, lnb, w1, b1, w2, b2, EPS)), flops_mlp_fwd(), x)

    # ---- mlp dx bwd
    timed("mlp_dx_bwd", chain(lambda a, i: PB._mlp_dx_impl(
        x, lnw, lnb, w1, b1, w2, a, EPS)), flops_mlp_dx(), g)

    # ---- mlp train fwd (in-kernel dropout)
    timed("mlp_train_fwd", chain(lambda a, i: PB._mlp_train_fwd_impl(
        a, seeds, lnw, lnb, w1, b1, w2, b2, 0.1, EPS)),
        flops_mlp_fwd(), x)

    # ---- mlp train bwd (in-kernel dW accumulation)
    timed("mlp_train_bwd", chain(lambda a, i: PB._mlp_train_bwd_impl(
        x, seeds, lnw, lnb, w1, b1, w2, a, 0.1, EPS)[0]),
        flops_mlp_train_bwd(), g)


if __name__ == "__main__":
    main()
