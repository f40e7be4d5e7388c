"""Pallas fused masked-attention kernel for TPU.

ViLT sequences are short (40 text + <=241 image tokens -> S ~= 281, padded
to a 128 multiple), so K and V for one (batch, head) fit comfortably in
VMEM.  The kernel therefore does a single-pass softmax per query block
instead of an online/flash accumulation: one MXU matmul for scores, a
row softmax in fp32 on the VPU, one MXU matmul with V.  The whole
(scores -> softmax -> out) pipeline never touches HBM, which is the win
over the unfused XLA path (scores tensor is B*H*S*S).

The kernel is written blockwise over the query axis so sequence growth
(e.g. context parallelism later) only changes the grid.

Backward currently recomputes attention with the XLA path under
`jax.custom_vjp` — correct, and the forward fusion is where the eval-time
(PGD inner loop, IRTR ranking) cycles go.  A Pallas backward is a later
optimisation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmcl_tpu.ops.attention import mha_xla

import os

# ViLT sequences are ~256 after padding: a single q-block per (batch,
# head) program minimises grid steps and loads K/V exactly once.
# Override for long-sequence experiments.
BLK_Q = int(os.environ.get("RMCL_PALLAS_BLK_Q", "256"))
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]            # (BLK_Q, D)
    k = k_ref[0]            # (S, D)
    v = v_ref[0]            # (S, D)
    bias = bias_ref[0]      # (1, S) fp32

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale               # (BLK_Q, S)
    scores = scores + bias  # broadcast (1, S)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _fwd_impl(q, k, v, mask, scale: float):
    B, H, S, D = q.shape
    S_pad = _round_up(S, BLK_Q)

    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])

    qf = q.reshape(B * H, S_pad, D)
    kf = k.reshape(B * H, S_pad, D)
    vf = v.reshape(B * H, S_pad, D)
    # (B, 1, S_pad): the singleton row dim makes the block shape equal the
    # array dims, satisfying Mosaic's (8, 128) tiling rule for 2-D tails
    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    grid = (B * H, S_pad // BLK_Q)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLK_Q, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), lambda bh, i: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK_Q, D), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, S_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S_pad * S_pad * D,
            bytes_accessed=(3 * B * H * S_pad * D + B * H * S_pad * D) * q.dtype.itemsize,
            transcendentals=B * H * S_pad * S_pad,
        ),
    )(qf, kf, vf, bias)

    out = out.reshape(B, H, S_pad, D)
    return out[:, :, :S, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_masked_attention(q, k, v, mask, scale: float):
    """Fused forward; XLA-recompute backward.  Shapes as `mha_xla`."""
    return _fwd_impl(q, k, v, mask, scale)


def _vjp_fwd(q, k, v, mask, scale):
    return _fwd_impl(q, k, v, mask, scale), (q, k, v, mask)


def _vjp_bwd(scale, res, g):
    q, k, v, mask = res
    _, pullback = jax.vjp(lambda q_, k_, v_: mha_xla(q_, k_, v_, mask, scale),
                          q, k, v)
    dq, dk, dv = pullback(g)
    return dq, dk, dv, None


flash_masked_attention.defvjp(_vjp_fwd, _vjp_bwd)
