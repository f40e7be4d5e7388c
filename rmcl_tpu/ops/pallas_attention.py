"""Pallas fused masked-attention kernel for TPU.

ViLT sequences are short (40 text + <=241 image tokens -> S ~= 281,
padded to a 128 multiple), so the WHOLE attention instance for one
sample — all H heads' Q, K, V plus the (H, S, S) score block — fits in
VMEM.  The kernel therefore processes one sample's 12 heads per grid
step as batched MXU matmuls with an in-register fp32 softmax:

    grid = (B,)       # few, fat steps: grid-step overhead amortised
    per step: scores = q(H,S,D) @ k(H,S,D)^T   (batched dot_general)
              probs  = softmax(scores + bias)   fp32, never leaves VMEM
              out    = probs @ v

This is the S^2-traffic killer: the XLA path materialises the
(B, H, S, S) scores and probs in HBM (~750us/call at B32 on v5e vs a
~35us roofline); here no S^2 tensor ever touches HBM.  An earlier
variant with grid=(B*H, S/128) lost to per-grid-step overhead (384
sequential tiny programs, ~980us) — fatter blocks win.

Backward is a second Pallas kernel with the same one-sample-per-step
layout: P is recomputed in VMEM from (q, k, bias), then
    dP = g @ v^T
    dS = P * (dP - rowsum(dP * P))        # softmax VJP
    dq = scale * dS @ k ;  dk = scale * dS^T @ q ;  dv = P^T @ g
so neither direction ever writes an S^2 tensor to HBM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmcl_tpu.ops.attention import mha_xla

_NEG_INF = -1e30
_S_ALIGN = 128


def _interpret() -> bool:
    """Interpreter mode (CPU tests): RMCL_PALLAS_INTERPRET=1."""
    return os.environ.get("RMCL_PALLAS_INTERPRET", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]            # (H, S, D)
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]      # (1, S) fp32, this sample's key-validity row

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale               # (H, S, S)
    scores = scores + bias[None, :, :]      # broadcast over heads+rows

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _fwd_impl(q, k, v, mask, scale: float):
    B, H, S, D = q.shape
    S_pad = _round_up(S, _S_ALIGN)

    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])

    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    grid = (B,)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, S_pad, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S_pad, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S_pad, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, S_pad, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S_pad * S_pad * D,
            bytes_accessed=4 * B * H * S_pad * D * q.dtype.itemsize,
            transcendentals=B * H * S_pad * S_pad,
        ),
        interpret=_interpret(),
    )(q, k, v, bias)

    return out[:, :, :S, :]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0]            # (H, S, D)
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    bias = bias_ref[0]      # (1, S)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None, :, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (H, S, S) fp32

    g32 = g.astype(jnp.float32)
    # dP = g @ v^T
    dp = jax.lax.dot_general(
        g32, v.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (H, S, S)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq_ref[0] = (scale * jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
    # dk = scale * dS^T @ q : contract over the query axis of dS
    dk_ref[0] = (scale * jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)).astype(dk_ref.dtype)
    # dv = P^T @ g : contract over the query axis of P
    dv_ref[0] = jax.lax.dot_general(
        p, g32,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _bwd_impl(q, k, v, mask, g, scale: float):
    B, H, S, D = q.shape
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        g = jnp.pad(g, pad)
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    blk = pl.BlockSpec((1, H, S_pad, D), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(B,),
        in_specs=[blk, blk, blk,
                  pl.BlockSpec((1, 1, S_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  blk],
        out_specs=(blk, blk, blk),
        out_shape=tuple(jax.ShapeDtypeStruct((B, H, S_pad, D), q.dtype)
                        for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * S_pad * S_pad * D,
            bytes_accessed=8 * B * H * S_pad * D * q.dtype.itemsize,
            transcendentals=B * H * S_pad * S_pad,
        ),
        interpret=_interpret(),
    )(q, k, v, bias, g)
    return dq[:, :, :S, :], dk[:, :, :S, :], dv[:, :, :S, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_masked_attention(q, k, v, mask, scale: float):
    """Fused forward + fused backward.  Shapes as `mha_xla`."""
    return _fwd_impl(q, k, v, mask, scale)


def _vjp_fwd(q, k, v, mask, scale):
    return _fwd_impl(q, k, v, mask, scale), (q, k, v, mask)


def _vjp_bwd(scale, res, g):
    q, k, v, mask = res
    if os.environ.get("RMCL_PALLAS_XLA_BWD", "0") == "1":
        _, pullback = jax.vjp(
            lambda q_, k_, v_: mha_xla(q_, k_, v_, mask, scale), q, k, v)
        dq, dk, dv = pullback(g)
    else:
        dq, dk, dv = _bwd_impl(q, k, v, mask, g, scale)
    return dq, dk, dv, None


flash_masked_attention.defvjp(_vjp_fwd, _vjp_bwd)
