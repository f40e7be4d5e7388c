"""Fused attention half-block Pallas kernel (TPU).

One kernel computes the ENTIRE pre-MLP half of a ViLT transformer block
(reference vision_transformer.py:335-376, 309-332):

    out = proj( attention( qkv( LN1(x) ) ) )          # pre-dropout,
                                                      # pre-residual

with grid=(B,): one sample per grid step.  Why fusing pays on v5e
(ROADMAP "Remaining perf levers" #1):

  * the (B, H, S, S) score/probability tensors NEVER touch HBM — the
    xla_bf16 path writes+reads them in bf16 every layer (~25 MB/layer
    at b16, S=256);
  * the qkv reshape/slice/transposes around the attention core become
    VMEM relayouts inside the kernel instead of HBM-visible ops;
  * the qkv/proj weights have constant BlockSpec index maps, so Mosaic
    keeps them VMEM-resident across all B grid steps (loaded from HBM
    once per layer call, not per sample);
  * LN1's fp32 round trip fuses into the same pass.

The matmuls are MXU-friendly: qkv is (S, C) @ (C, 3C) with K=768 (full
128-lane contraction, unlike the D=64-contraction per-head flash
layout), proj is (S, C) @ (C, C).

Backward: custom_vjp whose bwd is ``jax.vjp`` of an XLA twin computing
identical math (bf16-S² attention) — the S² tensors hit HBM in the
backward only.  Under full remat the forward kernel runs twice per
layer (fwd + replay) and the XLA bwd once, so the fusion win applies to
~2/3 of the attention executions; a Pallas bwd is the follow-up lever.

Numerics: LN in fp32, matmul accumulation fp32, activations bf16 —
parity with the XLA block path is bf16-rounding-level
(tests/test_pallas.py::test_fused_block_matches_xla).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_S_ALIGN = 128


def _interpret() -> bool:
    return os.environ.get("RMCL_PALLAS_INTERPRET", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------------ kernel
def _attn_fwd_math(x, bias, lnw, lnb, wqkv, bqkv, wproj, bproj,
                   H: int, scale: float, eps: float):
    """Shared per-sample forward math (traced inside the det AND train
    forward kernels): LN1 + qkv + attention + proj.  Returns
    (out, qkv_T) — qkv_T is the (3C, S) transposed qkv for the
    save_qkv path (Mosaic DCEs it when unwritten)."""
    S, C = x.shape
    D = C // H

    # LN1 in fp32 (models/layers.py:layer_norm)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps)) * lnw + lnb
    y = y.astype(x.dtype)

    # qkv projection: (S, C) @ (C, 3C), full-K MXU contraction
    qkv = jnp.dot(y, wqkv,
                  preferred_element_type=jnp.float32).astype(x.dtype)
    qkv = qkv + bqkv.astype(x.dtype)

    # head split WITHOUT lane-dim reshapes (Mosaic rejects splitting the
    # minor dim): transpose to (3C, S), then split the SUBLANE dim into
    # (3, H, D, S) — q/k/v land in (H, D, S) layout
    qkv_T = qkv.T                       # (3C, S)
    qkv_t = qkv_T.reshape(3, H, D, S)
    q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]

    # scores[h,s,t] = sum_d q[h,d,s] k[h,d,t]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale     # (H, S, S) fp32
    scores = scores + bias[None, :, :]                  # key-validity row

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    # out[h,d,s] = sum_t v[h,d,t] p[h,s,t]  (K = S: full MXU contraction)
    attn = jax.lax.dot_general(
        v, p.astype(x.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)  # (H, D, S)
    # (H, D, S) -> sublane-merge (C, S) -> transpose (S, C)
    attn = attn.reshape(C, S).T

    out = jnp.dot(attn, wproj,
                  preferred_element_type=jnp.float32).astype(x.dtype)
    return out + bproj.astype(x.dtype), qkv_T


def _half_block_kernel(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_ref,
                       bqkv_ref, wproj_ref, bproj_ref, o_ref,
                       qkv_out_ref=None,
                       *, H: int, scale: float, eps: float,
                       residual: bool = False):
    x = x_ref[0]                        # (S, C) activation dtype
    out, qkv_T = _attn_fwd_math(
        x, bias_ref[0], lnw_ref[:], lnb_ref[:], wqkv_ref[:],
        bqkv_ref[:], wproj_ref[:], bproj_ref[:], H, scale, eps)
    if qkv_out_ref is not None:
        # saved for the backward kernel (save_qkv=True): skips the qkv
        # recompute matmul there — already in the (3C, S) bwd layout
        qkv_out_ref[0] = qkv_T
    # post-attention residual fused in (x is already VMEM-resident) —
    # saves the separate XLA add's full-tensor HBM round trip per block
    o_ref[0] = (x + out) if residual else out


def _fwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
              H: int, scale: float, eps: float,
              residual: bool = False, save_qkv: bool = False):
    B, S, C = x.shape
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    # weight HBM residency in the activation dtype (models/layers.py
    # linear casts the fp32 master weights at use)
    dt = x.dtype
    wqkv_c, wproj_c = wqkv.astype(dt), wproj.astype(dt)

    const2 = lambda b: (0, 0)  # noqa: E731  (weights: VMEM-resident)

    out_specs = pl.BlockSpec((1, S_pad, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, S_pad, C), x.dtype)
    if save_qkv:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 3 * C, S_pad), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, 3 * C, S_pad), x.dtype))

    out = pl.pallas_call(
        functools.partial(_half_block_kernel, H=H, scale=scale, eps=eps,
                          residual=residual),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S_pad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S_pad * C * (4 * C) + 4 * B * (C // 1) * S_pad * S_pad,
            bytes_accessed=(2 * B * S_pad * C + 4 * C * C) * x.dtype.itemsize,
            transcendentals=B * (C // (C // 12)) * S_pad * S_pad,
        ),
        # fp32 activations (validation harness) exceed the 16 MB
        # default scoped limit; bf16 production fits either way
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, bias, ln_w, ln_b, wqkv_c, bqkv, wproj_c, bproj)
    if save_qkv:
        return out[0][:, :S, :], out[1]
    return out[:, :S, :]


# ------------------------------------------------------------- XLA twin
def _xla_twin(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
              H: int, scale: float, eps: float):
    """Same math in XLA ops — used for the backward pass (its vjp) and
    as the CPU/parity reference."""
    from rmcl_tpu.ops.attention import mha_xla_bf16, mha_xla
    B, S, C = x.shape
    D = C // H
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = ((xc * jax.lax.rsqrt(var + eps)) * ln_w + ln_b).astype(x.dtype)
    qkv = (jnp.dot(y, wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
           + bqkv.astype(x.dtype))
    qkv = qkv.reshape(B, S, 3, H, D)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    mha = mha_xla_bf16 if x.dtype == jnp.bfloat16 else mha_xla
    attn = mha(q, k, v, mask, scale)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, C)
    out = jnp.dot(attn, wproj.astype(x.dtype),
                  preferred_element_type=jnp.float32).astype(x.dtype)
    return out + bproj.astype(x.dtype)


# ---------------------------------------------------------- bwd kernel
def _attn_bwd_math(x, bias, lnw, lnb, wqkv, wproj, bqkv, g,
                   H: int, scale: float, eps: float, qkv_t_saved=None):
    """Shared per-sample backward math (traced inside both bwd kernels):
    recomputes y/qkv/p remat-style, then the data gradients.  Returns
    everything either kernel variant may need; Mosaic dead-code
    -eliminates the unwritten results in the dx-only kernel.

    qkv_t_saved: the fwd kernel's (3C, S) qkv (bit-identical bf16
    layout saved via save_qkv=True) — skips the 2·S·C·3C-FLOP qkv
    recompute matmul; HBM cost of the save is below the MXU cost of
    the recompute at ViLT shapes (ROADMAP round-3)."""
    S, C = x.shape
    D = C // H

    # ---- recompute forward up to p (identical math to _half_block_kernel)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = xhat * lnw + lnb
    y = y.astype(x.dtype)

    if qkv_t_saved is not None:
        qkv_t = qkv_t_saved.reshape(3, H, D, S)
    else:
        qkv = jnp.dot(y, wqkv,
                      preferred_element_type=jnp.float32).astype(x.dtype)
        qkv = qkv + bqkv.astype(x.dtype)
        qkv_t = qkv.T.reshape(3, H, D, S)
    q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None, :, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)       # (H, S, S) fp32
    pb = p.astype(x.dtype)

    # attn_out (pre-proj) for dWproj: (H, D, S) -> (C, S) -> (S, C)
    att = jax.lax.dot_general(
        v, pb, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    attn = att.reshape(C, S).T

    # ---- backward
    # dattn = g @ Wproj^T; transpose-free: (C,S) layout via (Wp @ g^T)
    dattn_t = jnp.dot(wproj, g.T,
                      preferred_element_type=jnp.float32
                      ).astype(x.dtype)              # (C, S)
    datt = dattn_t.reshape(H, D, S)

    # dp[h,s,t] = sum_d datt[h,d,s] v[h,d,t]
    dp = jax.lax.dot_general(
        datt, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (H, S, S) fp32
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
          * scale).astype(x.dtype)                   # (H, S, S)

    # dq[h,d,s] = sum_t k[h,d,t] ds[h,s,t]   (K = S contraction)
    dq = jax.lax.dot_general(
        k, ds, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)  # (H, D, S)
    # dk[h,d,t] = sum_s q[h,d,s] ds[h,s,t]
    dk = jax.lax.dot_general(
        q, ds, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dv[h,d,t] = sum_s datt[h,d,s] p[h,s,t]
    dv = jax.lax.dot_general(
        datt, pb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)

    # (3, H, D, S) -> sublane-merge (3C, S) -> (S, 3C)
    dqkv = jnp.concatenate(
        [dq[None], dk[None], dv[None]], axis=0).reshape(3 * C, S).T

    # dy = dqkv @ Wqkv^T, transpose-free: (Wqkv @ dqkv^T) = (C, S)
    dy_t = jnp.dot(wqkv, dqkv.T,
                   preferred_element_type=jnp.float32)        # (C, S)
    dy = dy_t.T                                               # (S, C) fp32

    # LN backward (fp32)
    dyh = dy * lnw
    mean_dyh = jnp.mean(dyh, axis=-1, keepdims=True)
    mean_dyh_x = jnp.mean(dyh * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyh - mean_dyh - xhat * mean_dyh_x)

    # per-sample LN weight-grad partials (summed over B by XLA)
    dlnw = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dlnb = jnp.sum(dy, axis=0, keepdims=True)
    return dx, dqkv, y, attn, dlnw, dlnb


def _half_block_bwd_kernel(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_ref,
                           wproj_ref, bqkv_ref, g_ref,
                           dx_ref, dqkv_ref, y_ref, attn_ref,
                           dlnw_ref, dlnb_ref,
                           *, H: int, scale: float, eps: float):
    """Full backward: dx + the intermediates weight grads contract over
    (y, attn_out, dqkv; the three (B·S)-contraction matmuls run in XLA
    outside).  Used by the training-path fused_attn_half."""
    dx, dqkv, y, attn, dlnw, dlnb = _attn_bwd_math(
        x_ref[0], bias_ref[0], lnw_ref[:], lnb_ref[:], wqkv_ref[:],
        wproj_ref[:], bqkv_ref[:], g_ref[0], H, scale, eps)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dqkv_ref[0] = dqkv
    y_ref[0] = y
    attn_ref[0] = attn
    dlnw_ref[0] = dlnw
    dlnb_ref[0] = dlnb


def _half_block_dx_kernel(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_ref,
                          wproj_ref, bqkv_ref, g_ref, dx_ref,
                          *, H: int, scale: float, eps: float,
                          residual: bool = False):
    """dx-only backward: skips the (B, S, 5C) HBM writes of the
    weight-grad intermediates — for deterministic callers that only
    differentiate to the input (PGD, greedy grad pass).  With the
    fused residual (out = x + f(x)) the identity branch's gradient is
    added in VMEM (dx += g)."""
    dx, *_ = _attn_bwd_math(
        x_ref[0], bias_ref[0], lnw_ref[:], lnb_ref[:], wqkv_ref[:],
        wproj_ref[:], bqkv_ref[:], g_ref[0], H, scale, eps)
    if residual:
        dx = dx + g_ref[0].astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _half_block_dx_saved_kernel(x_ref, bias_ref, lnw_ref, lnb_ref,
                                wqkv_ref, wproj_ref, bqkv_ref, g_ref,
                                qkvt_ref, dx_ref,
                                *, H: int, scale: float, eps: float,
                                residual: bool = False):
    """_half_block_dx_kernel consuming the forward-saved (3C, S) qkv —
    skips the qkv recompute matmul (save_qkv=True path)."""
    dx, *_ = _attn_bwd_math(
        x_ref[0], bias_ref[0], lnw_ref[:], lnb_ref[:], wqkv_ref[:],
        wproj_ref[:], bqkv_ref[:], g_ref[0], H, scale, eps,
        qkv_t_saved=qkvt_ref[0])
    if residual:
        dx = dx + g_ref[0].astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj, g,
              H: int, scale: float, eps: float):
    B, S, C = x.shape
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, S_pad - S), (0, 0)])
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]
    dt = x.dtype
    wqkv_c, wproj_c = wqkv.astype(dt), wproj.astype(dt)

    const2 = lambda b: (0, 0)  # noqa: E731
    row = lambda b: (b, 0, 0)  # noqa: E731

    dx, dqkv, y, attn, dlnw_b, dlnb_b = pl.pallas_call(
        functools.partial(_half_block_bwd_kernel, H=H, scale=scale,
                          eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, 3 * C), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S_pad, C), x.dtype),
            jax.ShapeDtypeStruct((B, S_pad, 3 * C), x.dtype),
            jax.ShapeDtypeStruct((B, S_pad, C), x.dtype),
            jax.ShapeDtypeStruct((B, S_pad, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * S_pad * C * 4 * C,
            bytes_accessed=8 * B * S_pad * C * x.dtype.itemsize,
            transcendentals=B * 12 * S_pad * S_pad,
        ),
        # peak ~20 MB (weights + three fp32 S² tensors live at once):
        # above the 16 MB default scoped limit, within v5e's physical
        # VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, bias, ln_w, ln_b, wqkv_c, wproj_c, bqkv, g)

    # weight grads: three batched-token contractions (K = B·S_pad, full
    # MXU) + bias sums — tiny next to the kernel work
    g2 = g.reshape(B * S_pad, C).astype(jnp.float32)
    dwproj = attn.reshape(B * S_pad, C).astype(jnp.float32).T @ g2
    dbproj = jnp.sum(g2, axis=0)
    dqkv2 = dqkv.reshape(B * S_pad, 3 * C).astype(jnp.float32)
    dwqkv = y.reshape(B * S_pad, C).astype(jnp.float32).T @ dqkv2
    dbqkv = jnp.sum(dqkv2, axis=0)
    dlnw = jnp.sum(dlnw_b[:, 0, :], axis=0)
    dlnb = jnp.sum(dlnb_b[:, 0, :], axis=0)
    return (dx[:, :S, :], dlnw, dlnb, dwqkv, dbqkv, dwproj, dbproj)


def _dx_bwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, g,
                 H: int, scale: float, eps: float,
                 residual: bool = False, qkv_saved=None):
    B, S, C = x.shape
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, S_pad - S), (0, 0)])
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]
    dt = x.dtype
    wqkv_c, wproj_c = wqkv.astype(dt), wproj.astype(dt)

    const2 = lambda b: (0, 0)  # noqa: E731
    row = lambda b: (b, 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, S_pad), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * C,), lambda b: (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
    ]
    args = [x, bias, ln_w, ln_b, wqkv_c, wproj_c, bqkv, g]
    if qkv_saved is not None:
        kern = _half_block_dx_saved_kernel
        in_specs.append(pl.BlockSpec((1, 3 * C, S_pad), row,
                                     memory_space=pltpu.VMEM))
        args.append(qkv_saved)
    else:
        kern = _half_block_dx_kernel

    dx = pl.pallas_call(
        functools.partial(kern, H=H, scale=scale,
                          eps=eps, residual=residual),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S_pad, C), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S_pad, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * S_pad * C * 4 * C,
            bytes_accessed=3 * B * S_pad * C * x.dtype.itemsize,
            transcendentals=B * 12 * S_pad * S_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    return dx[:, :S, :]


# ----------------------------------------------------- MLP half kernel
def _mlp_block_b(B: int) -> int:
    """Samples per MLP grid step (env RMCL_MLP_BLOCK_B, default 1).
    Every op in the MLP kernels is row-independent, so packing BB
    samples per grid step just grows the matmul M dimension
    (BB * S_pad rows); measured at ViLT-B shapes BB=2 LOSES at step
    level (175.6 vs 171.0 ms b16 — the doubled per-step working set
    costs more pipelining overlap than the larger M gains), so the
    default stays 1; the knob remains for other shapes.  Clamped to a
    divisor of B."""
    bb = int(os.environ.get("RMCL_MLP_BLOCK_B", "1"))
    while bb > 1 and B % bb:
        bb //= 2
    return max(bb, 1)


def _erf32(x):
    """erf for fp32 in-kernel use — Mosaic lowers neither erf nor erfc.
    Abramowitz & Stegun 7.1.26 rational approximation: max abs error
    1.5e-7, ~50x below bf16 rounding at gelu scales; only needs exp."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))
def _mlp_half_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                     b2_ref, o_ref, h_out_ref=None, *, eps: float,
                     residual: bool = False):
    """LN2 + fc1 + exact-erf gelu + fc2 for one sample, weights
    VMEM-resident across the B grid.  The (S, 4C) intermediate never
    touches HBM (the XLA path writes+reads it between the two matmuls,
    ~25 MB/layer at b16 S=256)."""
    x = x_ref[0]                        # (S, C)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = ((xc * jax.lax.rsqrt(var + eps)) * lnw_ref[:] + lnb_ref[:]
         ).astype(x.dtype)
    h = jnp.dot(y, w1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1_ref[:].astype(x.dtype)
    if h_out_ref is not None:
        # saved for the backward kernel (save_h=True): skips the fc1
        # recompute matmul there
        h_out_ref[0] = h
    # exact-erf gelu (models/layers.py:gelu) in fp32 via _erf32
    h32 = h.astype(jnp.float32)
    a = (0.5 * h32 * (1.0 + _erf32(h32 * (2.0 ** -0.5)))
         ).astype(x.dtype)
    out = jnp.dot(a, w2_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    out = out + b2_ref[:].astype(x.dtype)
    o_ref[0] = (x + out) if residual else out


def _mlp_fwd_impl(x, ln_w, ln_b, w1, b1, w2, b2, eps: float,
                  residual: bool = False, save_h: bool = False):
    B, S, C = x.shape
    C4 = w1.shape[1]
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        # padded rows are junk (LN of zeros) and sliced off below; no
        # row mixes with another, so the real rows are unaffected
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
    dt = x.dtype
    w1_c, w2_c = w1.astype(dt), w2.astype(dt)
    const2 = lambda b: (0, 0)  # noqa: E731  (weights: VMEM-resident)
    BB = _mlp_block_b(B)
    x = x.reshape(B // BB, BB * S_pad, C)

    out_specs = pl.BlockSpec((1, BB * S_pad, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B // BB, BB * S_pad, C), x.dtype)
    if save_h:
        out_specs = (out_specs,
                     pl.BlockSpec((1, BB * S_pad, C4),
                                  lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B // BB, BB * S_pad, C4),
                                          x.dtype))

    out = pl.pallas_call(
        functools.partial(_mlp_half_kernel, eps=eps, residual=residual),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((1, BB * S_pad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S_pad * C * C4,
            bytes_accessed=(2 * B * S_pad * C + 2 * C * C4)
            * x.dtype.itemsize,
            transcendentals=B * S_pad * C4,
        ),
        # weights (~9.4 MB bf16 at ViLT-B) + the (S, 4C) intermediates
        # exceed the 16 MB default scoped limit; within v5e's VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, ln_w, ln_b, w1_c, b1, w2_c, b2)
    if save_h:
        return out[0].reshape(B, S_pad, C)[:, :S, :], out[1]
    return out.reshape(B, S_pad, C)[:, :S, :]


def _mlp_dx_saved_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, w2_ref,
                         b1_ref, g_ref, h_ref, dx_ref, *, eps: float,
                         residual: bool = False):
    """_mlp_dx_kernel consuming the forward-saved h (save_h=True) —
    positional wrapper so the extra INPUT precedes the output ref."""
    _mlp_dx_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, w2_ref, b1_ref,
                   g_ref, dx_ref, h_ref=h_ref, eps=eps,
                   residual=residual)


def _mlp_dx_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, w2_ref, b1_ref,
                   g_ref, dx_ref, h_ref=None, *, eps: float,
                   residual: bool = False):
    """Per-sample dx-only backward: recomputes y/h in VMEM (remat-style)
    then walks the chain back — the (S, 4C) intermediates never touch
    HBM in either direction.  Weight grads are NOT computed here; the
    custom_vjp derives them from a separate XLA twin that XLA dead-code
    -eliminates whenever only input grads are requested (PGD
    attacks/pgd.py and the greedy commit-loop grad pass — the only
    production paths that differentiate a deterministic forward).

    h_ref: the forward-saved pre-gelu fc1 output (save_h=True) —
    skips the fc1 recompute matmul."""
    x = x_ref[0]                        # (S, C)
    g = g_ref[0]
    # ---- recompute forward to h (identical math to _mlp_half_kernel)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    lnw = lnw_ref[:]
    y = (xhat * lnw + lnb_ref[:]).astype(x.dtype)
    if h_ref is not None:
        h = h_ref[0]
    else:
        h = jnp.dot(y, w1_ref[:],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        h = h + b1_ref[:].astype(x.dtype)

    # ---- backward
    # da = g @ W2^T, transpose-free: (W2 @ g^T) = (4C, S)
    da_t = jnp.dot(w2_ref[:], g.T,
                   preferred_element_type=jnp.float32)        # (4C, S)
    # exact-erf gelu'(h) = Phi(h) + h * phi(h), fp32 (_erf32: Mosaic
    # has no erf primitive)
    h32 = h.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf32(h32 * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * h32 * h32) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    dh = (da_t.T * (cdf + h32 * pdf)).astype(x.dtype)         # (S, 4C)
    # dy = dh @ W1^T, transpose-free: (W1 @ dh^T) = (C, S)
    dy = jnp.dot(w1_ref[:], dh.T,
                 preferred_element_type=jnp.float32).T        # (S, C) fp32
    # LN backward (fp32)
    dyh = dy * lnw
    mean_dyh = jnp.mean(dyh, axis=-1, keepdims=True)
    mean_dyh_x = jnp.mean(dyh * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyh - mean_dyh - xhat * mean_dyh_x)
    if residual:
        dx = dx + g.astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _mlp_dx_impl(x, ln_w, ln_b, w1, b1, w2, g, eps: float,
                 residual: bool = False, h_saved=None):
    B, S, C = x.shape
    C4 = w1.shape[1]
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, S_pad - S), (0, 0)])
    dt = x.dtype
    w1_c, w2_c = w1.astype(dt), w2.astype(dt)
    const2 = lambda b: (0, 0)  # noqa: E731
    row = lambda b: (b, 0, 0)  # noqa: E731
    BB = _mlp_block_b(B)
    x = x.reshape(B // BB, BB * S_pad, C)
    g = g.reshape(B // BB, BB * S_pad, C)

    in_specs = [
        pl.BlockSpec((1, BB * S_pad, C), row,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C4), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((C4, C), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((C4,), lambda b: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BB * S_pad, C), row,
                     memory_space=pltpu.VMEM),
    ]
    args = [x, ln_w, ln_b, w1_c, w2_c, b1, g]
    if h_saved is not None:
        kern = _mlp_dx_saved_kernel
        in_specs.append(pl.BlockSpec((1, BB * S_pad, C4), row,
                                     memory_space=pltpu.VMEM))
        args.append(h_saved)
    else:
        kern = _mlp_dx_kernel

    dx = pl.pallas_call(
        functools.partial(kern, eps=eps, residual=residual),
        grid=(B // BB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BB * S_pad, C), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // BB, BB * S_pad, C),
                                       x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * S_pad * C * C4,
            bytes_accessed=(3 * B * S_pad * C + 2 * C * C4)
            * x.dtype.itemsize,
            transcendentals=2 * B * S_pad * C4,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    return dx.reshape(B, S_pad, C)[:, :S, :]


# ------------------------------------------------ MLP train kernel
def _keep_threshold(p: float) -> int:
    """uint32 threshold T such that P(bits >= T) = 1 - p."""
    return min(int(round(p * 2.0 ** 32)), 2 ** 32 - 1)


def _mlp_train_kernel(seed_ref, x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, o_ref, *, p: float, eps: float,
                      mask_ref=None, tail: bool = False):
    """LN2 + fc1 + gelu + in-kernel inverted dropout + fc2 for one
    sample.  The dropout mask comes from the Mosaic per-core PRNG
    seeded with seed_ref[0] (deterministic per seed — the backward
    kernel reseeds and regenerates the identical mask), so the (S, 4C)
    intermediates AND the mask never touch HBM.  RNG stream therefore
    differs from the XLA path's threefry/rbg (PARITY #15 precedent:
    dropout impls may own their stream).

    tail=True additionally applies the post-fc2 dropout (the block's
    rngs[2] dropout, reference vision_transformer.py:372 drop2) from
    the CONTINUED PRNG stream and adds the residual: o = x + drop_p(f).
    Both masks are regenerated in the backward by reseeding once and
    drawing in the same order."""
    x = x_ref[0]                        # (S, C)
    pltpu.prng_seed(seed_ref[pl.program_id(0)])
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits((x.shape[0], w1_ref.shape[1])),
        jnp.uint32)
    keep = bits >= jnp.uint32(_keep_threshold(p))
    if tail:
        bits2 = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(x.shape), jnp.uint32)
        keep2 = bits2 >= jnp.uint32(_keep_threshold(p))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = ((xc * jax.lax.rsqrt(var + eps)) * lnw_ref[:] + lnb_ref[:]
         ).astype(x.dtype)
    h = jnp.dot(y, w1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1_ref[:].astype(x.dtype)
    h32 = h.astype(jnp.float32)
    a = 0.5 * h32 * (1.0 + _erf32(h32 * (2.0 ** -0.5)))

    a_d = jnp.where(keep, a * (1.0 / (1.0 - p)), 0.0).astype(x.dtype)
    if mask_ref is not None:            # debug/parity variant
        mask_ref[0] = keep.astype(x.dtype)

    out = jnp.dot(a_d, w2_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    out = out + b2_ref[:].astype(x.dtype)
    if tail:
        out = jnp.where(keep2, out * (1.0 / (1.0 - p)),
                        0.0).astype(x.dtype)
        out = x + out
    o_ref[0] = out


def _mlp_train_bwd_kernel(seed_ref, x_ref, lnw_ref, lnb_ref, w1_ref,
                          b1_ref, w2_ref, g_ref,
                          dx_ref, dw1_ref, dw2_ref, db1_ref,
                          dlnw_ref, dlnb_ref, db2_ref=None,
                          *, p: float, eps: float, tail: bool = False):
    """Full backward with in-kernel weight-grad ACCUMULATION across the
    B grid (constant out index maps keep dW1/dW2/db1/dlnw/dlnb
    VMEM-resident; Mosaic writes them back once) — nothing (S, 4C)-
    shaped ever reaches HBM.  The dropout mask is regenerated by
    reseeding the same per-sample seed.

    tail=True mirrors the forward's fused post-fc2 dropout + residual:
    the upstream cotangent for f is keep2·g/(1-p); dx gains the
    identity branch's +g; db2 contracts the masked cotangent so it
    moves in-kernel (db2_ref)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        if tail:
            db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[0]                        # (S, C)
    g = g_ref[0]
    inv = 1.0 / (1.0 - p)
    # ---- regenerate the PRNG stream (same seed + draw order as fwd)
    pltpu.prng_seed(seed_ref[pl.program_id(0)])
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits((x.shape[0], w1_ref.shape[1])),
        jnp.uint32)
    keep = bits >= jnp.uint32(_keep_threshold(p))
    if tail:
        bits2 = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(x.shape), jnp.uint32)
        keep2 = bits2 >= jnp.uint32(_keep_threshold(p))
        gf = jnp.where(keep2, g.astype(jnp.float32) * inv,
                       0.0).astype(x.dtype)     # cotangent into fc2+b2
    else:
        gf = g
    # ---- recompute forward (identical math)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    lnw = lnw_ref[:]
    y = (xhat * lnw + lnb_ref[:]).astype(x.dtype)
    h = jnp.dot(y, w1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1_ref[:].astype(x.dtype)
    h32 = h.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf32(h32 * (2.0 ** -0.5)))
    a = h32 * cdf
    a_d = jnp.where(keep, a * inv, 0.0).astype(x.dtype)

    # ---- backward
    # da_d = gf @ W2^T, transpose-free: (W2 @ gf^T) = (4C, S)
    da_d_t = jnp.dot(w2_ref[:], gf.T,
                     preferred_element_type=jnp.float32)      # (4C, S)
    da = jnp.where(keep, da_d_t.T * inv, 0.0)                 # (S,4C) f32
    # gelu'(h) = Phi(h) + h * phi(h)
    pdf = jnp.exp(-0.5 * h32 * h32) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    dh = (da * (cdf + h32 * pdf)).astype(x.dtype)             # (S, 4C)
    # dy = dh @ W1^T, transpose-free: (W1 @ dh^T) = (C, S)
    dy = jnp.dot(w1_ref[:], dh.T,
                 preferred_element_type=jnp.float32).T        # (S, C) f32
    # LN backward (fp32)
    dyh = dy * lnw
    mean_dyh = jnp.mean(dyh, axis=-1, keepdims=True)
    mean_dyh_x = jnp.mean(dyh * xhat, axis=-1, keepdims=True)
    dx = rstd * (dyh - mean_dyh - xhat * mean_dyh_x)
    if tail:
        dx = dx + g.astype(jnp.float32)         # residual identity branch
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # ---- weight-grad accumulation (fp32, K = S contractions)
    dw1_ref[...] += jax.lax.dot_general(
        y, dh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (C, 4C)
    dw2_ref[...] += jax.lax.dot_general(
        a_d, gf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (4C, C)
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0,
                            keepdims=True)
    dlnw_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    if tail:
        db2_ref[...] += jnp.sum(gf.astype(jnp.float32), axis=0,
                                keepdims=True)


def _mlp_train_fwd_impl(x, seeds, ln_w, ln_b, w1, b1, w2, b2,
                        p: float, eps: float, emit_mask: bool = False,
                        tail: bool = False):
    B, S, C = x.shape
    C4 = w1.shape[1]
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
    dt = x.dtype
    w1_c, w2_c = w1.astype(dt), w2.astype(dt)
    const2 = lambda b: (0, 0)  # noqa: E731
    BB = _mlp_block_b(B)
    x = x.reshape(B // BB, BB * S_pad, C)
    seeds = seeds[::BB]                  # one PRNG stream per grid step

    out_shapes = [jax.ShapeDtypeStruct((B // BB, BB * S_pad, C),
                                       x.dtype)]
    out_specs = [pl.BlockSpec((1, BB * S_pad, C), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    if emit_mask:
        out_shapes.append(jax.ShapeDtypeStruct(
            (B // BB, BB * S_pad, C4), x.dtype))
        out_specs.append(pl.BlockSpec((1, BB * S_pad, C4),
                                      lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
    kern = functools.partial(_mlp_train_kernel, p=p, eps=eps, tail=tail)
    if emit_mask:
        def kern(seed_ref, x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
                 w2_ref, b2_ref, o_ref, mask_ref):
            _mlp_train_kernel(seed_ref, x_ref, lnw_ref, lnb_ref, w1_ref,
                              b1_ref, w2_ref, b2_ref, o_ref, p=p,
                              eps=eps, mask_ref=mask_ref, tail=tail)
    res = pl.pallas_call(
        kern,
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((B // BB,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BB * S_pad, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if emit_mask else out_specs[0],
        out_shape=out_shapes if emit_mask else out_shapes[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S_pad * C * C4,
            bytes_accessed=(2 * B * S_pad * C + 2 * C * C4)
            * x.dtype.itemsize,
            transcendentals=2 * B * S_pad * C4,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(seeds, x, ln_w, ln_b, w1_c, b1, w2_c, b2)
    if emit_mask:
        return (res[0].reshape(B, S_pad, C)[:, :S, :],
                res[1].reshape(B, S_pad, C4)[:, :S, :])
    return res.reshape(B, S_pad, C)[:, :S, :]


def _mlp_train_bwd_impl(x, seeds, ln_w, ln_b, w1, b1, w2, g,
                        p: float, eps: float, tail: bool = False):
    B, S, C = x.shape
    C4 = w1.shape[1]
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, S_pad - S), (0, 0)])
    dt = x.dtype
    w1_c, w2_c = w1.astype(dt), w2.astype(dt)
    const2 = lambda b: (0, 0)  # noqa: E731
    row = lambda b: (b, 0, 0)  # noqa: E731
    BB = _mlp_block_b(B)
    x = x.reshape(B // BB, BB * S_pad, C)
    g = g.reshape(B // BB, BB * S_pad, C)
    seeds = seeds[::BB]                  # matches the fwd stream

    out_specs = [
        pl.BlockSpec((1, BB * S_pad, C), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C4), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((C4, C), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C4), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B // BB, BB * S_pad, C), x.dtype),
        jax.ShapeDtypeStruct((C, C4), jnp.float32),
        jax.ShapeDtypeStruct((C4, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C4), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    ]
    if tail:
        out_specs.append(pl.BlockSpec((1, C), lambda b: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, C), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_mlp_train_bwd_kernel, p=p, eps=eps,
                          tail=tail),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((B // BB,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BB * S_pad, C), row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C4,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB * S_pad, C), row,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * S_pad * C * C4,
            bytes_accessed=(3 * B * S_pad * C + 4 * C * C4)
            * x.dtype.itemsize,
            transcendentals=3 * B * S_pad * C4,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(seeds, x, ln_w, ln_b, w1_c, b1, w2_c, g)
    dx, dw1, dw2, db1, dlnw, dlnb = res[:6]
    db2 = (res[6][0] if tail
           else jnp.sum(g.astype(jnp.float32), axis=(0, 1)))
    return (dx.reshape(B, S_pad, C)[:, :S, :], dlnw[0], dlnb[0], dw1,
            db1[0], dw2, db2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_mlp_half_train(x, seeds, ln_w, ln_b, w1, b1, w2, b2,
                         p: float, eps: float, tail: bool = False):
    """fc2(dropout_p(gelu(fc1(LN2(x))))) — the TRAINING MLP half of a
    block (reference vision_transformer.py:362-372) with the in-MLP
    dropout INSIDE the kernel (Mosaic PRNG, one int32 seed per sample
    from the layer's RNG key).  Forward and backward are single Pallas
    kernels; the backward regenerates the mask by reseeding and
    accumulates dW1/dW2 in VMEM across the batch grid, so nothing
    (S, 4C)-shaped ever reaches HBM in either direction.

    tail=True also fuses the block's post-fc2 dropout (drop2, from the
    continued PRNG stream) and the residual add:
    returns x + drop_p(fc2(drop_p(gelu(fc1(LN2(x)))))) — the complete
    training MLP half with zero XLA elementwise ops between blocks."""
    return _mlp_train_fwd_impl(x, seeds, ln_w, ln_b, w1, b1, w2, b2,
                               p, eps, tail=tail)


def _mlp_train_vjp_fwd(x, seeds, ln_w, ln_b, w1, b1, w2, b2, p, eps,
                       tail):
    out = _mlp_train_fwd_impl(x, seeds, ln_w, ln_b, w1, b1, w2, b2,
                              p, eps, tail=tail)
    return out, (x, seeds, ln_w, ln_b, w1, b1, w2)


def _mlp_train_vjp_bwd(p, eps, tail, res, g):
    x, seeds, ln_w, ln_b, w1, b1, w2 = res
    dx, dlnw, dlnb, dw1, db1, dw2, db2 = _mlp_train_bwd_impl(
        x, seeds, ln_w, ln_b, w1, b1, w2, g, p, eps, tail=tail)
    return dx, None, dlnw, dlnb, dw1, db1, dw2, db2


fused_mlp_half_train.defvjp(_mlp_train_vjp_fwd, _mlp_train_vjp_bwd)


def _mlp_train_twin(x, keep, ln_w, ln_b, w1, b1, w2, b2, p: float,
                    eps: float):
    """XLA twin of the TRAIN kernel with an EXPLICIT 0/1 keep mask
    (obtained from the emit_mask debug output) — parity reference for
    scripts/validate_train_mlp_kernel.py; the kernel itself generates
    the mask with the Mosaic PRNG, which XLA cannot reproduce."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = ((xc * jax.lax.rsqrt(var + eps)) * ln_w + ln_b).astype(x.dtype)
    h = (jnp.dot(y, w1.astype(x.dtype),
                 preferred_element_type=jnp.float32).astype(x.dtype)
         + b1.astype(x.dtype))
    h32 = h.astype(jnp.float32)
    a = 0.5 * h32 * (1.0 + jax.lax.erf(h32 * (2.0 ** -0.5)))
    a_d = (a * keep.astype(jnp.float32) * (1.0 / (1.0 - p))
           ).astype(x.dtype)
    return (jnp.dot(a_d, w2.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
            + b2.astype(x.dtype))


def _mlp_twin(x, ln_w, ln_b, w1, b1, w2, b2, eps: float):
    """Same math in XLA ops (== the block_forward MLP half with
    deterministic dropout no-ops) — backward pass + parity reference."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = ((xc * jax.lax.rsqrt(var + eps)) * ln_w + ln_b).astype(x.dtype)
    h = (jnp.dot(y, w1.astype(x.dtype),
                 preferred_element_type=jnp.float32).astype(x.dtype)
         + b1.astype(x.dtype))
    a = jax.nn.gelu(h, approximate=False)
    return (jnp.dot(a, w2.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
            + b2.astype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp_half(x, ln_w, ln_b, w1, b1, w2, b2, eps: float,
                   residual: bool = False):
    """fc2(gelu(fc1(LN2(x)))) — the deterministic MLP half of a block
    (reference vision_transformer.py:335-376; dropout is a no-op in
    every deterministic forward: PGD, key encoder, candidate scoring,
    eval).  Backward: dx via a fused Pallas kernel (the (S, 4C)
    intermediates never touch HBM); weight grads via an XLA twin that
    gets dead-code-eliminated when only input grads are requested —
    which is every production caller that differentiates this path
    (PGD, greedy grad pass).  Set RMCL_PALLAS_BLOCK_XLA_BWD=1 to fall
    back to differentiating the XLA twin entirely.

    residual=True returns x + f(x) with the residual add fused into the
    kernels (and dx += g in the dx kernel) — see fused_attn_half_det."""
    return _mlp_fwd_impl(x, ln_w, ln_b, w1, b1, w2, b2, eps,
                         residual=residual)


def _mlp_vjp_fwd(x, ln_w, ln_b, w1, b1, w2, b2, eps, residual):
    if _save_for_bwd():
        out, h_saved = _mlp_fwd_impl(x, ln_w, ln_b, w1, b1, w2, b2,
                                     eps, residual=residual,
                                     save_h=True)
    else:
        out = _mlp_fwd_impl(x, ln_w, ln_b, w1, b1, w2, b2, eps,
                            residual=residual)
        h_saved = None
    return out, (x, ln_w, ln_b, w1, b1, w2, b2, h_saved)


def _mlp_vjp_bwd(eps, residual, res, g):
    x, ln_w, ln_b, w1, b1, w2, b2, h_saved = res
    # weight grads: d(x + f)/dw == df/dw — twin stays residual-free
    _, pullback = jax.vjp(
        lambda x_, lw, lb, a1, c1, a2, c2: _mlp_twin(
            x_, lw, lb, a1, c1, a2, c2, eps),
        x, ln_w, ln_b, w1, b1, w2, b2)
    dx_t, dlw, dlb, dw1, db1, dw2, db2 = pullback(g)
    if os.environ.get("RMCL_PALLAS_BLOCK_XLA_BWD", "0") == "1":
        dx = dx_t + g if residual else dx_t
    else:
        dx = _mlp_dx_impl(x, ln_w, ln_b, w1, b1, w2, g, eps,
                          residual=residual, h_saved=h_saved)
    return dx, dlw, dlb, dw1, db1, dw2, db2


fused_mlp_half.defvjp(_mlp_vjp_fwd, _mlp_vjp_bwd)


# ------------------------------------------------------------ custom_vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_attn_half(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                    H: int, scale: float, eps: float):
    """proj(attention(qkv(LN1(x)))) — pre-dropout, pre-residual.

    x: (B, S, C); mask: (B, S) 1=valid key.  Forward AND backward are
    fused Pallas kernels (the S² tensors never touch HBM in either
    direction); set RMCL_PALLAS_BLOCK_XLA_BWD=1 to fall back to
    differentiating the XLA twin."""
    return _fwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                     H, scale, eps)


def _vjp_fwd(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
             H, scale, eps):
    out = _fwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                    H, scale, eps)
    return out, (x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj)


def _vjp_bwd(H, scale, eps, res, g):
    x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj = res
    if os.environ.get("RMCL_PALLAS_BLOCK_XLA_BWD", "0") == "1":
        _, pullback = jax.vjp(
            lambda x_, lw, lb, wq, bq, wp, bp: _xla_twin(
                x_, mask, lw, lb, wq, bq, wp, bp, H, scale, eps),
            x, ln_w, ln_b, wqkv, bqkv, wproj, bproj)
        dx, dlw, dlb, dwq, dbq, dwp, dbp = pullback(g)
    else:
        dx, dlw, dlb, dwq, dbq, dwp, dbp = _bwd_impl(
            x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj, g,
            H, scale, eps)
    return dx, None, dlw, dlb, dwq, dbq, dwp, dbp


fused_attn_half.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_attn_half_det(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                        H: int, scale: float, eps: float,
                        residual: bool = False):
    """fused_attn_half for DETERMINISTIC callers (PGD, key encoder,
    candidate scoring, eval): same forward kernel, but the backward
    computes dx with a dx-only Pallas kernel (no (B, S, 5C) weight-grad
    intermediate writes) and derives weight grads from an XLA twin that
    is dead-code-eliminated whenever only input grads are requested —
    which is every production deterministic caller that differentiates
    (PGD attacks/pgd.py, greedy commit-loop grad pass).

    residual=True returns x + f(x) with the post-attention residual add
    fused into the kernels (x is VMEM-resident anyway; dropout between
    f and the add is a no-op on deterministic paths), removing the
    separate XLA add's full-tensor HBM round trip per block."""
    return _fwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                     H, scale, eps, residual=residual)


def _save_for_bwd() -> bool:
    """save_qkv / save_h between the det fwd and bwd kernels.
    MEASURED AND REJECTED at ViLT-B b16 on v5e (ROADMAP round-3):
    154.2 vs 147.3 ms step — the step is HBM-bound, so the saved
    tensors' round trips cost more than the MXU recompute they
    replace, same physics as the remat-ON-inside-PGD result of
    round 2.  Default OFF; RMCL_BLOCK_SAVE=1 re-enables for A/B on
    other shapes (larger C/S shift the balance toward saving)."""
    return os.environ.get("RMCL_BLOCK_SAVE", "0") == "1"


def _det_vjp_fwd(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                 H, scale, eps, residual):
    if _save_for_bwd():
        out, qkv_saved = _fwd_impl(
            x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
            H, scale, eps, residual=residual, save_qkv=True)
    else:
        out = _fwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                        H, scale, eps, residual=residual)
        qkv_saved = None
    return out, (x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj,
                 qkv_saved)


def _det_vjp_bwd(H, scale, eps, residual, res, g):
    x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj, qkv_saved = res
    # weight grads: d(x + f)/dw == df/dw, so the twin needs no residual
    _, pullback = jax.vjp(
        lambda lw, lb, wq, bq, wp, bp: _xla_twin(
            x, mask, lw, lb, wq, bq, wp, bp, H, scale, eps),
        ln_w, ln_b, wqkv, bqkv, wproj, bproj)
    dlw, dlb, dwq, dbq, dwp, dbp = pullback(g)
    dx = _dx_bwd_impl(x, mask, ln_w, ln_b, wqkv, bqkv, wproj, g,
                      H, scale, eps, residual=residual,
                      qkv_saved=qkv_saved)
    return dx, None, dlw, dlb, dwq, dbq, dwp, dbp


fused_attn_half_det.defvjp(_det_vjp_fwd, _det_vjp_bwd)


# ------------------------------------------------ attention train kernel
def _attn_train_kernel(seed_ref, x_ref, bias_ref, lnw_ref, lnb_ref,
                       wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
                       *, H: int, scale: float, eps: float, p: float):
    """TRAINING attention half: LN1 + qkv + attention + proj + the
    post-proj dropout (Mosaic PRNG, reference vision_transformer.py
    proj_drop :332) + the residual add, all in one kernel.  The
    backward kernel reseeds to regenerate the identical mask (PARITY
    #19/#20 precedent: dropout impls own their stream)."""
    x = x_ref[0]
    pltpu.prng_seed(seed_ref[pl.program_id(0)])
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(x.shape), jnp.uint32)
    keep = bits >= jnp.uint32(_keep_threshold(p))
    out, _ = _attn_fwd_math(
        x, bias_ref[0], lnw_ref[:], lnb_ref[:], wqkv_ref[:],
        bqkv_ref[:], wproj_ref[:], bproj_ref[:], H, scale, eps)
    out = jnp.where(keep, out * (1.0 / (1.0 - p)), 0.0).astype(x.dtype)
    o_ref[0] = x + out


def _attn_train_bwd_kernel(seed_ref, x_ref, bias_ref, lnw_ref, lnb_ref,
                           wqkv_ref, wproj_ref, bqkv_ref, g_ref,
                           dx_ref, dlnw_ref, dlnb_ref, dwqkv_ref,
                           dbqkv_ref, dwproj_ref, dbproj_ref,
                           *, H: int, scale: float, eps: float,
                           p: float):
    """Training attention-half backward with in-kernel WEIGHT-GRAD
    ACCUMULATION across the B grid (same pattern as the MLP train bwd):
    nothing (S, 5C)-shaped ever reaches HBM — the round-2 full-bwd
    kernel emitted y/attn/dqkv per sample for outside XLA contractions.
    The dropout mask is regenerated by reseeding; the masked cotangent
    gm = keep·g/(1-p) drives the f-branch, dx gains the residual's
    +g."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)

    x = x_ref[0]
    g = g_ref[0]
    pltpu.prng_seed(seed_ref[b])
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(x.shape), jnp.uint32)
    keep = bits >= jnp.uint32(_keep_threshold(p))
    gm = jnp.where(keep, g.astype(jnp.float32) * (1.0 / (1.0 - p)),
                   0.0).astype(x.dtype)

    dx, dqkv, y, attn, dlnw, dlnb = _attn_bwd_math(
        x, bias_ref[0], lnw_ref[:], lnb_ref[:], wqkv_ref[:],
        wproj_ref[:], bqkv_ref[:], gm, H, scale, eps)
    dx_ref[0] = (dx + g.astype(jnp.float32)).astype(dx_ref.dtype)

    dlnw_ref[...] += dlnw
    dlnb_ref[...] += dlnb
    dwqkv_ref[...] += jax.lax.dot_general(
        y, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (C, 3C)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                              keepdims=True)
    dwproj_ref[...] += jax.lax.dot_general(
        attn, gm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (C, C)
    dbproj_ref[...] += jnp.sum(gm.astype(jnp.float32), axis=0,
                               keepdims=True)


def _attn_train_fwd_impl(x, seeds, mask, ln_w, ln_b, wqkv, bqkv, wproj,
                         bproj, H: int, scale: float, eps: float,
                         p: float):
    B, S, C = x.shape
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]
    dt = x.dtype
    wqkv_c, wproj_c = wqkv.astype(dt), wproj.astype(dt)
    const2 = lambda b: (0, 0)  # noqa: E731
    row = lambda b: (b, 0, 0)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_attn_train_kernel, H=H, scale=scale,
                          eps=eps, p=p),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S_pad, C), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S_pad, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S_pad * C * (4 * C) + 4 * B * C * S_pad * S_pad,
            bytes_accessed=(2 * B * S_pad * C + 4 * C * C)
            * x.dtype.itemsize,
            transcendentals=B * 12 * S_pad * S_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(seeds, x, bias, ln_w, ln_b, wqkv_c, bqkv, wproj_c, bproj)
    return out[:, :S, :]


def _attn_train_bwd_impl(x, seeds, mask, ln_w, ln_b, wqkv, bqkv, wproj,
                         g, H: int, scale: float, eps: float, p: float):
    B, S, C = x.shape
    S_pad = _round_up(S, _S_ALIGN)
    if S_pad != S:
        x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, S_pad - S), (0, 0)])
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
    bias = jnp.where(mask > 0, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]
    dt = x.dtype
    wqkv_c, wproj_c = wqkv.astype(dt), wproj.astype(dt)
    const2 = lambda b: (0, 0)  # noqa: E731
    row = lambda b: (b, 0, 0)  # noqa: E731

    dx, dlnw, dlnb, dwqkv, dbqkv, dwproj, dbproj = pl.pallas_call(
        functools.partial(_attn_train_bwd_kernel, H=H, scale=scale,
                          eps=eps, p=p),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S_pad, C), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S_pad, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * B * S_pad * C * 4 * C,
            bytes_accessed=3 * B * S_pad * C * x.dtype.itemsize,
            transcendentals=B * 12 * S_pad * S_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(seeds, x, bias, ln_w, ln_b, wqkv_c, wproj_c, bqkv, g)
    return (dx[:, :S, :], dlnw[0], dlnb[0], dwqkv, dbqkv[0], dwproj,
            dbproj[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_attn_half_train(x, seeds, mask, ln_w, ln_b, wqkv, bqkv,
                          wproj, bproj, H: int, scale: float,
                          eps: float, p: float):
    """x + drop_p(proj(attention(qkv(LN1(x))))) — the COMPLETE training
    attention half of a block (reference vision_transformer.py:309-332,
    proj_drop included) as one Pallas kernel each way.  The backward
    accumulates all six weight grads in VMEM across the B grid, so
    neither the S² tensors nor any (S, 5C) weight-grad intermediate
    ever reaches HBM.  seeds: one int32 per sample (the per-layer
    dropout RNG — the mask stream is the Mosaic PRNG, PARITY #19/#20).
    Needs the raised scoped-vmem limit (core/tpu_env.py) like
    fused_mlp_half_train."""
    return _attn_train_fwd_impl(x, seeds, mask, ln_w, ln_b, wqkv, bqkv,
                                wproj, bproj, H, scale, eps, p)


def _attn_train_vjp_fwd(x, seeds, mask, ln_w, ln_b, wqkv, bqkv, wproj,
                        bproj, H, scale, eps, p):
    out = _attn_train_fwd_impl(x, seeds, mask, ln_w, ln_b, wqkv, bqkv,
                               wproj, bproj, H, scale, eps, p)
    return out, (x, seeds, mask, ln_w, ln_b, wqkv, bqkv, wproj)


def _attn_train_vjp_bwd(H, scale, eps, p, res, g):
    x, seeds, mask, ln_w, ln_b, wqkv, bqkv, wproj = res
    dx, dlnw, dlnb, dwqkv, dbqkv, dwproj, dbproj = _attn_train_bwd_impl(
        x, seeds, mask, ln_w, ln_b, wqkv, bqkv, wproj, g,
        H, scale, eps, p)
    return (dx, None, None, dlnw, dlnb, dwqkv, dbqkv, dwproj, dbproj)


fused_attn_half_train.defvjp(_attn_train_vjp_fwd, _attn_train_vjp_bwd)
