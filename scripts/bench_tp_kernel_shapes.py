"""Do the fused half-block kernels pay at tensor-parallel shard shapes?

VERDICT r3 #8: dp x tp meshes fall back to xla_bf16 because pallas_call
is opaque to pjit's partitioner; extending the PARITY #22 shard_map
technique to a 2-D mesh would run each model shard's kernels locally
with the Megatron psum in the body.  Whether that is WORTH building
depends on the kernel rate at the per-shard shapes — ViLT-B tp2:

  attention half: qkv (768, 3*384) -> 6 heads of D=64,
                  proj (384, 768) partial (psum outside)
  mlp half:       fc1 (768, 1536), fc2 (1536, 768)

This script measures kernel_v2-style fused forwards at full vs tp2
shard shapes; if the per-shard TF/s drops materially below the ~147
TF/s single-chip plateau, tp2 kernels lose to the existing xla_bf16
fallback + DP and the fallback stays the right design.

  python scripts/bench_tp_kernel_shapes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts._timing import bench_prog

B, S, C = 16, 241, 768
SP = (S + 127) // 128 * 128
EPS = 1e-6


def _ln(x, lnw, lnb):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return ((xc * jax.lax.rsqrt(var + EPS)) * lnw + lnb).astype(x.dtype)


def make_attn_kernel(H_loc: int, D: int):
    C_loc = H_loc * D
    scale = D ** -0.5

    def kern(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
             wproj_ref, bproj_ref, o_ref):
        x = x_ref[0]                                     # (S, C) full
        y = _ln(x, lnw_ref[:], lnb_ref[:])
        qkv = jnp.dot(y, wqkv_ref[:],                    # (S, 3*C_loc)
                      preferred_element_type=jnp.float32).astype(x.dtype)
        qkv = qkv + bqkv_ref[:].astype(x.dtype)
        qkv_t = qkv.T.reshape(3, H_loc, D, SP)
        q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        scores = scores + bias_ref[0][None, :, :]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        attn = jax.lax.dot_general(
            v, p.astype(x.dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)
        attn = attn.reshape(C_loc, SP).T                 # (S, C_loc)
        out = jnp.dot(attn, wproj_ref[:],                # partial (S, C)
                      preferred_element_type=jnp.float32).astype(x.dtype)
        o_ref[0] = out + bproj_ref[:].astype(x.dtype)
    return kern


def call_attn(H_loc, D, x, bias, lnw, lnb, wqkv, bqkv, wproj, bproj):
    C_loc = H_loc * D
    const2 = lambda b: (0, 0)  # noqa: E731
    return pl.pallas_call(
        make_attn_kernel(H_loc, D),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C_loc), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C_loc,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_loc, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SP, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SP, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, bias, lnw, lnb, wqkv, bqkv, wproj, bproj)


def make_mlp_kernel(F_loc: int):
    def kern(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
             o_ref):
        x = x_ref[0]
        y = _ln(x, lnw_ref[:], lnb_ref[:])
        from rmcl_tpu.ops.pallas_block import _erf32
        h = jnp.dot(y, w1_ref[:],
                    preferred_element_type=jnp.float32)
        h = h + b1_ref[:]
        h = (0.5 * h * (1.0 + _erf32(h * (2 ** -0.5)))).astype(x.dtype)
        out = jnp.dot(h, w2_ref[:],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        o_ref[0] = out + b2_ref[:].astype(x.dtype)
    return kern


def call_mlp(F_loc, x, lnw, lnb, w1, b1, w2, b2):
    const2 = lambda b: (0, 0)  # noqa: E731
    return pl.pallas_call(
        make_mlp_kernel(F_loc),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F_loc), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((F_loc,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_loc, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SP, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SP, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, lnw, lnb, w1, b1, w2, b2)


def chain(fn):
    def make(n):
        def prog(x0):
            out = jax.lax.fori_loop(0, n, lambda i, a: fn(a), x0)
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(prog)
    return make


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, SP, C)), jnp.bfloat16)
    maskp = jnp.pad(jnp.ones((B, S), jnp.int32), [(0, 0), (0, SP - S)])
    bias = jnp.where(maskp > 0, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    lnw = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    print(f"TP-shard kernel shapes  B={B} S_pad={SP} C={C} on "
          f"{jax.devices()[0].device_kind}", flush=True)

    for tp in (1, 2):
        H_loc, D = 12 // tp, 64
        C_loc = H_loc * D
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C_loc)) * 0.02,
                           jnp.bfloat16)
        bqkv = jnp.zeros((3 * C_loc,), jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((C_loc, C)) * 0.02,
                            jnp.bfloat16)
        bproj = jnp.zeros((C,), jnp.float32)
        flops = B * (2 * SP * C * 3 * C_loc + 4 * H_loc * SP * SP * D
                     + 2 * SP * C_loc * C)
        per, _ = bench_prog(chain(lambda a: call_attn(
            H_loc, D, a, bias, lnw, lnb, wqkv, bqkv, wproj, bproj)), x)
        print(f"  attn tp={tp} (H_loc={H_loc:2d})  {per*1e3:7.3f} ms  "
              f"{flops/per/1e12:6.1f} TF/s", flush=True)

    for tp in (1, 2):
        F_loc = 4 * C // tp
        w1 = jnp.asarray(rng.standard_normal((C, F_loc)) * 0.02,
                         jnp.bfloat16)
        b1 = jnp.zeros((F_loc,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((F_loc, C)) * 0.02,
                         jnp.bfloat16)
        b2 = jnp.zeros((C,), jnp.float32)
        flops = B * (2 * SP * C * F_loc + 2 * SP * F_loc * C)
        per, _ = bench_prog(chain(lambda a: call_mlp(
            F_loc, a, lnw, lnb, w1, b1, w2, b2)), x)
        print(f"  mlp  tp={tp} (F_loc={F_loc:4d})  {per*1e3:7.3f} ms  "
              f"{flops/per/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
