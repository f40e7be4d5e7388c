"""A/B variants of the fused attention half-block FORWARD kernel.

v1: shipped kernel (qkv (S,3C) then a 590K-elem .T relayout).
v2: y transposed first (196K elems), qkv computed directly in (3C, S)
    via a pre-transposed weight (3C, C) — no big relayout.
v3: v2 + proj contracted straight out of the (C, S) layout
    (dot_general over dim 0) instead of an explicit attn.T.

  python scripts/bench_attn_variants.py
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

B, S, C, H = 16, 241, 768, 12
D = C // H
SP = (S + 127) // 128 * 128
SCALE = D ** -0.5
EPS = 1e-6
FLOPS = B * (2 * SP * C * 3 * C + 4 * H * SP * SP * D + 2 * SP * C * C)


def _ln(x, lnw, lnb):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return ((xc * jax.lax.rsqrt(var + EPS)) * lnw + lnb).astype(x.dtype)


def kernel_v2(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_t_ref, bqkv_ref,
              wproj_ref, bproj_ref, o_ref):
    x = x_ref[0]
    y = _ln(x, lnw_ref[:], lnb_ref[:])
    y_t = y.T                                            # (C, S)
    qkv_t = jnp.dot(wqkv_t_ref[:], y_t,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    qkv_t = qkv_t + bqkv_ref[:][:, None].astype(x.dtype)
    qkv_t = qkv_t.reshape(3, H, D, SP)
    q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * SCALE
    scores = scores + bias_ref[0][None, :, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    attn = jax.lax.dot_general(
        v, p.astype(x.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)  # (H, D, S)
    attn = attn.reshape(C, SP).T
    out = jnp.dot(attn, wproj_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = out + bproj_ref[:].astype(x.dtype)


def kernel_v3(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_t_ref, bqkv_ref,
              wproj_ref, bproj_ref, o_ref):
    x = x_ref[0]
    y = _ln(x, lnw_ref[:], lnb_ref[:])
    y_t = y.T
    qkv_t = jnp.dot(wqkv_t_ref[:], y_t,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    qkv_t = qkv_t + bqkv_ref[:][:, None].astype(x.dtype)
    qkv_t = qkv_t.reshape(3, H, D, SP)
    q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * SCALE
    scores = scores + bias_ref[0][None, :, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    attn = jax.lax.dot_general(
        v, p.astype(x.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    attn_cs = attn.reshape(C, SP)                        # (C, S)
    out = jax.lax.dot_general(
        attn_cs, wproj_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)  # (S, C)
    o_ref[0] = out + bproj_ref[:].astype(x.dtype)


def call_variant(kern, x, bias, lnw, lnb, wqkv_t, bqkv, wproj, bproj):
    const2 = lambda b: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SP, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SP, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SP, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, bias, lnw, lnb, wqkv_t, bqkv, wproj, bproj)


def main():
    from rmcl_tpu.ops import pallas_block as PB

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, SP, C)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    maskp = jnp.pad(mask, [(0, 0), (0, SP - S)])
    bias = jnp.where(maskp > 0, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    lnw = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02,
                       jnp.bfloat16)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
    bproj = jnp.zeros((C,), jnp.float32)
    wqkv_t = wqkv.T.copy()

    def chain(fn):
        def make(n):
            def prog(x0):
                out = jax.lax.fori_loop(0, n, lambda i, a: fn(a), x0)
                return jnp.sum(out.astype(jnp.float32))
            return jax.jit(prog)
        return make

    print(f"attn fwd variants  B={B} S_pad={SP} C={C} on "
          f"{jax.devices()[0].device_kind}", flush=True)

    # v1 = shipped
    xs = x[:, :S, :]
    per, n = bench_prog(chain(lambda a: PB.fused_attn_half(
        a, mask, lnw, lnb, wqkv.astype(jnp.float32), bqkv,
        wproj.astype(jnp.float32), bproj, H, SCALE, EPS)), xs)
    print(f"  v1 shipped    {per * 1e3:7.3f} ms  "
          f"{FLOPS / per / 1e12:6.1f} TF/s", flush=True)

    for name, kern in (("v2 yT+wqkvT", kernel_v2),
                       ("v3 +proj dg", kernel_v3)):
        per, n = bench_prog(chain(lambda a: call_variant(
            kern, a, bias, lnw, lnb, wqkv_t, bqkv, wproj, bproj)), x)
        print(f"  {name}  {per * 1e3:7.3f} ms  "
              f"{FLOPS / per / 1e12:6.1f} TF/s", flush=True)

    # parity check v2/v3 vs the XLA twin math
    ref = PB._xla_twin(x[:, :S, :], mask, lnw, lnb,
                       wqkv.astype(jnp.float32), bqkv,
                       wproj.astype(jnp.float32), bproj, H, SCALE, EPS)
    for name, kern in (("v2", kernel_v2), ("v3", kernel_v3)):
        got = call_variant(kern, x, bias, lnw, lnb, wqkv_t, bqkv,
                           wproj, bproj)[:, :S, :]
        err = jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        print(f"  {name} max|err| vs twin = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()


# ---- v4: BB samples per grid step (independent chains for ILP) ----
def make_kernel_v4(BB):
    def kernel_v4(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, o_ref):
        for j in range(BB):
            x = x_ref[j]
            y = _ln(x, lnw_ref[:], lnb_ref[:])
            qkv = jnp.dot(y, wqkv_ref[:],
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)
            qkv = qkv + bqkv_ref[:].astype(x.dtype)
            qkv_t = qkv.T.reshape(3, H, D, SP)
            q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * SCALE
            scores = scores + bias_ref[j][None, :, :]
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            attn = jax.lax.dot_general(
                v, p.astype(x.dtype),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(x.dtype)
            attn = attn.reshape(C, SP).T
            out = jnp.dot(attn, wproj_ref[:],
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)
            o_ref[j] = out + bproj_ref[:].astype(x.dtype)
    return kernel_v4


def call_v4(BB, x, bias, lnw, lnb, wqkv, bqkv, wproj, bproj):
    const2 = lambda b: (0, 0)  # noqa: E731
    return pl.pallas_call(
        make_kernel_v4(BB),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, SP, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, SP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, SP, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SP, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, bias, lnw, lnb, wqkv, bqkv, wproj, bproj)


def main_v4():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, SP, C)), jnp.bfloat16)
    maskp = jnp.pad(jnp.ones((B, S), jnp.int32),
                    [(0, 0), (0, SP - S)])
    bias = jnp.where(maskp > 0, 0.0, -1e30).astype(
        jnp.float32)[:, None, :]
    lnw = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02,
                       jnp.bfloat16)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.02,
                        jnp.bfloat16)
    bproj = jnp.zeros((C,), jnp.float32)

    def chain(fn):
        def make(n):
            def prog(x0):
                out = jax.lax.fori_loop(0, n, lambda i, a: fn(a), x0)
                return jnp.sum(out.astype(jnp.float32))
            return jax.jit(prog)
        return make

    for BB in (2, 4):
        per, n = bench_prog(chain(lambda a: call_v4(
            BB, a, bias, lnw, lnb, wqkv, bqkv, wproj, bproj)), x)
        print(f"  v4 BB={BB}     {per * 1e3:7.3f} ms  "
              f"{FLOPS / per / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__" and os.environ.get("V4", "1") == "1":
    main_v4()


# ---- v5: BB samples per grid step, STAGE-MAJOR program order ----
# v4 interleaves nothing if Mosaic schedules close to program order:
# its per-sample chains appear back to back, so every dependent matmul
# boundary (qkv -> scores -> PV -> proj) still drains the MXU pipeline.
# v5 emits the ops stage-by-stage across the BB samples (all qkv
# matmuls, then all scores, ...), giving an in-order scheduler BB
# independent matmuls to overlap across each dependence boundary.
def make_kernel_v5(BB):
    def kernel_v5(x_ref, bias_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, o_ref):
        ys = [_ln(x_ref[j], lnw_ref[:], lnb_ref[:]) for j in range(BB)]
        dt = x_ref[0].dtype
        qkvs = [
            (jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32)
             .astype(dt) + bqkv_ref[:].astype(dt)).T.reshape(3, H, D, SP)
            for y in ys]
        scores = [
            jax.lax.dot_general(
                t[0], t[1], dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * SCALE
            + bias_ref[j][None, :, :]
            for j, t in enumerate(qkvs)]
        ps = []
        for s in scores:
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            ps.append(e / jnp.sum(e, axis=-1, keepdims=True))
        attns = [
            jax.lax.dot_general(
                t[2], p.astype(dt),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dt)
            .reshape(C, SP).T
            for t, p in zip(qkvs, ps)]
        for j, a in enumerate(attns):
            o_ref[j] = (jnp.dot(a, wproj_ref[:],
                                preferred_element_type=jnp.float32)
                        .astype(dt) + bproj_ref[:].astype(dt))
    return kernel_v5


def main_v5():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, SP, C)), jnp.bfloat16)
    maskp = jnp.pad(jnp.ones((B, S), jnp.int32), [(0, 0), (0, SP - S)])
    bias = jnp.where(maskp > 0, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    lnw = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
    bproj = jnp.zeros((C,), jnp.float32)

    def chain(fn):
        def make(n):
            def prog(x0):
                out = jax.lax.fori_loop(0, n, lambda i, a: fn(a), x0)
                return jnp.sum(out.astype(jnp.float32))
            return jax.jit(prog)
        return make

    def call_v5(BB, a):
        const2 = lambda b: (0, 0)  # noqa: E731
        return pl.pallas_call(
            make_kernel_v5(BB),
            grid=(B // BB,),
            in_specs=[
                pl.BlockSpec((BB, SP, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BB, 1, SP), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C,), lambda b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C,), lambda b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), const2, memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * C,), lambda b: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),
                pl.BlockSpec((C,), lambda b: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BB, SP, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, SP, C), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, bias, lnw, lnb, wqkv, bqkv, wproj, bproj)

    for BB in (2, 4):
        per, n = bench_prog(chain(lambda a, BB=BB: call_v5(BB, a)), x)
        print(f"  v5 stage-major BB={BB}  {per * 1e3:7.3f} ms  "
              f"{FLOPS / per / 1e12:6.1f} TF/s", flush=True)
    # parity
    from rmcl_tpu.ops import pallas_block as PB
    ref = PB._xla_twin(x[:, :S, :], jnp.ones((B, S), jnp.int32), lnw, lnb,
                       wqkv.astype(jnp.float32), bqkv,
                       wproj.astype(jnp.float32), bproj, H, SCALE, EPS)
    got = call_v5(2, x)[:, :S, :]
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f"  v5 max|err| vs twin = {err:.2e}", flush=True)


if __name__ == "__main__" and os.environ.get("V5", "1") == "1":
    main_v5()
