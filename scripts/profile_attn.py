"""Slope-timed attention-core comparison at the RMCL hot shapes.

Times ONE jitted program with n chained attention calls (data-dependent
so XLA cannot elide them) for each impl, fwd-only and fwd+bwd:

  python scripts/profile_attn.py            # all impls, fwd + fwd_bwd
  PROF_IMPLS=xla_bf16,pallas python scripts/profile_attn.py

Shapes default to the bench hot path: B=16, H=12, S=241, D=64, bf16.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import bench_prog

B = int(os.environ.get("PROF_B", "16"))
H = int(os.environ.get("PROF_H", "12"))
S = int(os.environ.get("PROF_S", "241"))
D = int(os.environ.get("PROF_D", "64"))
DTYPE = jnp.bfloat16
SCALE = D ** -0.5


def get_impl(name):
    if name == "pallas":
        from rmcl_tpu.ops.pallas_attention import flash_masked_attention
        return lambda q, k, v, m: flash_masked_attention(q, k, v, m, SCALE)
    from rmcl_tpu.ops import attention as A
    fn = {"xla": A.mha_xla, "xla_bf16": A.mha_xla_bf16,
          "flash": A.mha_jax_flash}[name]
    return lambda q, k, v, m: fn(q, k, v, m, SCALE)


def main():
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, H, S, D), DTYPE)
    k = jnp.asarray(r.randn(B, H, S, D), DTYPE)
    v = jnp.asarray(r.randn(B, H, S, D), DTYPE)
    mask = jnp.asarray((r.rand(B, S) > 0.1).astype(np.int32))

    impls = os.environ.get("PROF_IMPLS", "xla,xla_bf16,pallas").split(",")
    modes = os.environ.get("PROF_MODES", "fwd,fwd_bwd").split(",")

    for name in impls:
        impl = get_impl(name)
        if "fwd" in modes:
            def make_fwd(n, impl=impl):
                @jax.jit
                def prog(q, k, v, m):
                    def body(_, qq):
                        o = impl(qq, k, v, m)
                        # data dependency: feed output back as q
                        return (o * 0.001 + qq * 0.999).astype(DTYPE)
                    out = jax.lax.fori_loop(0, n, body, q)
                    return jnp.sum(out.astype(jnp.float32))
                return prog
            per, n = bench_prog(make_fwd, q, k, v, mask)
            print(f"ATTN {name:9s} fwd      {per*1e3:8.4f} ms/call (n={n})",
                  flush=True)
        if "fwd_bwd" in modes:
            def make_fb(n, impl=impl):
                def loss(qq, kk, vv, m):
                    return jnp.sum(impl(qq, kk, vv, m).astype(jnp.float32))
                g = jax.grad(loss, argnums=(0, 1, 2))

                @jax.jit
                def prog(q, k, v, m):
                    def body(_, carry):
                        qq, kk, vv = carry
                        dq, dk, dv = g(qq, kk, vv, m)
                        return ((qq + 0.001 * dq).astype(DTYPE),
                                (kk + 0.001 * dk).astype(DTYPE),
                                (vv + 0.001 * dv).astype(DTYPE))
                    qq, kk, vv = jax.lax.fori_loop(0, n, body, (q, k, v))
                    return jnp.sum(qq.astype(jnp.float32))
                return prog
            per, n = bench_prog(make_fb, q, k, v, mask)
            print(f"ATTN {name:9s} fwd_bwd  {per*1e3:8.4f} ms/call (n={n})",
                  flush=True)


if __name__ == "__main__":
    main()
