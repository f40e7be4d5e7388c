"""Isolate where the transformer block loses MFU on TPU (b16, S=241).

Variants, each ONE jitted program of N chained block-stack iterations:
  mm_only    the 4 block matmuls alone (qkv, proj, fc1, fc2)
  mm_ln      + the two fp32 LayerNorms
  full       block_forward as shipped (fp32 scores+softmax attention)
  attn_bf16  scores einsum in bf16 (softmax still fp32)
  s256       full block at S padded to 256 (alignment check)
  s192       full block at S=192 (<=128*1.5)

Usage: python scripts/profile_block.py [B] [S]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("PROF_ITERS", "200"))  # >=200: amortise the O(50 ms)
# tunnel dispatch+fetch overhead to <0.3 ms/iter (see ROADMAP timing notes)


def main():
    import jax
    import jax.numpy as jnp
    from rmcl_tpu.models import layers as L
    from rmcl_tpu.models.vit import ViTSpec, init_vit, block_forward

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 241
    C, Hh, D = 768, 12, 64
    dtype = jnp.bfloat16
    spec = ViTSpec(use_pallas=False, remat=False)
    params = init_vit(jax.random.PRNGKey(0), spec)
    blocks = params["blocks"]

    x0 = jnp.asarray(np.random.RandomState(0).randn(B, S, C) * 0.02, dtype)
    mask = jnp.ones((B, S), jnp.int32)

    flops_mm = 12 * B * S * (12 * C * C) * 2
    print(f"B={B} S={S}: matmul GFLOP/stack-pass = {flops_mm/1e9:.1f}",
          flush=True)

    def scan12(fn, bl, x):
        def body(carry, bp):
            return fn(bp, carry), None
        out, _ = jax.lax.scan(body, x, bl)
        return out

    def chain(fn):
        @jax.jit
        def run(bl, x):
            def body(i, carry):
                x, acc = carry
                out = scan12(fn, bl, x)
                m = jnp.mean(out[:, 0].astype(jnp.float32))
                return (x + (0.0 * m).astype(x.dtype), acc + m)
            _, acc = jax.lax.fori_loop(
                0, ITERS, body, (x, jnp.zeros((), jnp.float32)))
            return acc
        return run

    def timed(name, run, x):
        out = run(blocks, x); _ = float(np.asarray(out))
        t0 = time.perf_counter()
        out = run(blocks, x); _ = float(np.asarray(out))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"  {name:10s} {dt*1e3:7.2f} ms  ({flops_mm/dt/1e12:6.1f} TF/s"
              f" on matmul flops)", flush=True)
        return dt

    # ---- mm_only
    def mm_only(bp, x):
        y = L.linear(bp["attn"]["qkv"], x)
        z = L.linear(bp["attn"]["proj"], y[..., :C])
        f = L.gelu(L.linear(bp["mlp"]["fc1"], z))
        return x + L.linear(bp["mlp"]["fc2"], f)

    # ---- mm + LN
    def mm_ln(bp, x):
        y = L.layer_norm(bp["norm1"], x, eps=1e-6)
        y = L.linear(bp["attn"]["qkv"], y)
        z = L.linear(bp["attn"]["proj"], y[..., :C])
        x = x + z
        y = L.layer_norm(bp["norm2"], x, eps=1e-6)
        f = L.gelu(L.linear(bp["mlp"]["fc1"], y))
        return x + L.linear(bp["mlp"]["fc2"], f)

    # ---- full (as shipped)
    def full(bp, x):
        return block_forward(bp, x, mask, spec=spec)

    # ---- attention fully bf16 (scores + probs bf16, softmax fp32 math)
    def attn_bf16(bp, x):
        y = L.layer_norm(bp["norm1"], x, eps=1e-6)
        qkv = L.linear(bp["attn"]["qkv"], y).reshape(B, S, 3, Hh, D)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.bfloat16) * (D ** -0.5)
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32) + bias, axis=-1)
        attn = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.bfloat16)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, C)
        x = x + L.linear(bp["attn"]["proj"], attn)
        y = L.layer_norm(bp["norm2"], x, eps=1e-6)
        f = L.gelu(L.linear(bp["mlp"]["fc1"], y))
        return x + L.linear(bp["mlp"]["fc2"], f)

    timed("mm_only", chain(mm_only), x0)
    timed("mm_ln", chain(mm_ln), x0)
    timed("full", chain(full), x0)
    timed("attn_bf16", chain(attn_bf16), x0)

    # ---- alignment variants
    for S2 in (256, 192):
        x2 = jnp.asarray(np.random.RandomState(0).randn(B, S2, C) * 0.02, dtype)
        m2 = jnp.ones((B, S2), jnp.int32)

        def full2(bp, x, m2=m2):
            return block_forward(bp, x, m2, spec=spec)
        name = f"s{S2}"
        run = chain(full2)
        out = run(blocks, x2); _ = float(np.asarray(out))
        t0 = time.perf_counter()
        out = run(blocks, x2); _ = float(np.asarray(out))
        dt = (time.perf_counter() - t0) / ITERS
        fl = 12 * B * S2 * (12 * C * C) * 2
        print(f"  {name:10s} {dt*1e3:7.2f} ms  ({fl/dt/1e12:6.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
