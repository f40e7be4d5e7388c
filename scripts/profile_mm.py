"""Why do the block matmuls only hit ~65 TF/s? Bisect:
  scan_f32w   scan over 12 blocks, fp32 weights cast per use (as shipped)
  scan_bf16w  same with pre-cast bf16 weights
  unroll      python-unrolled 12 blocks, bf16 weights
  flat2d      unrolled on (B*S, C) 2-D activations
  calib       one big square matmul chain (the 159.7 TF/s reference)

Usage: python scripts/profile_mm.py [B] [S]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 241
    C = 768
    r = np.random.RandomState(0)

    def mk(shape, dtype=jnp.float32):
        return jnp.asarray(r.randn(*shape) * 0.02, dtype)

    w = {
        "qkv": mk((12, C, 3 * C)), "proj": mk((12, C, C)),
        "fc1": mk((12, C, 4 * C)), "fc2": mk((12, 4 * C, C)),
    }
    w16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), w)
    x0 = mk((B, S, C), jnp.bfloat16)
    flops = 12 * B * S * (12 * C * C) * 2

    def block(bw, x, cast):
        f = (lambda k: bw[k].astype(jnp.bfloat16)) if cast else (lambda k: bw[k])
        y = x @ f("qkv")
        z = y[..., :C] @ f("proj")
        g = jax.nn.gelu(z @ f("fc1"), approximate=False)
        return x + g @ f("fc2")

    def timed(name, run, *args):
        out = run(*args); _ = float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        out = run(*args); _ = float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"  {name:11s} {dt*1e3:7.2f} ms  ({flops/dt/1e12:6.1f} TF/s)",
              flush=True)

    def chain(body):
        @jax.jit
        def run(wts, x):
            def it(i, carry):
                x, acc = carry
                out = body(wts, x)
                m = jnp.mean(out[:, 0].astype(jnp.float32))
                return (x + (0.0 * m).astype(x.dtype), acc + m)
            _, acc = jax.lax.fori_loop(0, ITERS, it,
                                       (x, jnp.zeros((), jnp.float32)))
            return acc
        return run

    def scanner(cast):
        def body(wts, x):
            def sb(carry, bw):
                return block(bw, carry, cast), None
            out, _ = jax.lax.scan(sb, x, wts)
            return out
        return body

    def unrolled(wts, x):
        for i in range(12):
            bw = {k: wts[k][i] for k in wts}
            x = block(bw, x, False)
        return x

    print(f"B={B} S={S}: {flops/1e9:.0f} GFLOP per 12-block pass", flush=True)
    timed("scan_f32w", chain(scanner(True)), w, x0)
    timed("scan_bf16w", chain(scanner(False)), w16, x0)
    timed("unroll", chain(unrolled), w16, x0)

    x2 = x0.reshape(B * S, C)

    @jax.jit
    def flat2d(wts, x):
        def it(i, carry):
            x, acc = carry
            out = x
            for i2 in range(12):
                bw = {k: wts[k][i2] for k in wts}
                out = block(bw, out, False)
            m = jnp.mean(out[0].astype(jnp.float32))
            return (x + (0.0 * m).astype(x.dtype), acc + m)
        _, acc = jax.lax.fori_loop(0, ITERS, it,
                                   (x, jnp.zeros((), jnp.float32)))
        return acc
    out = flat2d(w16, x2); _ = float(np.asarray(out))
    t0 = time.perf_counter()
    out = flat2d(w16, x2); _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {'flat2d':11s} {dt*1e3:7.2f} ms  ({flops/dt/1e12:6.1f} TF/s)",
          flush=True)

    # calibration: 4096^2 matmul chain
    N = 4096
    a = mk((N, N), jnp.bfloat16)
    m0 = mk((N, N), jnp.bfloat16)
    cal_flops = ITERS * 2 * N ** 3

    @jax.jit
    def calib(a, m0):
        def it(i, x):
            return jnp.tanh(x @ m0)
        return jax.lax.fori_loop(0, ITERS, it, a)
    out = calib(a, m0); _ = float(np.asarray(out[0, 0]))
    t0 = time.perf_counter()
    out = calib(a, m0); _ = float(np.asarray(out[0, 0]))
    dt = time.perf_counter() - t0
    print(f"  {'calib4096':11s} {dt*1e3:7.2f} ms  ({cal_flops/dt/1e12:6.1f} TF/s)",
          flush=True)


if __name__ == "__main__":
    main()
