"""Pure-matmul speed-of-light calibration, tunnel-robust.

Methodology (the only one that works over the axon tunnel):
  * ONE jitted program with n internal fori_loop iterations
  * program returns a SCALAR (never fetch arrays over the tunnel)
  * n chosen so device time is seconds (noise is O(100ms))
  * report slope between n and 3n
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp
    r = np.random.RandomState(0)

    def bench_prog(make_prog, *args, target_s=3.0):
        """make_prog(n) -> jitted fn(*args) -> scalar."""
        n = 32
        f = make_prog(n)
        out = f(*args); _ = float(np.asarray(out))   # compile+warm
        t0 = time.perf_counter(); _ = float(np.asarray(f(*args)))
        t = time.perf_counter() - t0
        while t < target_s and n < 100000:
            n *= 4
            f = make_prog(n)
            out = f(*args); _ = float(np.asarray(out))
            t0 = time.perf_counter(); _ = float(np.asarray(f(*args)))
            t = time.perf_counter() - t0
        f3 = make_prog(n * 3)
        out = f3(*args); _ = float(np.asarray(out))
        t0 = time.perf_counter(); _ = float(np.asarray(f3(*args)))
        t3 = time.perf_counter() - t0
        return (t3 - t) / (2 * n), n

    def run_pair(M, K, N, dtype=jnp.bfloat16):
        x = jnp.asarray(r.randn(M, K) * 0.02, dtype)
        w1 = jnp.asarray(r.randn(K, N) * 0.02, dtype)
        w2 = jnp.asarray(r.randn(N, K) * 0.02, dtype)
        def make(n):
            @jax.jit
            def f(x, w1, w2):
                def it(i, x):
                    return (x @ w1) @ w2
                out = jax.lax.fori_loop(0, n, it, x)
                return out[0, 0].astype(jnp.float32)
            return f
        per, n = bench_prog(make, x, w1, w2)
        flops = 2 * 2 * M * K * N
        print(f"  M={M:6d} K={K:5d} N={N:5d}: {flops/per/1e12:6.1f} TF/s "
              f"({per*1e3:.3f} ms/pair, n={n})", flush=True)

    run_pair(4096, 4096, 4096)
    run_pair(3856, 768, 2304)
    run_pair(15424, 768, 3072)
    run_pair(3856, 768, 768)
main()
