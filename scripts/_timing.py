"""Tunnel-robust TPU timing helper.

The axon remote-execution tunnel adds O(100 ms) noisy dispatch+fetch
latency per program call, so:
  * measure ONE jitted program with n internal fori_loop iterations,
  * the program must return a SCALAR (array fetches ride the tunnel),
  * grow n until device time is seconds,
  * report the slope between runs at n and 3n (cancels fixed overhead).

Validated: pure-matmul chains measure 187-193 TF/s on v5e (~97% of the
197 TF/s bf16 peak) across shapes from (3856,768,768) to 4096^3 —
whereas naive per-call timing of the same programs reads 3-30 TF/s.
"""

import time

import numpy as np


def bench_prog(make_prog, *args, target_s: float = 2.5, n0: int = 8,
               verbose: bool = False):
    """make_prog(n) -> jitted fn(*args) returning a scalar.
    Returns (seconds_per_iteration, n_used)."""
    n = n0
    while True:
        f = make_prog(n)
        out = f(*args)
        _ = float(np.asarray(out))          # compile + warmup + sync
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*args)))
        t = time.perf_counter() - t0
        if t >= target_s or n >= 200000:
            break
        n = max(n * 2, int(n * target_s / max(t, 1e-3) * 1.3))
    f3 = make_prog(n * 3)
    _ = float(np.asarray(f3(*args)))
    t0 = time.perf_counter()
    _ = float(np.asarray(f3(*args)))
    t3 = time.perf_counter() - t0
    per = (t3 - t) / (2 * n)
    if verbose:
        print(f"    [n={n}: {t:.2f}s, 3n: {t3:.2f}s -> {per*1e3:.3f} ms/iter]",
              flush=True)
    return per, n
