"""TPU process-environment knobs that must be set before libtpu init.

XLA's TPU backend reads some compiler limits from LIBTPU_INIT_ARGS at
plugin initialisation; they cannot be passed through XLA_FLAGS (the
client-side parser rejects TPU-backend flags) or per-jit options.  Entry
points (bench.py, cli/run.py) call ensure_scoped_vmem_flag() before the
first jax TPU touch; library code never mutates the environment.
"""

from __future__ import annotations

import os

# 64 MiB: the fusion around the fused_train MLP bwd kernel stages the
# full dx output (scales with B: 25 MB at b64) plus the dW1/dW2
# accumulators (2 x 9.4 MB); v5e has 128 MiB physical VMEM
_SCOPED_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"


def ensure_scoped_vmem_flag() -> None:
    """Raise XLA's scoped-vmem limit to 32 MiB (default 16 MiB).

    Needed by the fused_train MLP backward kernel, whose dW1+dW2 fp32
    VMEM accumulators (2 x 9.4 MB at ViLT-B) are staged by the
    surrounding XLA fusion.  No-op if the user already set the flag.
    Harmless on CPU (libtpu never loads)."""
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in args:
        os.environ["LIBTPU_INIT_ARGS"] = (args + " " + _SCOPED_VMEM_FLAG).strip()


def ensure_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache for production entry
    points.  The full one-program attacked RMCL step compiles in
    ~45-70 s on v5e; with the cache a restart (resume_from, preemption
    recovery, eval re-run) replays the compiled executable in ~1 s.
    Directory from $RMCL_COMPILE_CACHE (set to "0" to disable),
    default ~/.cache/rmcl_tpu/xla.  Library code never calls this —
    entry points only, before the first compile.

    TPU backends only: this jaxlib's CPU backend cannot round-trip the
    big one-program executable through the cache — the entry writes
    fine but deserializing it aborts the process (reproduced: write
    run green, identical re-run with the warm entry dies with a Fatal
    Python error inside the jitted call).  The cache's payoff is TPU
    restart recovery anyway; CPU runs just recompile."""
    path = os.environ.get("RMCL_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/rmcl_tpu/xla"))
    if not path or path == "0":
        return
    try:
        import jax
        if jax.default_backend() != "tpu":
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took >1s to compile (default 60s would
        # skip most of our programs except the big step)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # never sink an entry point over a cache


def scoped_vmem_flag_active() -> bool:
    """True if the raised scoped-vmem limit will be (or was) in effect
    for this process — gate for deriving mlp_impl="fused_train"."""
    return ("xla_tpu_scoped_vmem_limit_kib"
            in os.environ.get("LIBTPU_INIT_ARGS", ""))
