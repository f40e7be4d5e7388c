"""Per-sample deterministic host RNG for the data pipeline.

The reference draws false images/texts, retry indices, RandAugment
parameters, and EDA choices from Python's GLOBAL `random` module
(reference base_dataset.py:93-165, randaug.py, eda.py) — a stream that
interleaves nondeterministically across DataLoader workers, so two
identical runs see different data.  Here every per-sample draw goes
through `srandom`, a proxy that prefers a contextvar-scoped
`random.Random` seeded by (loader seed, epoch, sample index):

  * identical runs produce identical samples under ANY worker count,
    thread or process pool;
  * mid-epoch preemption resume replays the interrupted epoch's exact
    draw stream (the seed is a pure function of position, upgrading
    PARITY #29's "host-deterministic pipelines" qualifier);
  * the streams differ from the reference's global stream — the same
    non-contractual divergence class as PARITY #15 (the draws are
    i.i.d. uniform either way).

Outside a loader context the proxy falls back to the global module
(demos / ad-hoc use keep reference behavior).  contextvars are
per-thread, so pool threads running different samples never share a
stream.
"""

from __future__ import annotations

import contextlib
import contextvars
import random as _global_random

_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "rmcl_sample_rng", default=None)


class _Proxy:
    """Attribute proxy: contextvar Random if set, else the global
    `random` module."""

    def __getattr__(self, name):
        rng = _CTX.get()
        return getattr(rng if rng is not None else _global_random, name)


srandom = _Proxy()


def sample_seed(seed: int, epoch: int, index: int) -> int:
    # the index multiplier must exceed any dataset length or (epoch,
    # index) pairs alias — (e, i + M) replays (e + 1, i)'s exact
    # stream, correlating augmentations across epochs (the combined
    # GCC+SBU+COCO+VG pretraining corpus is ~5M captions).  2**42
    # clears any realistic corpus; Python ints are unbounded and
    # Random() hashes the full value.
    return (seed * 1_000_003 + epoch) * 2 ** 42 + index


@contextlib.contextmanager
def sample_rng(seed: int, epoch: int, index: int):
    """Scope `srandom` to a deterministic per-sample stream."""
    rng = _global_random.Random(sample_seed(seed, epoch, index))
    tok = _CTX.set(rng)
    try:
        yield
    finally:
        _CTX.reset(tok)
