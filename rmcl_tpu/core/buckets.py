"""Shared static-shape bucket geometry.

The /8 text-length bucket is used by three independent callers that
must stay in lockstep — the train path (train/loop.py
bucket_text_batch), retrieval ranking (eval/retrieval.py), and the
greedy attack's internal forwards (attacks/greedy_fused.py
_text_bucket).  The rounding granularity bounds the number of distinct
jit shape buckets (and therefore compiled executables); changing it in
one caller but not the others would silently desynchronize the
program-bucket counts between train, eval, and attack.
"""

from __future__ import annotations

TEXT_BUCKET_ALIGN = 8


def text_bucket(n_valid: int, max_len: int,
                align: int = TEXT_BUCKET_ALIGN) -> int:
    """Smallest align-multiple static text length covering ``n_valid``
    tokens, floored at ``align`` and capped at ``max_len``."""
    return min(max_len, max(-(-n_valid // align) * align, align))


def bucket_enabled(cfg, which: str) -> bool:
    """Resolve the per-consumer text-bucket flag (``which`` in
    {"attack", "eval", "train"}): the ``<which>_text_bucket`` config
    field when set, else the deprecated ``greedy_text_bucket`` umbrella
    alias (the single pre-round-5 flag)."""
    v = getattr(cfg, f"{which}_text_bucket", None)
    if v is None:
        v = getattr(cfg, "greedy_text_bucket", True)
    return bool(v)
