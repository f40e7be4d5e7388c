"""Shared loss primitives (fp32 numerics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, ignore_index: int = -100):
    """Mean CE over positions whose label != ignore_index
    (torch F.cross_entropy semantics)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def cross_entropy_per_sample(logits, labels, ignore_index: int = -100):
    """Per-sample decomposition of `cross_entropy`: returns
    (nll_sum, valid_count) per leading-dim sample, so that
    ``cross_entropy(...) == sum(nll_sum) / max(sum(valid_count), 1)``
    and a row-masked batch loss recombines EXACTLY as
    ``sum(nll_sum[keep]) / max(sum(valid_count[keep]), 1)`` (PARITY
    #10: the static-shape val loader's wrap-around padding rows must
    contribute zero, not a down-weighted share)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    axes = tuple(range(1, nll.ndim))
    ps = jnp.sum(jnp.where(valid, nll, 0.0), axis=axes)
    wt = jnp.sum(valid, axis=axes).astype(jnp.float32)
    return ps, wt


def bce_rowsum_with_logits(logits, targets):
    """Per-sample SUM of elementwise BCE terms: the VQA loss
    (`bce_with_logits(...) * n_labels`) equals the row-mean of this."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.sum(loss, axis=tuple(range(1, loss.ndim)))


def bce_with_logits(logits, targets):
    """Mean binary cross-entropy with logits (torch semantics)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    loss = (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.mean(loss)


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """torch F.normalize semantics (norm clamped below at eps)."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def cosine_similarity(a, b, axis=-1, eps: float = 1e-6):
    """torch nn.CosineSimilarity semantics."""
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a32, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b32, axis=axis), eps)
    return jnp.sum(a32 * b32, axis=axis) / (na * nb)
