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
