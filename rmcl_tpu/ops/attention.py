"""Masked multi-head self-attention: XLA path + Pallas fused path.

Semantics match the reference attention (reference
vilt/modules/vision_transformer.py:309-332): scores = q @ k^T * scale,
key positions with mask==0 get -inf before softmax, no causal structure.

`masked_attention` dispatches to the Pallas flash kernel on TPU when
enabled, else to the jnp implementation.  Softmax runs in fp32 either way.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # torch uses float('-inf'); finite sentinel avoids NaNs
                  # for fully-masked rows (cannot happen here: text has CLS)


def mha_xla(q, k, v, mask, scale: float):
    """q,k,v: (B, H, S, D); mask: (B, S) with 1=valid key. Returns (B,H,S,D)."""
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, _NEG_INF)
    scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def masked_attention(q, k, v, mask, scale: float,
                     use_pallas: bool = True,
                     return_probs: bool = False):
    """Fused masked MHSA.

    Falls back to XLA when Pallas is unavailable (CPU tests) or when the
    attention probabilities are requested (demo heatmaps need them —
    reference demo.py:96-151).
    """
    if return_probs:
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32) * scale
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, _NEG_INF)
        probs = jax.nn.softmax((scores + bias).astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return out, probs
    if use_pallas and _pallas_ok():
        from rmcl_tpu.ops.pallas_attention import flash_masked_attention
        return flash_masked_attention(q, k, v, mask, scale)
    return mha_xla(q, k, v, mask, scale)


def _pallas_ok() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
