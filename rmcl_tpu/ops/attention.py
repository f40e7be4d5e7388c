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
import jax.numpy as jnp  # noqa: F401 (jnp used throughout)

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


def mha_xla_bf16(q, k, v, mask, scale: float):
    """XLA path with the S² score/prob tensors materialised in bf16.

    The (B, H, S, S) scores and probabilities dominate the attention's
    HBM traffic (fp32: ~45 MB/layer/fwd at b16, S=241); keeping them in
    bf16 halves it.  Softmax REDUCTIONS still run in fp32 (max/sum over
    upcast values), so only the stored exponentials lose mantissa — the
    row-max subtraction keeps them in [0, 1] where bf16's relative error
    is ~0.4%, well inside training noise.  Numerics vs `mha_xla` are
    validated in tests/test_ops.py."""
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, _NEG_INF)
    s = (scores + bias).astype(jnp.bfloat16)
    m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
    p = jnp.exp(s.astype(jnp.float32) - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / denom).astype(jnp.bfloat16)
    out = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def mha_jax_flash(q, k, v, mask, scale: float):
    """jax.experimental.pallas TPU flash kernel with segment-id masking:
    pad keys get their own segment so no query attends to them.  Pad-row
    OUTPUTS differ from the reference (zeros vs attend-to-valid), which
    is safe: pad positions are masked as keys everywhere downstream and
    their features are never read (SURVEY.md §3.2)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)
    S = q.shape[2]
    S_pad = (S + 127) // 128 * 128
    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
    seg = SegmentIds(q=jnp.ones_like(mask), kv=mask)
    out = flash_attention(q, k, v, segment_ids=seg, sm_scale=scale)
    return out[:, :, :S, :]


def masked_attention(q, k, v, mask, scale: float,
                     use_pallas: bool = True,
                     impl: Optional[str] = None,
                     return_probs: bool = False):
    """Fused masked MHSA.  impl: "xla" | "xla_bf16" (S² tensors in
    bf16, fp32 softmax math) | "pallas" (rmcl kernel) | "flash" (jax
    library TPU kernel); `use_pallas` kept for backward compat (maps to
    "pallas").

    Falls back to XLA when not on TPU (CPU tests) or when the attention
    probabilities are requested (demo heatmaps need them — reference
    demo.py:96-151).
    """
    if return_probs:
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32) * scale
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, _NEG_INF)
        probs = jax.nn.softmax((scores + bias).astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return out, probs
    if impl is None:
        # default: bf16 S² materialisation on TPU (halves the attention
        # HBM traffic, 64.6 vs 61.4 pairs/s on the v5e RMCL step; bf16
        # rounding only — see PARITY.md #15), full fp32 elsewhere (CPU
        # tests compare against torch at tight tolerances).
        impl = ("pallas" if use_pallas
                else ("xla_bf16" if _pallas_ok() else "xla"))
    if impl == "xla_bf16":
        return mha_xla_bf16(q, k, v, mask, scale)
    if impl != "xla" and _pallas_ok():
        if impl == "flash":
            return mha_jax_flash(q, k, v, mask, scale)
        from rmcl_tpu.ops.pallas_attention import flash_masked_attention
        return flash_masked_attention(q, k, v, mask, scale)
    return mha_xla(q, k, v, mask, scale)


def _pallas_ok() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
