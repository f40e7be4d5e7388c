"""TPU-native ViT backbone for single-stream ViLT.

Re-designs reference vilt/modules/vision_transformer.py for XLA static
shapes:

* patchify = reshape + one big matmul (MXU) instead of conv2d
  (reference PatchEmbed, vision_transformer.py:378-408 — stride==kernel
  conv is exactly a patch matmul).
* per-sample bilinear pos-embed interpolation (reference :570-586, a
  Python loop of F.interpolate calls with data-dependent (h, w)) becomes
  a batched einsum with per-sample bilinear weight matrices of *static*
  shape — same align_corners=True math, no dynamic shapes, fully vmapped.
* valid-patch mask (reference :564-567 nearest-interpolated zero-mask)
  becomes a strided top-left-pixel sample — identical semantics for
  top-left-anchored zero padding.
* variable-length patch selection (reference :605-651: multinomial
  subsample / random pad-fill) becomes a deterministic stable sort by
  validity: valid patches first in row-major order, truncated/padded to a
  static length.  Pad slots carry mask=0 so they are invisible to
  attention and losses; numerics can differ from the reference's random
  choice only when an image has more valid patches than max_image_len
  (the reference itself is nondeterministic there, cf. EVAL.md:2).
* 12 transformer blocks run under lax.scan over stacked per-layer params;
  attention uses the fused Pallas kernel on TPU.

LayerNorm eps inside the ViT is 1e-6 (reference :466 norm_layer).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rmcl_tpu.models import layers as L
from rmcl_tpu.ops.attention import masked_attention

VIT_LN_EPS = 1e-6


class ViTSpec(NamedTuple):
    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 12
    mlp_ratio: int = 4
    patch_size: int = 32
    img_size: int = 384           # pretraining grid the pos-embed lives on
    drop_rate: float = 0.1
    use_pallas: bool = True
    remat: bool = False
    remat_policy: str = "full"  # "full" | "dots" (save matmul outputs)
    attn_impl: str = ""         # "" -> derive from use_pallas; else
                                # "xla" | "xla_bf16" | "pallas" | "flash"
                                # | "fused" (LN1+qkv+attn+proj Pallas
                                #   half-block, ops/pallas_block.py)
    dropout_impl: str = "fp32"  # "fp32" | "pack8" | "rbg" (layers.dropout)
    block_layout: str = "3d"    # "3d" | "2d" (flat B*S scan carry)
    mlp_impl: str = ""          # "" | "xla" | "fused" (LN2+fc1+gelu+fc2
                                #   Pallas kernel, deterministic paths
                                #   only — ops/pallas_block.py)
    shard_mesh: Any = None      # pure-DP Mesh: run the fused kernels
                                # per-shard via jax.shard_map over the
                                # "data" axis (pallas_call is opaque to
                                # pjit's partitioner, so without this
                                # multi-chip meshes fell back to XLA)

    @property
    def patch_dim(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# ------------------------------------------------------------------ init
def init_block(key, spec: ViTSpec) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    C = spec.hidden_size
    return {
        "norm1": L.layer_norm_init(C),
        "attn": {
            "qkv": L.linear_init(ks[0], C, 3 * C),
            "proj": L.linear_init(ks[1], C, C),
        },
        "norm2": L.layer_norm_init(C),
        "mlp": {
            "fc1": L.linear_init(ks[2], C, C * spec.mlp_ratio),
            "fc2": L.linear_init(ks[3], C * spec.mlp_ratio, C),
        },
    }


def init_vit(key, spec: ViTSpec) -> Dict[str, Any]:
    C, P = spec.hidden_size, spec.patch_size
    n_pos = spec.patch_dim * spec.patch_dim + 1
    k_patch, k_pos, k_cls, *k_blocks = jax.random.split(key, 3 + spec.num_layers)
    blocks = [init_block(k, spec) for k in k_blocks]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "patch_embed": {
            # stored as (P*P*3, C) ready for the patchify matmul;
            # flat index order is (ph, pw, channel)
            "proj": {"kernel": L.trunc_normal(k_patch, (P * P * 3, C)),
                     "bias": jnp.zeros((C,), jnp.float32)},
        },
        "cls_token": L.trunc_normal(k_cls, (1, 1, C)),
        "pos_embed": L.trunc_normal(k_pos, (1, n_pos, C)),
        "mask_token": jnp.zeros((C,), jnp.float32),
        "blocks": stacked,
        "norm": L.layer_norm_init(C),
    }


# ------------------------------------------------------------- patchify
def patchify(params, img, dtype=jnp.bfloat16):
    """img: (B, H, W, 3) -> (B, gh*gw, C) as one einsum contraction over
    the (P, P, 3) patch window (the reference's Conv2d(P, stride=P),
    vision_transformer.py:378-408).

    Formulation measured on v5e at (16, 384, 576, 3) fwd+bwd-to-pixels
    (the PGD inner loop's hot path): einsum lets XLA plan the
    space-to-depth layout; lax.conv_general_dilated is catastrophically
    slow backward here (409 ms) and an explicit 6-D transpose + matmul
    costs 7.4 ms."""
    B, H, W, _ = img.shape
    K = params["proj"]["kernel"]
    P = int(round((K.shape[0] / 3) ** 0.5))
    C = K.shape[1]
    gh, gw = H // P, W // P
    x = img.reshape(B, gh, P, gw, P, 3).astype(dtype)
    kernel = K.reshape(P, P, 3, C).astype(dtype)
    x = jnp.einsum("bhpwqc,pqcd->bhwd", x, kernel,
                   preferred_element_type=dtype)
    return (x.reshape(B, gh * gw, C)
            + params["proj"]["bias"].astype(dtype))


# ----------------------------------------------- pos-embed interpolation
def _bilinear_weights(n_out: int, size, n_src: int):
    """(n_out, n_src) align_corners=True bilinear row-weight matrix for a
    traced valid length `size`; rows >= size are zero (pad region)."""
    r = jnp.arange(n_out, dtype=jnp.float32)
    denom = jnp.maximum(size - 1, 1).astype(jnp.float32)
    src = r * (n_src - 1) / denom
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_src - 1)
    i1 = jnp.minimum(i0 + 1, n_src - 1)
    t = src - i0.astype(jnp.float32)
    cols = jnp.arange(n_src)
    w = (
        (cols[None, :] == i0[:, None]) * (1.0 - t[:, None])
        + (cols[None, :] == i1[:, None]) * t[:, None]
    )
    return w * (r[:, None] < size)


def resample_pos_embed(spatial_pos, h, w, gh: int, gw: int):
    """spatial_pos: (S, S, C); h, w traced per-sample valid grid dims.
    Returns (gh, gw, C): bilinear to (h, w), zero-padded to (gh, gw) —
    the static-shape equivalent of reference vision_transformer.py:570-586.
    """
    S = spatial_pos.shape[0]
    R = _bilinear_weights(gh, h, S)       # (gh, S)
    Cw = _bilinear_weights(gw, w, S)      # (gw, S)
    return jnp.einsum("rs,stc,wt->rwc", R, spatial_pos.astype(jnp.float32), Cw)


# ------------------------------------------------------------ mask_tokens
def to_patch_rows(img, patch_size: int):
    """(B, H, W, 3) -> (B, gh*gw, P*P*3) rows in (ph, pw, ch) flat order."""
    B, H, W, _ = img.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = img.reshape(B, gh, P, gw, P, 3)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, P * P * 3)


def from_patch_rows(rows, grid_hw, patch_size: int):
    """(B, gh*gw, P*P*3) -> (B, H, W, 3): inverse of to_patch_rows."""
    gh, gw = grid_hw
    B = rows.shape[0]
    P = patch_size
    x = rows.reshape(B, gh, gw, P, P, 3)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * P, gw * P, 3)


def patch_mean_rgb(rows):
    """(B, N, P*P*3) -> per-patch mean RGB (B, N, 3)."""
    B, N, F = rows.shape
    return rows.reshape(B, N, F // 3, 3).mean(axis=2)


def mask_tokens(rng, img, feats, mask_token, patch_size: int,
                mask_prob: float = 0.15, replace_prob: float = 0.8):
    """MPP masking (reference vision_transformer.py:525-557).

    Labels = per-patch mean RGB of the unnormalised image, 256-binned per
    channel; non-masked positions -100; 80% of masked patches get the
    learned mask token.  `img` may be (B, H, W, 3) or patch rows
    (B, N, P*P*3)."""
    rows = img if img.ndim == 3 else to_patch_rows(img, patch_size)
    pm = patch_mean_rgb(rows * 0.5 + 0.5)
    B = rows.shape[0]
    labels = jnp.clip((pm * 255).astype(jnp.int32), 0, 255)

    k1, k2 = jax.random.split(rng)
    masked = jax.random.bernoulli(k1, mask_prob, labels.shape[:-1])
    labels = jnp.where(masked[..., None], labels, -100)
    replaced = jnp.logical_and(
        jax.random.bernoulli(k2, replace_prob, labels.shape[:-1]), masked)
    feats = jnp.where(replaced[..., None], mask_token.astype(feats.dtype), feats)
    return feats, labels


# ------------------------------------------------------------ visual embed
def visual_embed(params, img, *, spec: ViTSpec, max_image_len: int = -1,
                 mask_it: bool = False, rng=None, deterministic: bool = True,
                 dtype=jnp.bfloat16, grid_hw=None):
    """img: (B, H, W, 3) canvas zero-padded top-left, OR pre-patchified
    rows (B, N, P*P*3) with `grid_hw=(gh, gw)` — the TPU-native layout:
    the channels-last pixel canvas has a 3-wide minor dim that wastes
    125/128 lanes on every elementwise op (the PGD inner loop lives in
    image space), while patch rows put 3072 in the lane dim and make
    patchify a single MXU matmul with no 6-D transpose.

    Returns (x (B, L+1, C), x_mask (B, L+1) int32,
             (patch_index (B, L, 2), (gh, gw)), labels or None).
    """
    P = spec.patch_size
    if img.ndim == 3:                       # patch rows
        assert grid_hw is not None, "patch-row layout needs grid_hw"
        gh, gw = grid_hw
        B, N, _ = img.shape
        K = params["patch_embed"]["proj"]
        x = (img.astype(dtype) @ K["kernel"].astype(dtype)
             + K["bias"].astype(dtype))
        # top-left pixel of each patch = flat elements 0..2 (ph=pw=0)
        m = (jnp.sum(img[:, :, :3], axis=-1) != 0).reshape(B, gh, gw)
    else:
        B, H, W, _ = img.shape
        gh, gw = H // P, W // P
        N = gh * gw
        x = patchify(params["patch_embed"], img, dtype=dtype)   # (B, N, C)
        pix_valid = jnp.sum(img, axis=-1) != 0                  # (B, H, W)
        m = pix_valid[:, ::P, ::P]                              # (B, gh, gw)
    x_h = m[:, :, 0].sum(axis=1)                                # (B,)
    x_w = m[:, 0, :].sum(axis=1)

    spatial = params["pos_embed"][0, 1:, :].reshape(
        spec.patch_dim, spec.patch_dim, spec.hidden_size)
    pos = jax.vmap(lambda h, w: resample_pos_embed(spatial, h, w, gh, gw))(
        x_h, x_w)                                               # (B, gh, gw, C)
    pos = pos.reshape(B, N, spec.hidden_size)

    mask_flat = m.reshape(B, N)
    pidx = jnp.stack(
        jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij"),
        axis=-1).reshape(N, 2)
    patch_index = jnp.broadcast_to(pidx[None], (B, N, 2))

    labels = None
    if mask_it:
        x, labels = mask_tokens(rng, img, x, params["mask_token"], P)

    Lsel = N if (max_image_len is None or max_image_len <= 0) else min(N, max_image_len)
    if Lsel < N:
        # deterministic replacement for reference multinomial select
        order = jnp.argsort(jnp.where(mask_flat, 0, 1), axis=1, stable=True)
        sel = order[:, :Lsel]
        x = jnp.take_along_axis(x, sel[..., None], axis=1)
        mask_flat = jnp.take_along_axis(mask_flat, sel, axis=1)
        pos = jnp.take_along_axis(pos, sel[..., None], axis=1)
        patch_index = jnp.take_along_axis(patch_index, sel[..., None], axis=1)
        if labels is not None:
            labels = jnp.take_along_axis(labels, sel[..., None], axis=1)

    if labels is not None:
        labels = jnp.where(mask_flat[..., None], labels, -100)
        labels = jnp.concatenate(
            [jnp.full((B, 1, 3), -100, labels.dtype), labels], axis=1)

    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (B, 1, spec.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    pos_full = jnp.concatenate(
        [jnp.broadcast_to(params["pos_embed"][:, :1, :], (B, 1, spec.hidden_size)),
         pos], axis=1)
    x = x + pos_full.astype(dtype)
    if not deterministic and rng is not None:
        rng, sub = jax.random.split(rng)
        x = L.dropout(x, spec.drop_rate, sub, deterministic,
                      impl=spec.dropout_impl)

    x_mask = jnp.concatenate(
        [jnp.ones((B, 1), jnp.int32), mask_flat.astype(jnp.int32)], axis=1)

    return x, x_mask, (patch_index, (gh, gw)), labels


# ---------------------------------------------------- u8 wire format
def _normalize_u8(v, hw, grid_hw, P):
    """(x/255 - 0.5)/0.5 in f32 — the SAME op sequence as the host LUT
    (data/_native/imageproc.cpp:ip_normalize_hwc), so valid pixels are
    bit-identical to the f32 pipeline; padding is forced to exactly 0.0
    from the per-sample (h, w) rect at PIXEL granularity (u8 padding is
    0, which would normalize to -1 and corrupt the pixel-derived
    validity masks; per-pixel so partial edge patches of non-/P images
    keep exactly the pixels the f32 canvas keeps)."""
    x = (v.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    if hw is None:
        return x
    if v.ndim == 3:                       # patch rows (B, N, P*P*3)
        if grid_hw is None or v.shape[1] != grid_hw[0] * grid_hw[1]:
            raise ValueError(
                f"u8 patch-row batch with hw metadata needs the static "
                f"bucket grid: got N={v.shape[1]}, grid_hw={grid_hw}")
        gw = grid_hw[1]
        n = jnp.arange(v.shape[1], dtype=jnp.int32)          # (N,)
        e = jnp.arange(v.shape[2], dtype=jnp.int32)          # (P*P*3,)
        py = (n // gw)[:, None] * P + e[None, :] // (P * 3)  # (N, E) pixel y
        px = (n % gw)[:, None] * P + (e[None, :] % (P * 3)) // 3
        valid = ((py[None] < hw[:, 0, None, None])
                 & (px[None] < hw[:, 1, None, None]))        # (B, N, E)
        return jnp.where(valid, x, 0.0)
    yy = jnp.arange(v.shape[1], dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(v.shape[2], dtype=jnp.int32)[None, None, :]
    valid = (yy < hw[:, 0, None, None]) & (xx < hw[:, 1, None, None])
    return jnp.where(valid[..., None], x, 0.0)


def normalize_image_inputs(batch, *, grid_hw, patch_size):
    """Convert every uint8 image key of the u8 wire format (PARITY #26)
    into the f32 pipeline's tensors, bit-exactly.  Ships 4x fewer
    host->device bytes; call once at jitted-program entry.  No-op (and
    no retrace hazard) when the batch already carries f32 images."""
    out = None
    for k in list(batch):
        v = batch[k]
        if (getattr(v, "dtype", None) == jnp.uint8 and "image" in k
                and not k.endswith("_hw")):
            if out is None:
                out = dict(batch)
            out[k] = _normalize_u8(v, batch.get(f"{k}_hw"),
                                   grid_hw, patch_size)
    return batch if out is None else out


# ------------------------------------------- hoisted-geometry fast path
class VisualPrep(NamedTuple):
    """δ-invariant visual-embed geometry, computed once from the CLEAN
    image so the PGD inner loop (attacks/pgd.py) pays only
    rows @ patch-kernel per iteration.

    Equivalence proof sketch (why hoisting matches the reference's
    per-iteration recompute, attack/pgd_attack_vilt.py:130-175 → its
    mini-ViLT visual_embed): pad patches are masked as attention keys and
    their own outputs are never read into cls_feats, so dL/dδ is exactly
    zero on padding pixels; δ therefore stays 0 there through every
    iteration and the recomputed validity mask / pos-embed interpolation /
    patch selection are invariant.  Valid-but-unselected patches likewise
    get zero gradient.  tests/test_attacks.py asserts fast == slow."""
    rows_sel: Any        # (B, L, P*P*3) selected clean patch rows
    sel: Any             # (B, L) int32 indices into the N-patch grid, or None
    pos_full: Any        # (B, L+1, C) fp32 pos embeds incl the CLS row
    x_mask: Any          # (B, L+1) int32
    n_patches: int       # N = gh*gw


def visual_embed_prepare(params, img, *, spec: ViTSpec,
                         max_image_len: int = -1,
                         grid_hw=None) -> VisualPrep:
    """Compute everything in visual_embed that does not depend on a pixel
    perturbation.  `img`: (B, H, W, 3) canvas or (B, N, P*P*3) patch rows."""
    P = spec.patch_size
    if img.ndim == 4:
        _, H, W, _ = img.shape
        grid_hw = (H // P, W // P)
        img = to_patch_rows(img, P)
    if grid_hw is None:
        raise ValueError("visual_embed_prepare needs grid_hw for patch rows")
    gh, gw = grid_hw
    B, N, _ = img.shape
    m = (jnp.sum(img[:, :, :3], axis=-1) != 0).reshape(B, gh, gw)
    x_h = m[:, :, 0].sum(axis=1)
    x_w = m[:, 0, :].sum(axis=1)

    spatial = params["pos_embed"][0, 1:, :].reshape(
        spec.patch_dim, spec.patch_dim, spec.hidden_size)
    pos = jax.vmap(lambda h, w: resample_pos_embed(spatial, h, w, gh, gw))(
        x_h, x_w).reshape(B, N, spec.hidden_size)

    mask_flat = m.reshape(B, N)
    Lsel = N if (max_image_len is None or max_image_len <= 0) else min(N, max_image_len)
    rows = img
    sel = None
    if Lsel < N:
        order = jnp.argsort(jnp.where(mask_flat, 0, 1), axis=1, stable=True)
        sel = order[:, :Lsel]
        rows = jnp.take_along_axis(img, sel[..., None], axis=1)
        mask_flat = jnp.take_along_axis(mask_flat, sel, axis=1)
        pos = jnp.take_along_axis(pos, sel[..., None], axis=1)

    pos_full = jnp.concatenate(
        [jnp.broadcast_to(params["pos_embed"][:, :1, :].astype(jnp.float32),
                          (B, 1, spec.hidden_size)),
         pos], axis=1)
    x_mask = jnp.concatenate(
        [jnp.ones((B, 1), jnp.int32), mask_flat.astype(jnp.int32)], axis=1)
    return VisualPrep(rows_sel=rows, sel=sel, pos_full=pos_full,
                      x_mask=x_mask, n_patches=N)


def visual_embed_from_prep(params, prep: VisualPrep, delta_sel=None, *,
                           spec: ViTSpec, dtype=jnp.bfloat16):
    """Patch-rows → embeddings using precomputed geometry.  Per PGD
    iteration this is ONE matmul + the pos/cls adds — no mask recompute,
    no pos-embed interpolation VJP, no gather/scatter in the AD graph.
    Returns (x (B, L+1, C), x_mask)."""
    rows = prep.rows_sel if delta_sel is None else prep.rows_sel + delta_sel
    K = params["patch_embed"]["proj"]
    x = (rows.astype(dtype) @ K["kernel"].astype(dtype)
         + K["bias"].astype(dtype))
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (B, 1, spec.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + prep.pos_full.astype(dtype)
    return x, prep.x_mask


def scatter_delta(prep: VisualPrep, delta_sel):
    """Expand a selected-space δ (B, L, F) back to full patch rows
    (B, N, F); unselected rows provably carry zero gradient so zero-fill
    is exact."""
    B, L, F = delta_sel.shape
    if prep.sel is None:
        return delta_sel
    out = jnp.zeros((B, prep.n_patches, F), delta_sel.dtype)
    return out.at[jnp.arange(B)[:, None], prep.sel].set(delta_sel)


# ---------------------------------------------------------------- blocks
def block_forward(bp, x, mask, *, spec: ViTSpec, rng=None,
                  deterministic: bool = True):
    """Pre-norm transformer block (reference vision_transformer.py:335-376).

    Activations stay (B, S, C): a flat (B*S, C) variant measured 0.8
    ms/stack FASTER forward-only (ROADMAP fwd decomposition) but 28%
    SLOWER at full-step level (255 vs 199 ms b16) — the reshape in/out
    of the remat'd scan body breaks XLA's backward fusion."""
    B, S, C = x.shape
    Hh, D = spec.num_heads, spec.head_dim
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3

    if spec.attn_impl == "fused":
        # one Pallas kernel for LN1 + qkv + attention + proj
        # (ops/pallas_block.py); dropout + residual stay outside so the
        # RNG stream and remat structure match the unfused path.
        # Deterministic callers (PGD, key encoder, candidate scoring,
        # eval) take the _det variant whose backward skips the
        # weight-grad intermediate HBM writes (they only ever
        # differentiate to the input).
        from rmcl_tpu.ops.pallas_block import (fused_attn_half,
                                               fused_attn_half_det)
        if deterministic:
            # post-attention dropout is a no-op, so the residual add
            # fuses into the kernel (residual=True) and the XLA
            # dropout+add below are skipped entirely
            x = fused_attn_half_det(
                x, mask, bp["norm1"]["weight"], bp["norm1"]["bias"],
                bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"],
                bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"],
                Hh, D ** -0.5, VIT_LN_EPS, True)
            attn = None
        elif (spec.mlp_impl == "fused_train" and rngs[0] is not None
              and spec.drop_rate > 0.0):
            # training attention half with IN-KERNEL dropout + residual
            # + in-kernel weight-grad accumulation; gated with the MLP
            # train kernel since both need the raised scoped-vmem limit
            # (models/vilt.py:_derive_mlp_impl).  Mask stream = Mosaic
            # PRNG (PARITY #19/#20); rngs[0] still seeds it.
            from rmcl_tpu.ops.pallas_block import fused_attn_half_train
            seeds0 = jax.lax.bitcast_convert_type(
                jax.random.bits(rngs[0], (B,), jnp.uint32), jnp.int32)
            x = fused_attn_half_train(
                x, seeds0, mask,
                bp["norm1"]["weight"], bp["norm1"]["bias"],
                bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"],
                bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"],
                Hh, D ** -0.5, VIT_LN_EPS, spec.drop_rate)
            attn = None
        else:
            attn = fused_attn_half(
                x, mask, bp["norm1"]["weight"], bp["norm1"]["bias"],
                bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"],
                bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"],
                Hh, D ** -0.5, VIT_LN_EPS)
    else:
        y = L.layer_norm(bp["norm1"], x, eps=VIT_LN_EPS)
        qkv = L.linear(bp["attn"]["qkv"], y).reshape(B, S, 3, Hh, D)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        attn = masked_attention(q, k, v, mask, D ** -0.5,
                                use_pallas=spec.use_pallas,
                                impl=spec.attn_impl or None)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, C)
        attn = L.linear(bp["attn"]["proj"], attn)
    if attn is not None:
        attn = L.dropout(attn, spec.drop_rate, rngs[0], deterministic,
                         impl=spec.dropout_impl)
        x = x + attn

    if (spec.mlp_impl in ("fused", "fused_train")
            and (deterministic or spec.drop_rate == 0.0)):
        # one Pallas kernel for LN2 + fc1 + gelu + fc2 + residual;
        # legal when the in-MLP dropout (rngs[1]) is a no-op, i.e.
        # deterministic forwards — PGD, key encoder, candidate
        # scoring, eval
        from rmcl_tpu.ops.pallas_block import fused_mlp_half
        return fused_mlp_half(
            x, bp["norm2"]["weight"], bp["norm2"]["bias"],
            bp["mlp"]["fc1"]["kernel"], bp["mlp"]["fc1"]["bias"],
            bp["mlp"]["fc2"]["kernel"], bp["mlp"]["fc2"]["bias"],
            VIT_LN_EPS, True)

    if spec.mlp_impl == "fused_train" and rngs[1] is not None:
        # training MLP half as one Pallas kernel with IN-KERNEL
        # dropout (Mosaic PRNG seeded per sample from rngs[1]; the
        # bwd kernel reseeds to regenerate the identical mask).  The
        # mask stream differs from the XLA dropout impls — PARITY #19.
        # The outer dropouts (rngs[0], rngs[2]) stay outside as usual.
        # tail=True folds the post-fc2 dropout (drop2, continued PRNG
        # stream — rngs[2] goes unused, PARITY #20) and the residual
        # add into the same kernel
        from rmcl_tpu.ops.pallas_block import fused_mlp_half_train
        seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(rngs[1], (B,), jnp.uint32), jnp.int32)
        return fused_mlp_half_train(
            x, seeds, bp["norm2"]["weight"], bp["norm2"]["bias"],
            bp["mlp"]["fc1"]["kernel"], bp["mlp"]["fc1"]["bias"],
            bp["mlp"]["fc2"]["kernel"], bp["mlp"]["fc2"]["bias"],
            spec.drop_rate, VIT_LN_EPS, True)

    y = L.layer_norm(bp["norm2"], x, eps=VIT_LN_EPS)
    y = L.gelu(L.linear(bp["mlp"]["fc1"], y))
    y = L.dropout(y, spec.drop_rate, rngs[1], deterministic,
                  impl=spec.dropout_impl)
    y = L.linear(bp["mlp"]["fc2"], y)
    y = L.dropout(y, spec.drop_rate, rngs[2], deterministic,
                  impl=spec.dropout_impl)
    return x + y


def _remat(fn, spec: ViTSpec):
    if spec.remat_policy == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(fn)


def block_forward_2d(bp, x2d, mask, *, spec: ViTSpec, rng=None,
                     deterministic: bool = True):
    """block_forward on FLAT (B*S, C) activations — same math; the 3-D
    view exists only around the attention core, INSIDE the (remat'd)
    scan body, so the scan carry itself stays 2-D.  Opt-in via
    spec.block_layout="2d" (config.block_layout); see ROADMAP's
    fwd-decomposition notes for the layout measurements."""
    B, S = mask.shape
    C = x2d.shape[-1]
    Hh, D = spec.num_heads, spec.head_dim
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    if spec.attn_impl == "fused":
        raise ValueError('attention_impl="fused" requires '
                         'block_layout="3d" (the kernel consumes the '
                         '(B, S, C) activation directly)')

    y = L.layer_norm(bp["norm1"], x2d, eps=VIT_LN_EPS)
    qkv = L.linear(bp["attn"]["qkv"], y).reshape(B, S, 3, Hh, D)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    attn = masked_attention(q, k, v, mask, D ** -0.5,
                            use_pallas=spec.use_pallas,
                            impl=spec.attn_impl or None)
    attn = attn.transpose(0, 2, 1, 3).reshape(B * S, C)
    attn = L.linear(bp["attn"]["proj"], attn)
    attn = L.dropout(attn, spec.drop_rate, rngs[0], deterministic,
                     impl=spec.dropout_impl)
    x2d = x2d + attn

    y = L.layer_norm(bp["norm2"], x2d, eps=VIT_LN_EPS)
    y = L.gelu(L.linear(bp["mlp"]["fc1"], y))
    y = L.dropout(y, spec.drop_rate, rngs[1], deterministic,
                  impl=spec.dropout_impl)
    y = L.linear(bp["mlp"]["fc2"], y)
    y = L.dropout(y, spec.drop_rate, rngs[2], deterministic,
                  impl=spec.dropout_impl)
    return x2d + y


def transformer_apply(params, x, mask, *, spec: ViTSpec, rng=None,
                      deterministic: bool = True):
    """Run all blocks via lax.scan over stacked params, then final norm.

    With ``spec.shard_mesh`` (a pure-DP mesh), the whole stack runs
    per-shard under ``jax.shard_map`` over the "data" axis: the
    transformer is per-sample, so the body needs no collectives, each
    device runs the single-chip fused Pallas kernels on its local
    batch shard, and shard_map's transpose inserts the psum over the
    replicated params' cotangent (the DP gradient reduction XLA used
    to derive from shardings).  Per-shard dropout streams fold in
    ``axis_index("data")``.  Batches not divisible by the data axis
    (e.g. the greedy attack's compact stages) fall back to the XLA
    block path under plain pjit — numerics are bf16-rounding-level
    either way (PARITY #19).

    With a fused Pallas half-block kernel active, the residual stream is
    padded to the kernels' 128-row alignment ONCE here and sliced back
    after the scan, instead of every pallas_call padding its input and
    slicing its output (2 kernels × pad+slice × num_layers full-tensor
    HBM copies per forward).  Pad rows enter as zeros, never receive
    attention (mask 0 ⇒ -inf key bias), and all other ops are row-local,
    so the first S rows are IDENTICAL to the unpadded run; the junk rows
    are dropped by the slice."""
    if spec.shard_mesh is not None:
        from rmcl_tpu.parallel.mesh import DATA_AXIS
        mesh = spec.shard_mesh
        n_data = dict(mesh.shape).get(DATA_AXIS, 1)
        inner = spec._replace(shard_mesh=None)
        if n_data > 1 and x.shape[0] % n_data == 0:
            from jax.sharding import PartitionSpec as P

            def body(params_, x_, mask_, rng_):
                if rng_ is not None:
                    rng_ = jax.random.fold_in(
                        rng_, jax.lax.axis_index(DATA_AXIS))
                return transformer_apply(params_, x_, mask_, spec=inner,
                                         rng=rng_,
                                         deterministic=deterministic)

            if rng is None:
                return jax.shard_map(
                    lambda p, xx, mm: body(p, xx, mm, None), mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS),
                    check_vma=False)(params, x, mask)
            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
                out_specs=P(DATA_AXIS),
                check_vma=False)(params, x, mask, rng)
        # non-divisible (or 1-device) fallback: XLA block path under
        # plain pjit — the kernels would force gathers there.  remat
        # flips back ON: the fused-kernel derivation turned it off,
        # but the XLA blocks save bias-broadcast fp32 S² residuals
        # without it (the documented b64 memory blowup)
        spec = inner._replace(
            attn_impl="" if inner.attn_impl == "fused" else inner.attn_impl,
            mlp_impl="" if inner.mlp_impl in ("fused", "fused_train")
            else inner.mlp_impl,
            remat=True)

    layer_rngs = (jax.random.split(rng, spec.num_layers)
                  if rng is not None else None)

    flat = spec.block_layout == "2d"
    B, S, C = x.shape
    S_orig = S
    if (not flat and (spec.attn_impl == "fused"
                      or spec.mlp_impl in ("fused", "fused_train"))):
        from rmcl_tpu.ops.pallas_block import _S_ALIGN, _round_up
        S_pad = _round_up(S, _S_ALIGN)
        if S_pad != S:
            x = jnp.pad(x, [(0, 0), (0, S_pad - S), (0, 0)])
            mask = jnp.pad(mask, [(0, 0), (0, S_pad - S)])
            S = S_pad
    if flat:
        x = x.reshape(B * S, C)
    fwd = block_forward_2d if flat else block_forward

    def body(carry, inp):
        bp, lrng = inp
        out = fwd(bp, carry, mask, spec=spec, rng=lrng,
                  deterministic=deterministic)
        return out, None

    if spec.remat:
        body = _remat(body, spec)

    xs = (params["blocks"], layer_rngs) if layer_rngs is not None else (
        params["blocks"], None)
    if layer_rngs is None:
        def body_norng(carry, bp):
            out = fwd(bp, carry, mask, spec=spec, rng=None,
                      deterministic=deterministic)
            return out, None
        if spec.remat:
            body_norng = _remat(body_norng, spec)
        x, _ = jax.lax.scan(body_norng, x, params["blocks"])
    else:
        x, _ = jax.lax.scan(body, x, xs)

    if flat:
        x = x.reshape(B, S, C)
    if S != S_orig:
        x = x[:, :S_orig, :]
    return L.layer_norm(params["norm"], x, eps=VIT_LN_EPS)
