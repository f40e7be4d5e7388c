"""ViLT single-stream vision-language transformer, pure-functional.

Re-design of reference vilt/modules/vilt_module.py (ViLTransformerSS).
Params live in a nested dict whose top-level keys mirror the reference
state_dict (text_embeddings, token_type_embeddings, transformer, pooler,
task heads, k_* momentum twins) so checkpoint conversion is mechanical.

Mutable training state (MoCo queue + pointer, reference
vilt_module.py:92-93; BarlowTwins BN running stats) is a separate pytree
threaded functionally through the train step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.core.config import RMCLConfig
from rmcl_tpu.models import heads as H
from rmcl_tpu.models import layers as L
from rmcl_tpu.models.text_embeddings import init_text_embeddings, text_embeddings
from rmcl_tpu.models.vit import ViTSpec, init_vit, transformer_apply, visual_embed

MOCO_PROJ_DIM = 128


def _needs(cfg: RMCLConfig, name: str) -> bool:
    return cfg.loss_names.get(name, 0) > 0


def _pure_dp(mesh) -> bool:
    """True when every non-"data" mesh axis has size 1 — the layout
    where the per-sample transformer can run per-shard (no tensor
    parallelism splitting C/heads across devices)."""
    if mesh is None:
        return False
    from rmcl_tpu.parallel.mesh import DATA_AXIS
    return all(v == 1 for a, v in dict(mesh.shape).items()
               if a != DATA_AXIS)


def _kernels_ok(cfg: RMCLConfig, mesh) -> bool:
    """The fused Pallas half-block kernels engage on TPU when either a
    single chip is in play, or a pure-DP Mesh object is provided (the
    transformer then runs per-shard via jax.shard_map — see
    models/vit.py:transformer_apply).  Multi-device WITHOUT a mesh
    object, or with a model axis, keeps the XLA path: pallas_call is
    an opaque custom call to pjit's partitioner."""
    import math
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not (on_tpu and cfg.block_layout == "3d"):
        return False
    return math.prod(cfg.mesh_shape) == 1 or _pure_dp(mesh)


def _derive_attn_impl(cfg: RMCLConfig, mesh=None) -> str:
    """cfg.attention_impl="" derives the measured-best implementation:
    the fused LN1+qkv+attention+proj Pallas half-block kernel
    (ops/pallas_block.py) on a single TPU chip or a pure-DP mesh
    (b16 197.3 ms vs 199.3 xla_bf16; b64 773 vs 891 — kills the b64
    droop; attack hot path 782 -> 670 ms), else "" (-> xla_bf16 on TPU
    inside masked_attention, plain xla elsewhere)."""
    if cfg.attention_impl:
        return cfg.attention_impl
    return "fused" if _kernels_ok(cfg, mesh) else ""


def _derive_mlp_impl(cfg: RMCLConfig, mesh=None) -> str:
    """Same derivation as _derive_attn_impl: the fused LN2+fc1+gelu+fc2
    Pallas kernel (ops/pallas_block.py).
    "fused_train" (in-kernel-dropout variant that ALSO covers the
    training views) needs the raised scoped-vmem limit for its VMEM
    weight-grad accumulators, so it is only derived when the entry
    point installed the LIBTPU flag (core/tpu_env.py); otherwise
    "fused" covers the deterministic forwards (PGD, key encoder,
    candidate scoring, eval) and the views keep the XLA MLP."""
    if cfg.mlp_impl:
        return cfg.mlp_impl
    if _kernels_ok(cfg, mesh):
        from rmcl_tpu.core.tpu_env import scoped_vmem_flag_active
        return "fused_train" if scoped_vmem_flag_active() else "fused"
    return ""


def _derive_remat(cfg: RMCLConfig, attn_impl: str, mlp_impl: str) -> bool:
    """cfg.remat_blocks=None derives the measured-best setting.

    With BOTH halves running as custom_vjp Pallas kernels
    (attn "fused" + mlp "fused_train"), each half's residuals are just
    (x, weights) and its backward kernel recomputes the forward in VMEM
    — so jax.checkpoint's replay duplicates work the backward already
    does.  Measured b16: 170.8 -> 157.4 ms (101.7 pairs/s), attacked
    one-program 551 -> 532 ms; b64 fits (the kernels keep the (S,4C)/S²
    intermediates out of HBM, which was the OOM driver).  Every other
    path keeps remat ON on TPU: the XLA block saves bias-broadcast fp32
    S² residuals without it (253 vs 199 ms b16; b64 OOM — ROADMAP), and
    the plain "fused" MLP derives weight grads from an XLA twin whose
    saved (S,4C) intermediates reintroduce the same pressure.  Off-TPU
    (CPU tests) remat only slows the small shapes down."""
    if cfg.remat_blocks is not None:
        return cfg.remat_blocks
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return False
    return not (attn_impl == "fused" and mlp_impl == "fused_train")


def make_spec(cfg: RMCLConfig, mesh=None) -> ViTSpec:
    attn_impl = _derive_attn_impl(cfg, mesh)
    mlp_impl = _derive_mlp_impl(cfg, mesh)
    shard_mesh = None
    if (mesh is not None and _pure_dp(mesh) and mesh.devices.size > 1
            and (attn_impl == "fused"
                 or mlp_impl in ("fused", "fused_train"))):
        shard_mesh = mesh
    return ViTSpec(
        shard_mesh=shard_mesh,
        hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads,
        num_layers=cfg.num_layers,
        mlp_ratio=cfg.mlp_ratio,
        patch_size=cfg.patch_size,
        img_size=cfg.image_size,
        drop_rate=cfg.drop_rate,
        use_pallas=cfg.use_pallas_attention,
        remat=_derive_remat(cfg, attn_impl, mlp_impl),
        remat_policy=cfg.remat_policy,
        attn_impl=attn_impl,
        dropout_impl=cfg.dropout_impl,
        block_layout=cfg.block_layout,
        mlp_impl=mlp_impl,
    )


def init_vilt(key, cfg: RMCLConfig):
    """Returns (params, state).  Construction mirrors reference
    vilt_module.py:20-250 (heads built per active loss)."""
    spec = make_spec(cfg)
    ks = iter(jax.random.split(key, 24))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    params["text_embeddings"] = init_text_embeddings(
        next(ks), cfg.vocab_size, cfg.hidden_size, cfg.max_text_len)

    n_token_types = 3 if (_needs(cfg, "nlvr2") or _needs(cfg, "nlvr2_attacked")) else 2
    tte = L.embedding_init(next(ks), n_token_types, cfg.hidden_size)
    if n_token_types == 3:
        # row 2 initialised from row 1 (reference vilt_module.py:201-206)
        w = tte["weight"]
        tte = {"weight": w.at[2].set(w[1])}
    params["token_type_embeddings"] = tte

    params["transformer"] = init_vit(next(ks), spec)
    params["pooler"] = H.init_pooler(next(ks), cfg.hidden_size)

    if _needs(cfg, "mlm"):
        params["mlm_score"] = H.init_mlm_head(next(ks), cfg.hidden_size, cfg.vocab_size)
    if _needs(cfg, "itm") or _needs(cfg, "irtr"):
        params["itm_score"] = H.init_itm_head(next(ks), cfg.hidden_size)
    if _needs(cfg, "mpp"):
        params["mpp_score"] = H.init_mpp_head(next(ks), cfg.hidden_size)
    if _needs(cfg, "mppd"):
        params["mppd_score"] = H.init_mppd_head(
            next(ks), cfg.hidden_size, cfg.patch_size ** 2 * 3)
    if _needs(cfg, "mpfr"):
        params["mpfr_score"] = H.init_mpfr_head(
            next(ks), cfg.hidden_size, cfg.hidden_size)

    if _needs(cfg, "moco"):
        params["moco_head"] = H.init_moco_head(
            next(ks), cfg.hidden_size, cfg.hidden_size, MOCO_PROJ_DIM)
        # momentum twins start as exact copies (reference _shadow_layer :270-273)
        params["k_text_embeddings"] = jax.tree.map(jnp.copy, params["text_embeddings"])
        params["k_token_type_embeddings"] = jax.tree.map(jnp.copy, params["token_type_embeddings"])
        params["k_transformer"] = jax.tree.map(jnp.copy, params["transformer"])
        params["k_moco_head"] = jax.tree.map(jnp.copy, params["moco_head"])
        # queue initialised with random UNnormalised vectors (reference
        # :92-94).  Storage dtype follows cfg.queue_dtype (default: the
        # compute dtype — bf16 on TPU halves the l_neg HBM reads every
        # InfoNCE/attack-scoring call; the keys are l2-normalized
        # projections, bf16 rounding is ~0.4% relative — PARITY #17)
        qdt = jnp.dtype(cfg.queue_dtype or cfg.compute_dtype)
        state["proj_queue"] = jax.random.normal(
            next(ks), (MOCO_PROJ_DIM, cfg.num_negative), jnp.float32
        ).astype(qdt)
        state["proj_queue_ptr"] = jnp.zeros((), jnp.int32)

    if _needs(cfg, "barlowtwins"):
        d1, d2, dout = getattr(cfg, "bt_proj_dims", (8192, 8192, 8192))
        params["barlowtwins_head"] = H.init_barlowtwins_head(
            next(ks), cfg.hidden_size, [d1, d2], dout)

    if _needs(cfg, "vqa") or _needs(cfg, "vqa_attacked"):
        params["vqa_classifier"] = H.init_vqa_classifier(
            next(ks), cfg.hidden_size, cfg.vqav2_label_size)

    if _needs(cfg, "nlvr2") or _needs(cfg, "nlvr2_attacked"):
        params["nlvr2_classifier"] = H.init_nlvr2_classifier(next(ks), cfg.hidden_size)

    if _needs(cfg, "irtr"):
        params["rank_output"] = H.init_rank_output_from_itm(params["itm_score"])

    if _needs(cfg, "irtr_attacked"):
        params["moco_head"] = H.init_moco_head(
            next(ks), cfg.hidden_size, cfg.hidden_size, MOCO_PROJ_DIM)

    return params, state


# ---------------------------------------------------------------------
def infer(params, batch, *, cfg: RMCLConfig, spec: Optional[ViTSpec] = None,
          mask_text: bool = False, mask_image: bool = False,
          image_token_type_idx: int = 1,
          image_embeds=None, image_masks=None,
          rng=None, deterministic: bool = True, prefix: str = "",
          word_embeds=None):
    """Single-stream forward (reference vilt_module.py:275-351).

    `prefix="k_"` routes through the momentum twins — same compiled graph
    as the query path, just different leaves (reference infer_k :353-418).
    Returns the same feature dict as the reference.
    """
    spec = spec or make_spec(cfg)
    dtype = jnp.dtype(cfg.compute_dtype)

    te = params[prefix + "text_embeddings"]
    tte = params[prefix + "token_type_embeddings"]
    tr = params[prefix + "transformer"]

    if f"image_{image_token_type_idx - 1}" in batch:
        imgkey = f"image_{image_token_type_idx - 1}"
    else:
        imgkey = "image"

    do_mlm = "_mlm" if mask_text else ""
    text_ids = batch[f"text_ids{do_mlm}"]
    text_labels = batch.get(f"text_labels{do_mlm}")
    text_masks = batch["text_masks"]

    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    text_embeds = text_embeddings(
        te, text_ids, drop_rate=cfg.drop_rate, rng=rngs[0],
        deterministic=deterministic, dtype=dtype, word_embeds=word_embeds,
        dropout_impl=cfg.dropout_impl)

    if image_embeds is None and image_masks is None:
        img = batch[imgkey]
        if img.dtype == jnp.uint8:
            # u8 wire format — defensive; the jitted entry points
            # already normalize whole batches (PARITY #26)
            from rmcl_tpu.models.vit import _normalize_u8
            img = _normalize_u8(
                img, batch.get(f"{imgkey}_hw"), cfg.grid_hw, cfg.patch_size)
        image_embeds, image_masks, patch_index, image_labels = visual_embed(
            tr, img, spec=spec, max_image_len=cfg.max_image_len,
            mask_it=mask_image, rng=rngs[1], deterministic=deterministic,
            dtype=dtype,
            grid_hw=cfg.grid_hw if img.ndim == 3 else None)
    else:
        patch_index, image_labels = None, None
        image_embeds = image_embeds.astype(dtype)

    tte_w = tte["weight"]
    text_embeds = text_embeds + tte_w[0].astype(dtype)
    image_embeds = image_embeds + tte_w[image_token_type_idx].astype(dtype)

    co_embeds = jnp.concatenate([text_embeds, image_embeds], axis=1)
    co_masks = jnp.concatenate(
        [text_masks.astype(jnp.int32), image_masks.astype(jnp.int32)], axis=1)

    x = transformer_apply(tr, co_embeds, co_masks, spec=spec, rng=rngs[2],
                          deterministic=deterministic)

    T = text_embeds.shape[1]
    text_feats, image_feats = x[:, :T], x[:, T:]
    cls_feats = H.pooler(params[prefix + "pooler"] if prefix + "pooler" in params
                         else params["pooler"], x)

    return {
        "text_feats": text_feats,
        "image_feats": image_feats,
        "cls_feats": cls_feats,
        "raw_cls_feats": x[:, 0],
        "image_labels": image_labels,
        "image_masks": image_masks,
        "text_labels": text_labels,
        "text_ids": text_ids,
        "text_masks": text_masks,
        "patch_index": patch_index,
    }


class ViLTModel:
    """Thin convenience wrapper binding a config to the pure functions.

    ``mesh``: a pure-DP Mesh routes the transformer through the fused
    Pallas kernels per-shard (jax.shard_map) instead of the XLA block
    path — see make_spec/_kernels_ok."""

    def __init__(self, cfg: RMCLConfig, mesh=None):
        self.cfg = cfg
        self.spec = make_spec(cfg, mesh)

    def init(self, rng):
        return init_vilt(rng, self.cfg)

    def infer(self, params, batch, **kw):
        return infer(params, batch, cfg=self.cfg, spec=self.spec, **kw)

    def infer_k(self, params, batch, **kw):
        return infer(params, batch, cfg=self.cfg, spec=self.spec,
                     prefix="k_", **kw)
