"""Pretraining objectives: MLM, MPP, ITM + word-patch alignment.

Behavioural specs: reference vilt/modules/objectives.py
compute_mlm:604-630, compute_mpp:632-665, compute_itm_wpa:714-787.
All are pure jittable functions; the train step sums every `*_loss` key
(reference vilt_module.py:472-477).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rmcl_tpu.objectives.losses import cross_entropy, \
    cross_entropy_per_sample
from rmcl_tpu.objectives.ot import cost_matrix_cosine, ipot, trace_bmm


def compute_mlm(model, params, batch, *, rng=None, train: bool = False):
    infer = model.infer(params, batch, mask_text=True, mask_image=False,
                        rng=rng, deterministic=not train)
    logits = model_mlm_logits(model, params, infer)
    labels = infer["text_labels"]
    loss = cross_entropy(logits.reshape(-1, logits.shape[-1]),
                         labels.reshape(-1))
    loss_ps, loss_wt = cross_entropy_per_sample(logits, labels)
    valid = labels != -100
    correct = (jnp.argmax(logits, -1) == labels) & valid
    return {
        "mlm_loss": loss,
        "mlm_loss_ps": loss_ps,
        "mlm_loss_wt": loss_wt,
        "mlm_logits": logits,
        "mlm_labels": labels,
        "mlm_ids": infer["text_ids"],
        "mlm_step_accuracy": jnp.sum(correct) / jnp.maximum(
            jnp.sum(valid), 1),
    }


def model_mlm_logits(model, params, infer):
    from rmcl_tpu.models.heads import mlm_head
    return mlm_head(params["mlm_score"], infer["text_feats"])


def compute_mpp(model, params, batch, *, rng, train: bool = False):
    from rmcl_tpu.models.heads import mpp_head

    infer = model.infer(params, batch, mask_text=False, mask_image=True,
                        rng=rng, deterministic=not train)
    logits = mpp_head(params["mpp_score"], infer["image_feats"])
    B, S, _ = logits.shape
    logits = logits.reshape(B, S, 3, 256)       # stack of 3x256 RGB bins
    labels = infer["image_labels"]              # (B, S, 3)
    loss = cross_entropy(logits.reshape(-1, 256), labels.reshape(-1))
    loss_ps, loss_wt = cross_entropy_per_sample(logits, labels)
    return {
        "mpp_loss": loss,
        "mpp_loss_ps": loss_ps,
        "mpp_loss_wt": loss_wt,
        "mpp_logits": logits,
        "mpp_labels": labels,
    }


def compute_itm_wpa(model, params, batch, *, rng, train: bool = False,
                    ot_iterations: int = 50):
    """ITM with shuffled negatives + 0.1 * IPOT OT alignment loss."""
    from rmcl_tpu.models.heads import itm_head

    rng, k_perm, k_infer = jax.random.split(rng, 3)
    B = batch["text_ids"].shape[0]
    pos_len = B // 2
    base = jnp.concatenate([jnp.ones((pos_len,), jnp.int32),
                            jnp.zeros((B - pos_len,), jnp.int32)])
    itm_labels = jax.random.permutation(k_perm, base)

    sel = itm_labels.reshape((-1,) + (1,) * (batch["image"].ndim - 1))
    img = jnp.where(sel == 1, batch["image"], batch["false_image_0"])
    mixed = dict(batch)
    mixed["image"] = img

    infer = model.infer(params, mixed, rng=k_infer, deterministic=not train)

    # ---- OT alignment (fp32, no grad through the plan) ----
    txt_emb, img_emb = infer["text_feats"], infer["image_feats"]
    txt_mask = infer["text_masks"].astype(bool)
    img_mask = infer["image_masks"].astype(bool)
    # drop CLS and final SEP from text, CLS from image
    # (reference objectives.py:740-746)
    lens = txt_mask.sum(axis=1)
    pos = jnp.arange(txt_mask.shape[1])[None, :]
    txt_mask = txt_mask & (pos != (lens - 1)[:, None]) & (pos != 0)
    img_mask = img_mask.at[:, 0].set(False)
    txt_pad, img_pad = ~txt_mask, ~img_mask

    cost = cost_matrix_cosine(txt_emb.astype(jnp.float32),
                              img_emb.astype(jnp.float32))
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)
    txt_len = (txt_pad.shape[1] - txt_pad.sum(axis=1)).astype(jnp.float32)
    img_len = (img_pad.shape[1] - img_pad.sum(axis=1)).astype(jnp.float32)
    T = ipot(jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
             joint_pad, 0.5, ot_iterations, 1)
    distance = trace_bmm(cost, jax.lax.stop_gradient(T))

    pos_mask = itm_labels == 1
    n = distance.shape[0]
    ot_loss = (jnp.sum(jnp.where(pos_mask, distance, 0.0))
               - jnp.sum(jnp.where(pos_mask, 0.0, distance))) / n

    logits = itm_head(params["itm_score"], infer["cls_feats"])
    itm_loss = cross_entropy(logits, itm_labels)
    itm_ps, _ = cross_entropy_per_sample(logits, itm_labels)

    return {
        "itm_loss": itm_loss,
        "itm_loss_ps": itm_ps,
        "itm_wpa_loss": 0.1 * ot_loss,
        # signed per-sample OT distance: itm_wpa_loss == mean(ps)
        "itm_wpa_loss_ps": 0.1 * jnp.where(pos_mask, distance, -distance),
        "itm_logits": logits,
        "itm_labels": itm_labels,
        "itm_step_accuracy": jnp.mean(
            (jnp.argmax(logits, -1) == itm_labels).astype(jnp.float32)),
    }


# ------------------------------------------- MPPD / MPFR (reference-dormant)
def _gather_patch_targets(img, patch_index, patch_size: int,
                          gw: int = None):
    """Per-selected-patch flat pixel vectors: (B, L, P*P*3) gathered by
    the (h, w) grid coords visual_embed kept.  `img` may be a pixel
    canvas or patch rows."""
    from rmcl_tpu.models.vit import to_patch_rows
    if img.ndim == 3:
        patches = img
    else:
        patches = to_patch_rows(img, patch_size)
        gw = img.shape[2] // patch_size
    flat = patch_index[..., 0] * gw + patch_index[..., 1]      # (B, L)
    return jnp.take_along_axis(patches, flat[..., None], axis=1)


def compute_mppd(model, params, batch, *, rng, train: bool = False):
    """Masked-patch DENSE regression (reference objectives.py:668-688;
    the reference head never exists — completed here as pixel-vector MSE
    on masked patches)."""
    from rmcl_tpu.models.heads import mppd_head

    infer = model.infer(params, batch, mask_text=False, mask_image=True,
                        rng=rng, deterministic=not train)

    patch_index, _ = infer["patch_index"]
    P = model.spec.patch_size
    targets = _gather_patch_targets(batch["image"], patch_index, P,
                                    gw=model.cfg.grid_hw[1])
    logits = mppd_head(params["mppd_score"], infer["image_feats"][:, 1:])

    masked = jnp.any(infer["image_labels"][:, 1:] != -100, axis=-1)
    diff = (logits.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2
    denom = jnp.maximum(jnp.sum(masked) * diff.shape[-1], 1)
    loss = jnp.sum(jnp.where(masked[..., None], diff, 0.0)) / denom
    return {"mppd_loss": loss, "mppd_logits": logits,
            "mppd_loss_ps": jnp.sum(
                jnp.where(masked[..., None], diff, 0.0), axis=(1, 2)),
            "mppd_loss_wt": (jnp.sum(masked, axis=1)
                             * diff.shape[-1]).astype(jnp.float32),
            "mppd_labels": targets}


def compute_mpfr(model, params, batch, *, rng, train: bool = False):
    """Masked-patch FEATURE regression (reference objectives.py:691-711,
    also dormant): regress the clean patch embedding at masked positions."""
    from rmcl_tpu.models.heads import mpfr_head
    from rmcl_tpu.models.vit import patchify

    infer = model.infer(params, batch, mask_text=False, mask_image=True,
                        rng=rng, deterministic=not train)
    patch_index, _ = infer["patch_index"]
    img = batch["image"]
    if img.ndim == 3:                       # patch-row layout
        gw = model.cfg.grid_hw[1]
        K = params["transformer"]["patch_embed"]["proj"]
        clean = (img.astype(jnp.float32) @ K["kernel"].astype(jnp.float32)
                 + K["bias"].astype(jnp.float32))
    else:
        gw = img.shape[2] // model.spec.patch_size
        clean = patchify(params["transformer"]["patch_embed"], img,
                         dtype=jnp.float32)                  # (B, N, C)
    flat = patch_index[..., 0] * gw + patch_index[..., 1]
    targets = jax.lax.stop_gradient(
        jnp.take_along_axis(clean, flat[..., None], axis=1))
    logits = mpfr_head(params["mpfr_score"], infer["image_feats"][:, 1:])

    masked = jnp.any(infer["image_labels"][:, 1:] != -100, axis=-1)
    diff = (logits.astype(jnp.float32) - targets) ** 2
    denom = jnp.maximum(jnp.sum(masked) * diff.shape[-1], 1)
    loss = jnp.sum(jnp.where(masked[..., None], diff, 0.0)) / denom
    return {"mpfr_loss": loss, "mpfr_logits": logits,
            "mpfr_loss_ps": jnp.sum(
                jnp.where(masked[..., None], diff, 0.0), axis=(1, 2)),
            "mpfr_loss_wt": (jnp.sum(masked, axis=1)
                             * diff.shape[-1]).astype(jnp.float32),
            "mpfr_labels": targets}
