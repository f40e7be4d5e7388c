"""Downstream objectives: VQA, NLVR2, IRTR (+ attacked variants).

Behavioural specs: reference vilt/modules/objectives.py
compute_vqa:861-896, compute_vqa_attack:813-858, compute_nlvr2:1002-1060,
compute_nlvr2_attack:898-1000, compute_irtr:1180-1222,
compute_irtr_attacked:1062-1178.

TPU redesign notes:
  * VQA soft targets arrive as a dense (B, 3129) matrix built in the
    collator (host) — no per-sample Python scatter loops (:871-873).
  * IRTR stacks the 1 + draw_false_text texts in the collator as
    (B, F+1, T); the image's visual_embed is computed ONCE per image and
    broadcast across the F+1 texts before the joint transformer — the
    reference recomputes patchify/pos-embed 16x (:1198-1207).
  * NLVR2 dev/test split bookkeeping (table_name strings) happens in the
    host-side metrics layer; the jitted objective returns logits+labels.
  * The attacked-NLVR2 train branch in the reference crashes on a
    missing key (:946, SURVEY.md §2.5); here the attacked loss is
    labelled `nlvr2_attacked_loss` and scored against the true labels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.models.heads import (
    itm_head, moco_head, nlvr2_classifier, rank_output, vqa_classifier)
from rmcl_tpu.models.vit import visual_embed
from rmcl_tpu.objectives.losses import (
    bce_rowsum_with_logits, bce_with_logits, cross_entropy,
    cross_entropy_per_sample, l2_normalize)


# ------------------------------------------------------------------- VQA
def compute_vqa(model, params, batch, *, rng=None, train: bool = False):
    infer = model.infer(params, batch, rng=rng, deterministic=not train)
    logits = vqa_classifier(params["vqa_classifier"], infer["cls_feats"])
    targets = batch["vqa_targets"]
    loss = bce_with_logits(logits, targets) * targets.shape[1]
    score = jnp.mean(jnp.take_along_axis(
        targets, jnp.argmax(logits, -1)[:, None], axis=1)[:, 0])
    return {"vqa_loss": loss, "vqa_logits": logits, "vqa_targets": targets,
            "vqa_loss_ps": bce_rowsum_with_logits(logits, targets),
            "vqa_step_score": score}


def compute_vqa_attack(model, params, batch, *, rng=None, train: bool = False,
                       image_view: bool = False,
                       attacked_text: Optional[Dict[str, Any]] = None,
                       pgd_fn=None):
    """Attacked VQA: PGD image and/or geometric text; when both, the
    geometric text rides the PGD'd image (reference :821-823)."""
    b = dict(batch)
    if image_view and pgd_fn is not None:
        delta = pgd_fn(params, batch, batch["vqa_targets"])
        b["image"] = batch["image"] + delta
    if attacked_text is not None:
        b["text_ids"] = attacked_text["text_ids"]
        b["text_masks"] = attacked_text["text_masks"]
    infer = model.infer(params, b, rng=rng, deterministic=not train)
    logits = vqa_classifier(params["vqa_classifier"], infer["cls_feats"])
    targets = batch["vqa_targets"]
    loss = bce_with_logits(logits, targets) * targets.shape[1]
    # distinct keys so a config running BOTH vqa and vqa_attacked keeps
    # clean and attacked results separate (the reference reuses the
    # clean keys but never activates both tasks at once)
    return {"vqa_attacked_loss": loss, "vqa_attacked_logits": logits,
            "vqa_attacked_loss_ps": bce_rowsum_with_logits(logits, targets),
            "vqa_targets": targets}


# ----------------------------------------------------------------- NLVR2
def _nlvr2_logits(model, params, batch, rng, train):
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    i1 = model.infer(params, batch, image_token_type_idx=1, rng=rngs[0],
                     deterministic=not train)
    i2 = model.infer(params, batch, image_token_type_idx=2, rng=rngs[1],
                     deterministic=not train)
    cls = jnp.concatenate([i1["cls_feats"], i2["cls_feats"]], axis=-1)
    return nlvr2_classifier(params["nlvr2_classifier"], cls)


def compute_nlvr2(model, params, batch, *, rng=None, train: bool = False):
    logits = _nlvr2_logits(model, params, batch, rng, train)
    labels = batch["answers"].astype(jnp.int32)
    return {
        "nlvr2_loss": cross_entropy(logits, labels),
        "nlvr2_loss_ps": cross_entropy_per_sample(logits, labels)[0],
        "nlvr2_logits": logits,
        "nlvr2_labels": labels,
        "nlvr2_step_accuracy": jnp.mean(
            (jnp.argmax(logits, -1) == labels).astype(jnp.float32)),
    }


def compute_nlvr2_attack(model, params, batch, *, rng=None,
                         train: bool = False,
                         image_view: bool = False,
                         attacked_text: Optional[Dict[str, Any]] = None,
                         pgd_fn=None):
    labels = batch["answers"].astype(jnp.int32)
    ret: Dict[str, Any] = {"nlvr2_labels": labels}

    ori_logits = _nlvr2_logits(model, params, batch, rng, train)
    ret["nlvr2_original_logits"] = ori_logits
    ret["nlvr2_original_loss"] = cross_entropy(ori_logits, labels)
    ret["nlvr2_original_loss_ps"] = cross_entropy_per_sample(
        ori_logits, labels)[0]

    b = dict(batch)
    if image_view and pgd_fn is not None:
        d0, d1 = pgd_fn(params, batch, labels)
        b["image_0"] = batch["image_0"] + d0
        b["image_1"] = batch["image_1"] + d1
        ret["pgd_delta"] = 0.5 * (
            jnp.mean(jnp.linalg.norm(d0.astype(jnp.float32), axis=-1))
            + jnp.mean(jnp.linalg.norm(d1.astype(jnp.float32), axis=-1)))
    if attacked_text is not None:
        b["text_ids"] = attacked_text["text_ids"]
        b["text_masks"] = attacked_text["text_masks"]

    if (image_view and pgd_fn is not None) or attacked_text is not None:
        att_logits = _nlvr2_logits(model, params, b, rng, train)
        ret["nlvr2_attacked_logits"] = att_logits
        ret["nlvr2_attacked_loss"] = cross_entropy(att_logits, labels)
        ret["nlvr2_attacked_loss_ps"] = cross_entropy_per_sample(
            att_logits, labels)[0]
        # outcome scalar: fraction of predictions the attack flipped
        # (the reference logs per-sample change telemetry,
        # objectives.py:298-299,335-336; this is the step-level
        # aggregate, kept in the jitted metrics like geom_success_rate)
        ret["nlvr2_flip_rate"] = jnp.mean(
            (jnp.argmax(att_logits, -1)
             != jnp.argmax(ori_logits, -1)).astype(jnp.float32))
    return ret


# ------------------------------------------------------------------ IRTR
def _stacked_text(batch, false_len: int):
    """Collator provides false_text_{i}_ids/_masks; stack with the true
    text at slot 0 -> (B, F+1, T)."""
    ids = [batch["text_ids"][:, None]]
    masks = [batch["text_masks"][:, None]]
    for i in range(false_len):
        ids.append(batch[f"false_text_{i}_ids"][:, None])
        masks.append(batch[f"false_text_{i}_masks"][:, None])
    return jnp.concatenate(ids, 1), jnp.concatenate(masks, 1)


def _irtr_scores(model, params, batch, head_fn, false_len: int, rng, train):
    """Joint forward of B*(F+1) pairs; visual_embed computed once per
    image then broadcast (TPU saving vs reference :1198-1207)."""
    ids, masks = _stacked_text(batch, false_len)
    B, F1, T = ids.shape
    img = batch["image"]

    ie, im, _, _ = visual_embed(
        params["transformer"], img, spec=model.spec,
        max_image_len=model.cfg.max_image_len,
        dtype=jnp.dtype(model.cfg.compute_dtype),
        grid_hw=model.cfg.grid_hw if img.ndim == 3 else None)
    L = ie.shape[1]
    ie = jnp.broadcast_to(ie[:, None], (B, F1, L, ie.shape[-1])).reshape(
        B * F1, L, ie.shape[-1])
    im = jnp.broadcast_to(im[:, None], (B, F1, L)).reshape(B * F1, L)

    flat = {
        "text_ids": ids.reshape(B * F1, T),
        "text_masks": masks.reshape(B * F1, T),
        "text_labels": jnp.full((B * F1, T), -100, jnp.int32),
    }
    infer = model.infer(params, flat, image_embeds=ie, image_masks=im,
                        rng=rng, deterministic=not train)
    score = head_fn(infer["cls_feats"])[:, 0]
    return score.reshape(B, F1)


def compute_irtr(model, params, batch, *, rng=None, train: bool = False,
                 false_len: int = 15):
    score = _irtr_scores(
        model, params, batch,
        lambda cls: rank_output(params["rank_output"], cls),
        false_len, rng, train)
    answer = jnp.zeros((score.shape[0],), jnp.int32)
    return {"irtr_loss": cross_entropy(score, answer),
            "irtr_loss_ps": cross_entropy_per_sample(score, answer)[0],
            "irtr_logits": score, "irtr_labels": answer,
            "irtr_step_accuracy": jnp.mean(
                (jnp.argmax(score, -1) == 0).astype(jnp.float32))}


def compute_irtr_attacked(model, params, batch, *, rng=None,
                          train: bool = False, false_len: int = 15,
                          image_view: bool = False,
                          attacked_text: Optional[Dict[str, Any]] = None,
                          pgd_fn=None):
    """Attacked IRTR scored by moco_head[:, 0] (reference :1092).  The
    reference attackers are broken (SURVEY.md §2.5); the repaired PGD
    (attacks.pgd.make_pgd_irtr) attacks the in-batch text-matching loss."""
    def head(cls):
        return moco_head(params["moco_head"], cls)

    score = _irtr_scores(model, params, batch, head, false_len, rng, train)
    answer = jnp.zeros((score.shape[0],), jnp.int32)
    ret: Dict[str, Any] = {
        "irtr_original_loss": cross_entropy(score, answer),
        "irtr_original_loss_ps": cross_entropy_per_sample(score, answer)[0],
        "irtr_original_logits": score,
        "irtr_labels": answer,
    }

    b = dict(batch)
    if image_view and pgd_fn is not None:
        # text side of the attack target: each sample's own projection
        infer = model.infer(params, batch, deterministic=True)
        text_repr = l2_normalize(
            moco_head(params["moco_head"], infer["cls_feats"]), axis=1)
        delta = pgd_fn(params, batch, text_repr)
        b["image"] = batch["image"] + delta
    if attacked_text is not None:
        b["text_ids"] = attacked_text["text_ids"]
        b["text_masks"] = attacked_text["text_masks"]

    if (image_view and pgd_fn is not None) or attacked_text is not None:
        att = _irtr_scores(model, params, b, head, false_len, rng, train)
        ret["irtr_attacked_loss"] = cross_entropy(att, answer)
        ret["irtr_attacked_loss_ps"] = cross_entropy_per_sample(
            att, answer)[0]
        ret["irtr_attacked_logits"] = att
    return ret
