"""PGD image attacks, TPU-native.

Behavioural spec: reference attack/pgd_attack_vilt.py.  The reference
deep-copies the model into a frozen "mini ViLT" each call (:115-121) and
runs a Python loop of forward+backward.  Here the frozen copy is just
`jax.lax.stop_gradient(params)` and the loop is a `lax.fori_loop` over
`jax.grad` w.r.t. the pixel delta — the whole attack compiles into the
train step, so the 5 inner iterations never leave the chip.

Update rule (reference :138-173):
    g      = d loss / d delta                    (ascent: maximise loss)
    denorm = max(per-sample Linf norm of g, 1e-8)
    delta += adv_lr_img * g / denorm
    delta  = clip(delta, ±adv_max_norm_img)      (if adv_max_norm_img > 0)
The reference divides the loss by adv_steps before backward; gradients
scale linearly so we fold that into the step only via parity (loss/steps)
to keep the same Linf-normalised direction (the normalisation makes the
1/steps factor a no-op — kept for documentation).

The attack forward runs deterministically (no dropout).  The reference
deep-copy inherits train-mode dropout; we deliberately use the clean
forward — a strictly better-conditioned attack gradient (documented
divergence).

Hoisted-geometry fast path (default): the validity mask, pos-embed
interpolation, and patch selection are δ-invariant (dL/dδ is exactly
zero on padding and unselected patches — see models/vit.py VisualPrep),
so they are computed ONCE from the clean image and each PGD iteration
pays only `rows @ patch_kernel` plus the transformer.  δ lives directly
in selected-patch space; the per-sample Linf norm over it equals the
norm over the full canvas (the complement is identically zero).  The
attack keeps the training remat setting: although it differentiates
only w.r.t. δ, the step is HBM-bound, so recomputing activations is
cheaper than writing them out (measured).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from rmcl_tpu.models.heads import (
    barlowtwins_head, moco_head, nlvr2_classifier, vqa_classifier)
from rmcl_tpu.models.vilt import infer as vilt_infer
from rmcl_tpu.models.vit import (
    from_patch_rows, scatter_delta, visual_embed_from_prep,
    visual_embed_prepare)
from rmcl_tpu.objectives.contrastive import bt_correlation_loss, infonce
from rmcl_tpu.objectives.losses import bce_with_logits, cross_entropy, l2_normalize


def _fast_visual(model, frozen, batch, imgkey: str = "image",
                 image_token_type_idx: int = 1):
    """Build the per-iteration forward for the hoisted-geometry path.

    Returns (fwd, delta_shape, to_full) where fwd(delta_sel) runs the
    full infer with δ applied in selected-patch space, delta_shape is δ's
    (B, L, P*P*3) shape, and to_full(delta_sel) expands δ back to the
    batch's image layout (patch rows or HWC canvas)."""
    cfg = model.cfg
    # remat default inside the PGD loop: with BOTH fused half-block
    # kernels engaged (attn_impl+mlp_impl "fused"), each block's
    # custom_vjp residuals are just (x, weights) — the S² and (S, 4C)
    # intermediates never materialise, so the remat replay forward is
    # pure waste: derive remat OFF (measured b16 step 181.2 -> 173.0
    # ms, b64 no OOM / 93.1 pairs/s).  On the XLA block path remat ON
    # stays the winner (HBM-bound: recompute beats activation
    # write-back, 19.9 vs 22.3 ms/iter).  cfg.pgd_remat overrides.
    spec = model.spec
    if getattr(cfg, "pgd_kernel_impl", "") == "xla" \
            and (spec.attn_impl == "fused"
                 or spec.mlp_impl in ("fused", "fused_train")):
        # XLA block path inside the attack only: frozen params are
        # stop_gradient constants there, so XLA DCEs every wgrad
        # matmul the opaque fused backward kernels would compute —
        # a PGD iter drops from ~3 fwd-equivalents to 2 (see
        # cfg.pgd_kernel_impl).  xla_bf16 keeps the S² matmuls on
        # the MXU in bf16 like the kernels do.
        spec = spec._replace(attn_impl="xla_bf16", mlp_impl="xla")
    pgd_remat = cfg.pgd_remat
    if (pgd_remat is None and spec.attn_impl == "fused"
            and spec.mlp_impl == "fused"):
        pgd_remat = False
    if pgd_remat is not None and pgd_remat != spec.remat:
        spec = spec._replace(remat=pgd_remat)
    img = batch[imgkey]
    hwc = img.ndim == 4
    tr = frozen["transformer"]
    prep = visual_embed_prepare(
        tr, img, spec=spec, max_image_len=cfg.max_image_len,
        grid_hw=None if hwc else cfg.grid_hw)
    dtype = jnp.dtype(cfg.compute_dtype)
    if hwc:
        grid = (img.shape[1] // spec.patch_size,
                img.shape[2] // spec.patch_size)
    else:
        grid = cfg.grid_hw

    def fwd(delta_sel):
        emb, xm = visual_embed_from_prep(tr, prep, delta_sel, spec=spec,
                                         dtype=dtype)
        return vilt_infer(frozen, batch, cfg=cfg, spec=spec,
                          image_embeds=emb, image_masks=xm,
                          image_token_type_idx=image_token_type_idx,
                          deterministic=True)

    def to_full(delta_sel):
        d = scatter_delta(prep, delta_sel)
        return from_patch_rows(d, grid, spec.patch_size) if hwc else d

    return fwd, prep.rows_sel.shape, to_full


def _linf_normalised_step(delta, grad, adv_lr: float, max_norm: float):
    g = grad.astype(jnp.float32)
    flat = g.reshape(g.shape[0], -1)
    denorm = jnp.max(jnp.abs(flat), axis=1)
    denorm = jnp.maximum(denorm, 1e-8).reshape(-1, *([1] * (g.ndim - 1)))
    delta = delta + (adv_lr * g / denorm).astype(delta.dtype)
    if max_norm > 0:
        delta = jnp.clip(delta, -max_norm, max_norm)
    return delta


def _pgd_loop(loss_of_delta: Callable, img_shape, dtype,
              adv_steps: int, adv_lr: float, max_norm: float):
    grad_fn = jax.grad(loss_of_delta)

    def body(_, delta):
        return _linf_normalised_step(delta, grad_fn(delta), adv_lr, max_norm)

    return jax.lax.fori_loop(0, adv_steps, body,
                             jnp.zeros(img_shape, dtype))


def _pgd_single_image(model, frozen, batch, head_loss: Callable,
                      adv_steps: int, adv_lr: float, max_norm: float,
                      fast: bool):
    """Shared fast/slow scaffold for the single-image PGD variants
    (moco/BT/VQA/IRTR differ only in `head_loss`; NLVR2's two-image
    gated loop stays bespoke)."""
    img = batch["image"]
    if fast:
        fwd, dshape, to_full = _fast_visual(model, frozen, batch)
        delta = _pgd_loop(lambda d: head_loss(fwd(d)), dshape, img.dtype,
                          adv_steps, adv_lr, max_norm)
        return to_full(delta)

    def loss_of(delta):
        b = dict(batch, image=img + delta)
        return head_loss(model.infer(frozen, b, deterministic=True))

    return _pgd_loop(loss_of, img.shape, img.dtype,
                     adv_steps, adv_lr, max_norm)


# ------------------------------------------------------------------ MoCo
def make_pgd_moco(model, adv_steps: int, adv_lr: float, max_norm: float,
                  temperature: float, fast: bool = True):
    """InfoNCE-ascent PGD (reference PGDAttack_moco.pgd_attack :130-175)."""

    def attack(params, batch, k_modality, neg_queue):
        frozen = jax.lax.stop_gradient(params)
        k_modality = jax.lax.stop_gradient(k_modality)
        neg_queue = jax.lax.stop_gradient(neg_queue)

        def head_loss(infer):
            q = l2_normalize(moco_head(frozen["moco_head"],
                                       infer["cls_feats"]), axis=1)
            loss, _ = infonce(q, k_modality, neg_queue, temperature)
            return loss / adv_steps

        return _pgd_single_image(model, frozen, batch, head_loss,
                                 adv_steps, adv_lr, max_norm, fast)

    return attack


# ----------------------------------------------------------- BarlowTwins
def make_pgd_barlowtwins(model, adv_steps: int, adv_lr: float,
                         max_norm: float, bt_lambda: float,
                         fast: bool = True):
    """Cross-correlation-ascent PGD
    (reference PGDAttack_bartlowtwins.pgd_attack :198-238; note the
    local-batch divisor q.shape[0] at :219)."""

    def attack(params, batch, k_modality, _unused=None):
        frozen = jax.lax.stop_gradient(params)
        k_modality = jax.lax.stop_gradient(k_modality)

        def head_loss(infer):
            q, _ = barlowtwins_head(frozen["barlowtwins_head"],
                                    infer["cls_feats"], training=True)
            loss, _, _ = bt_correlation_loss(q, k_modality, q.shape[0],
                                             bt_lambda)
            return loss / adv_steps

        return _pgd_single_image(model, frozen, batch, head_loss,
                                 adv_steps, adv_lr, max_norm, fast)

    return attack


# ---------------------------------------------------------------- NLVR2
def make_pgd_nlvr2(model, adv_steps: int, adv_lr: float, max_norm: float,
                   attack_idx=(True, True), fast: bool = True):
    """Two-image CE-ascent PGD with per-image gating
    (reference PGDAttack_nlvr2.pgd_attack :263-342).
    Returns (delta_0, delta_1)."""

    def attack(params, batch, labels):
        frozen = jax.lax.stop_gradient(params)
        img0, img1 = batch["image_0"], batch["image_1"]

        def head_loss(i1, i2):
            cls = jnp.concatenate([i1["cls_feats"], i2["cls_feats"]], axis=-1)
            logits = nlvr2_classifier(frozen["nlvr2_classifier"], cls)
            return cross_entropy(logits, labels) / adv_steps

        if fast:
            fwd0, dshape0, to_full0 = _fast_visual(
                model, frozen, batch, imgkey="image_0", image_token_type_idx=1)
            fwd1, dshape1, to_full1 = _fast_visual(
                model, frozen, batch, imgkey="image_1", image_token_type_idx=2)

            def loss_fast(deltas):
                d0, d1 = deltas
                return head_loss(fwd0(d0), fwd1(d1))

            grad_fast = jax.grad(loss_fast)

            def body_fast(_, deltas):
                g0, g1 = grad_fast(deltas)
                d0, d1 = deltas
                if attack_idx[0]:
                    d0 = _linf_normalised_step(d0, g0, adv_lr, max_norm)
                if attack_idx[1]:
                    d1 = _linf_normalised_step(d1, g1, adv_lr, max_norm)
                return (d0, d1)

            init = (jnp.zeros(dshape0, img0.dtype),
                    jnp.zeros(dshape1, img1.dtype))
            d0, d1 = jax.lax.fori_loop(0, adv_steps, body_fast, init)
            return to_full0(d0), to_full1(d1)

        def loss_of(deltas):
            d0, d1 = deltas
            b = dict(batch, image_0=img0 + d0, image_1=img1 + d1)
            i1 = model.infer(frozen, b, image_token_type_idx=1,
                             deterministic=True)
            i2 = model.infer(frozen, b, image_token_type_idx=2,
                             deterministic=True)
            return head_loss(i1, i2)

        grad_fn = jax.grad(loss_of)

        def body(_, deltas):
            g0, g1 = grad_fn(deltas)
            d0, d1 = deltas
            if attack_idx[0]:
                d0 = _linf_normalised_step(d0, g0, adv_lr, max_norm)
            if attack_idx[1]:
                d1 = _linf_normalised_step(d1, g1, adv_lr, max_norm)
            return (d0, d1)

        init = (jnp.zeros_like(img0), jnp.zeros_like(img1))
        return jax.lax.fori_loop(0, adv_steps, body, init)

    return attack


# ------------------------------------------------------------------ VQA
def make_pgd_vqa(model, adv_steps: int, adv_lr: float, max_norm: float,
                 label_size: int, fast: bool = True):
    """BCE-ascent PGD (reference PGDAttack_vqa.pgd_attack :439-483).
    `vqa_targets` is the dense (B, label_size) soft-score matrix."""

    def attack(params, batch, vqa_targets):
        frozen = jax.lax.stop_gradient(params)

        def head_loss(infer):
            logits = vqa_classifier(frozen["vqa_classifier"],
                                    infer["cls_feats"])
            return bce_with_logits(logits, vqa_targets) * label_size

        return _pgd_single_image(model, frozen, batch, head_loss,
                                 adv_steps, adv_lr, max_norm, fast)

    return attack


# ------------------------------------------------------------------ IRTR
def make_pgd_irtr(model, adv_steps: int, adv_lr: float, max_norm: float,
                  temperature: float, fast: bool = True):
    """IRTR PGD.  The reference variant (PGDAttack_irtr :364-415)
    references an undefined `text_representation` and cannot run
    (SURVEY.md §2.5); this is the repaired semantics: push the
    moco-projected joint cls AWAY from its own text projection and
    TOWARD the other in-batch text projections.  The denominator uses
    negatives only — with the positive included, the batch=1 case
    (attacked-recall's per-image loop) collapses to a constant-zero
    softmax whose gradient is identically zero (no attack at all)."""

    def attack(params, batch, text_repr):
        frozen = jax.lax.stop_gradient(params)
        text_repr = jax.lax.stop_gradient(text_repr)  # (B, C) normalised
        img = batch["image"]
        B = text_repr.shape[0]

        def head_loss(infer):
            q = l2_normalize(moco_head(frozen["moco_head"],
                                       infer["cls_feats"]), axis=1)
            logits = (q.astype(jnp.float32)
                      @ text_repr.T.astype(jnp.float32)) / temperature
            l_pos = jnp.diagonal(logits)
            loss = -jnp.mean(l_pos)
            if B > 1:  # static under jit
                neg = jnp.where(jnp.eye(B, dtype=bool), -jnp.inf, logits)
                loss = loss + jnp.mean(jax.nn.logsumexp(neg, axis=1))
            return loss / adv_steps

        return _pgd_single_image(model, frozen, batch, head_loss,
                                 adv_steps, adv_lr, max_norm, fast)

    return attack
