"""Robust contrastive frameworks: MoCo-style InfoNCE + Barlow-Twins.

Behavioural spec: reference vilt/modules/objectives.py
compute_moco_contrastive:217-447 and compute_barlowtwins_contrastive:449-602.

TPU-native redesign:
  * momentum (EMA) update of the key twins = one jax.tree.map — no Python
    parameter loop (reference :219-224).
  * queue enqueue: under pjit's global view the key batch is already a
    global array, so the reference's torch.distributed.all_gather
    (:226-235) disappears — a lax.dynamic_update_slice circular write into
    the replicated queue is all that remains; XLA inserts the collective.
  * Barlow-Twins cross-correlation: computed straight from the *global*
    batch (q.T @ k / per_step_bs) — identical to the reference's per-rank
    matmul + all_reduce (:476-478).
  * the per-sample Python diagnostic loops (:303-312) become batched
    einsums.

The greedy text attack mutates token ids on host, so attacked text ids
enter this module as plain batch inputs; PGD runs fully on-device via
rmcl_tpu.attacks.pgd inside the same jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.models.heads import barlowtwins_head, moco_head
from rmcl_tpu.objectives.losses import (
    cosine_similarity, cross_entropy, l2_normalize)

MOMENTUM_TWINS = ("text_embeddings", "token_type_embeddings",
                  "transformer", "moco_head")


# ----------------------------------------------------------- EMA update
def momentum_update(params: Dict[str, Any], m: float,
                    twins=None) -> Dict[str, Any]:
    """k = m*k + (1-m)*q for the twin module groups
    (reference objectives.py:256-260).  `twins` defaults to the RMCL
    set; the standalone-MoCo path passes its own."""
    out = dict(params)
    for name in (MOMENTUM_TWINS if twins is None else twins):
        k_name = "k_" + name
        if k_name in params:
            out[k_name] = jax.tree.map(
                lambda kp, qp: kp * m + qp * (1.0 - m),
                params[k_name], params[name])
    return out


# ---------------------------------------------------------- queue update
def dequeue_and_enqueue(state: Dict[str, Any], keys, per_step_bs: int):
    """Circular write of the (global) key batch into the negatives queue
    (reference objectives.py:238-248).  Assumes num_negative % batch == 0,
    as the reference does; partial batches are skipped by the static
    `keys.shape[0] == per_step_bs` guard."""
    B = keys.shape[0]
    if B != per_step_bs:
        return state  # reference :242-243 skip rule (static under jit)
    queue, ptr = state["proj_queue"], state["proj_queue_ptr"]
    K = queue.shape[1]
    if K % B != 0:
        # the reference asserts this too (objectives.py:241 `assert
        # self.K % batch_size == 0`); without it dynamic_update_slice
        # would CLAMP the start index at wraparound while ptr advances
        # mod K, silently desyncing queue contents from the pointer.
        raise ValueError(
            f"num_negative ({K}) must be divisible by the global batch "
            f"({B}) — reference queue invariant")
    new_queue = jax.lax.dynamic_update_slice(
        queue, keys.T.astype(queue.dtype), (0, ptr))
    new_ptr = jnp.mod(ptr + B, K).astype(ptr.dtype)
    return dict(state, proj_queue=new_queue, proj_queue_ptr=new_ptr)


# -------------------------------------------------------------- InfoNCE
def infonce(q, k, neg_queue, temperature: float):
    """logits = [q.k | q.queue] / tau, labels = 0
    (reference objectives.py:271-274).  Returns (loss, logits)."""
    l_pos = jnp.einsum("nc,nc->n", q.astype(jnp.float32),
                       k.astype(jnp.float32))[:, None]
    l_neg = jnp.einsum("nc,ck->nk", q.astype(jnp.float32),
                       neg_queue.astype(jnp.float32))
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    labels = jnp.zeros((logits.shape[0],), jnp.int32)
    return cross_entropy(logits, labels), logits


def _infonce_rows(logits):
    """Per-sample InfoNCE NLL (label 0): mean == the infonce loss.
    Per-row independent (the queue is fixed within a step), so masked
    recombination over valid rows is exact (PARITY #10)."""
    return -jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[:, 0]


def _view_diagnostics(q, k, neg_queue, suffix: str) -> Dict[str, Any]:
    """Pos/neg L2-cosine-dot panels (reference objectives.py:300-312),
    batched instead of per-sample loops.  All three negative panels
    derive from ONE (B, K) dot-product matmul plus per-column queue
    norms — the queue (C, K) is read once, never transposed."""
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    ret = {
        f"pos_dist_attacked_{suffix}": jnp.mean(
            jnp.linalg.norm(q32 - k32, axis=1)),
        f"pos_cosine_attacked_{suffix}": jnp.mean(cosine_similarity(q32, k32)),
        f"pos_dot_attacked_{suffix}": jnp.mean(jnp.sum(q32 * k32, axis=1)),
    }
    s = q32 @ neg_queue.astype(jnp.float32)             # (B, K) dots
    qn2 = jnp.sum(q32 ** 2, axis=1)                     # (B,)
    nn2 = jnp.sum(neg_queue.astype(jnp.float32) ** 2, axis=0)  # (K,)
    d2 = qn2[:, None] - 2 * s + nn2[None, :]
    ret[f"neg_dist_attacked_{suffix}"] = jnp.mean(
        jnp.sqrt(jnp.maximum(d2, 0)))
    denom = (jnp.maximum(jnp.sqrt(qn2), 1e-6)[:, None]
             * jnp.maximum(jnp.sqrt(nn2), 1e-6)[None, :])
    ret[f"neg_cosine_attacked_{suffix}"] = jnp.mean(s / denom)
    ret[f"neg_dot_attacked_{suffix}"] = jnp.mean(s)
    return ret


# ------------------------------------------------------------- MoCo main
def compute_moco_contrastive(
    model, params, state, batch, *,
    rng,
    train: bool = True,
    text_view: bool = False,
    image_view: bool = False,
    attacked_text: Optional[Dict[str, Any]] = None,
    pgd_fn=None,
    temperature: float = 0.07,
    momentum: float = 0.999,
    per_step_bs: int = 0,
    fuse_views: bool = False,
    attacked_image=None,
    augmentation: bool = False,
):
    """One MoCo step (reference objectives.py:217-447), jittable.

    `augmentation=True` (benign views) disables the combined text+image
    "both" view — the reference gates it on `not pl_module.augmentation`
    (objectives.py:356).

    `attacked_text`: {"text_ids", "text_masks"} produced on host by the
    greedy attack (or augmentation); None disables the text view even if
    text_view=True was configured.
    `pgd_fn(params, batch, k, queue) -> img_delta` runs the on-device PGD
    attack (rmcl_tpu.attacks.pgd).
    Returns (ret_dict, new_params, new_state).
    """
    ret: Dict[str, Any] = {}
    new_params = momentum_update(params, momentum) if train else params

    rngs = jax.random.split(rng, 6)

    # ---- key (momentum) forward, no grad ----
    infer_k = model.infer_k(new_params, batch, deterministic=True)
    k_proj = moco_head(new_params["k_moco_head"], infer_k["cls_feats"])
    k = jax.lax.stop_gradient(l2_normalize(k_proj, axis=1))

    neg_queue = jax.lax.stop_gradient(state["proj_queue"])

    loss = 0.0
    loss_num = 0

    attacked_img_batch = None
    if image_view and attacked_image is not None:
        # benign augmented view (reference objectives.py:320-321:
        # augmentation=True swaps image_augmentation for compute_pgd)
        attacked_img_batch = dict(batch, image=attacked_image)
    elif image_view and pgd_fn is not None:
        img_delta = pgd_fn(new_params, batch, k, neg_queue)
        attacked_img_batch = dict(batch, image=batch["image"] + img_delta)
        ret["pgd_delta"] = jnp.mean(
            jnp.linalg.norm(img_delta.astype(jnp.float32), axis=-1))

    if fuse_views:
        # ---- single 4B-view forward (MXU-efficiency fast path) ----
        has_txt = text_view and attacked_text is not None
        has_img = image_view and attacked_img_batch is not None
        B = batch["text_ids"].shape[0]
        ids_v = [batch["text_ids"]]
        masks_v = [batch["text_masks"]]
        imgs_v = [batch["image"]]
        names = ["orig"]
        if has_txt:
            ids_v.append(attacked_text["text_ids"])
            masks_v.append(attacked_text["text_masks"])
            imgs_v.append(batch["image"])
            names.append("txt")
        if has_img:
            ids_v.append(batch["text_ids"])
            masks_v.append(batch["text_masks"])
            imgs_v.append(attacked_img_batch["image"])
            names.append("img")
        if has_txt and has_img and not augmentation:
            ids_v.append(attacked_text["text_ids"])
            masks_v.append(attacked_text["text_masks"])
            imgs_v.append(attacked_img_batch["image"])
            names.append("both")
        big = dict(batch,
                   text_ids=jnp.concatenate(ids_v, 0),
                   text_masks=jnp.concatenate(masks_v, 0),
                   image=jnp.concatenate(imgs_v, 0))
        infer_all = model.infer(new_params, big, rng=rngs[0],
                                deterministic=not train)
        q_all = l2_normalize(moco_head(new_params["moco_head"],
                                       infer_all["cls_feats"]), axis=1)
        k_rep = jnp.concatenate([k] * len(names), 0)
        _, logits_all = infonce(q_all, k_rep, neg_queue, temperature)
        preds = jnp.argmax(logits_all, -1).reshape(len(names), B)
        per_view_rows = -jax.nn.log_softmax(
            logits_all, axis=-1)[:, 0].reshape(len(names), B)
        per_view_loss = per_view_rows.mean(axis=1)

        loss = 0.0
        loss_num = 0
        for vi, name in enumerate(names):
            if name == "orig":
                continue
            q_v = q_all[vi * B:(vi + 1) * B]
            ret[f"{'geom' if name == 'txt' else 'pgd' if name == 'img' else 'both'}_success_rate"] = jnp.mean(
                (preds[vi] != preds[0]).astype(jnp.float32))
            ret.update(_view_diagnostics(q_v, k, neg_queue, name))
            ret[f"attacked_{name}_loss"] = per_view_loss[vi]
            ret[f"attacked_{name}_loss_ps"] = per_view_rows[vi]
            loss = loss + per_view_loss[vi]
            loss_num += 1

        new_state = dict(state)
        if train:
            new_state = dequeue_and_enqueue(new_state, k,
                                            per_step_bs or k.shape[0])
        ret["moco_loss"] = jnp.asarray(loss / max(loss_num, 1), jnp.float32)
        ret["moco_loss_ps"] = (per_view_rows[1:].sum(axis=0)
                               / max(loss_num, 1))
        return ret, new_params, new_state

    # ---- clean query (unfused path; the fused branch recomputes it
    # inside its 4B forward, so it lives here to avoid dead tracing) ----
    infer_q = model.infer(new_params, batch, rng=rngs[0],
                          deterministic=not train)
    q_orig = l2_normalize(moco_head(new_params["moco_head"],
                                    infer_q["cls_feats"]), axis=1)
    _, logits0 = infonce(q_orig, k, neg_queue, temperature)
    pred_orig = jnp.argmax(logits0, axis=-1)

    if text_view and attacked_text is not None:
        tbatch = dict(batch, text_ids=attacked_text["text_ids"],
                      text_masks=attacked_text["text_masks"])
        infer_t = model.infer(new_params, tbatch, rng=rngs[1],
                              deterministic=not train)
        q_txt = l2_normalize(moco_head(new_params["moco_head"],
                                       infer_t["cls_feats"]), axis=1)
        l_txt, logits_t = infonce(q_txt, k, neg_queue, temperature)
        ret["geom_success_rate"] = jnp.mean(
            (jnp.argmax(logits_t, -1) != pred_orig).astype(jnp.float32))
        ret.update(_view_diagnostics(q_txt, k, neg_queue, "txt"))
        ret["attacked_txt_loss"] = l_txt
        ret["attacked_txt_loss_ps"] = _infonce_rows(logits_t)
        loss = loss + l_txt
        loss_num += 1

    if image_view and attacked_img_batch is not None:
        infer_i = model.infer(new_params, attacked_img_batch, rng=rngs[2],
                              deterministic=not train)
        q_img = l2_normalize(moco_head(new_params["moco_head"],
                                       infer_i["cls_feats"]), axis=1)
        l_img, logits_i = infonce(q_img, k, neg_queue, temperature)
        ret["pgd_success_rate"] = jnp.mean(
            (jnp.argmax(logits_i, -1) != pred_orig).astype(jnp.float32))
        ret.update(_view_diagnostics(q_img, k, neg_queue, "img"))
        ret["attacked_img_loss"] = l_img
        ret["attacked_img_loss_ps"] = _infonce_rows(logits_i)
        loss = loss + l_img
        loss_num += 1

    if text_view and image_view and not augmentation \
            and attacked_text is not None and attacked_img_batch is not None:
        bbatch = dict(attacked_img_batch,
                      text_ids=attacked_text["text_ids"],
                      text_masks=attacked_text["text_masks"])
        infer_b = model.infer(new_params, bbatch, rng=rngs[3],
                              deterministic=not train)
        q_both = l2_normalize(moco_head(new_params["moco_head"],
                                        infer_b["cls_feats"]), axis=1)
        l_both, logits_b = infonce(q_both, k, neg_queue, temperature)
        ret["both_success_rate"] = jnp.mean(
            (jnp.argmax(logits_b, -1) != pred_orig).astype(jnp.float32))
        ret.update(_view_diagnostics(q_both, k, neg_queue, "both"))
        ret["attacked_both_loss"] = l_both
        ret["attacked_both_loss_ps"] = _infonce_rows(logits_b)
        loss = loss + l_both
        loss_num += 1

    new_state = dict(state)
    if train:
        new_state = dequeue_and_enqueue(new_state, k, per_step_bs or k.shape[0])

    ret["moco_loss"] = jnp.asarray(loss / max(loss_num, 1), jnp.float32)
    ps_keys = [key for key in ("attacked_txt_loss_ps", "attacked_img_loss_ps",
                               "attacked_both_loss_ps") if key in ret]
    if ps_keys:
        ret["moco_loss_ps"] = (
            sum(ret[key] for key in ps_keys) / max(loss_num, 1))
    return ret, new_params, new_state


# ---------------------------------------------------------- Barlow-Twins
def _off_diagonal_sumsq(c):
    n = c.shape[0]
    mask = 1.0 - jnp.eye(n, dtype=c.dtype)
    return jnp.sum((c * mask) ** 2)


def bt_correlation_loss(q, k, per_step_bs: int, lam: float):
    """on-diag (1-c_ii)^2 + lam * off-diag c_ij^2 where
    c = q.T @ k / per_step_bs (reference objectives.py:476-482).
    Under the global view this already includes the cross-replica sum.

    TPU redesign (round 5): the reference materializes the (D, D)
    correlation matrix (D = 8192 -> 268 MB fp32) for every view loss
    AND every PGD iteration — measured ~5 ms of HBM traffic per touch
    chain on v5e (~30% of the BT step).  With B << D the matrix has
    rank <= B, so the loss needs only rank-structured pieces:
      diag(c)_d = sum_n q_nd k_nd / psb                   (B, D) reads
      ||c||_F^2 = sum_ij (q q^T)_ij (k k^T)_ij / psb^2    two (B, B) Grams
      off-diag  = ||c||^2 - sum_d diag_d^2
    ALGEBRAICALLY IDENTICAL to the masked (D, D) form (fp32 summation
    order differs — same numeric class as any XLA regrouping; parity
    vs the explicit matrix is pinned in tests/test_objectives.py).
    The explicit path is kept for the B >= D regime where the Grams
    stop being the cheap side."""
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    B, D = q32.shape
    if B >= D:
        c = (q32.T @ k32) / per_step_bs
        on_diag = jnp.sum((jnp.diagonal(c) - 1.0) ** 2)
        off_diag = _off_diagonal_sumsq(c)
        return on_diag + lam * off_diag, on_diag, lam * off_diag
    diag = jnp.sum(q32 * k32, axis=0) / per_step_bs          # (D,)
    gq = q32 @ q32.T                                          # (B, B)
    gk = k32 @ k32.T                                          # (B, B)
    sum_sq = jnp.sum(gq * gk) / (per_step_bs * per_step_bs)
    on_diag = jnp.sum((diag - 1.0) ** 2)
    off_diag = sum_sq - jnp.sum(diag ** 2)
    return on_diag + lam * off_diag, on_diag, lam * off_diag


def compute_barlowtwins_contrastive(
    model, params, state, batch, *,
    rng,
    train: bool = True,
    text_view: bool = False,
    image_view: bool = False,
    attacked_text: Optional[Dict[str, Any]] = None,
    pgd_fn=None,
    adv_lr: float = 0.0051,
    per_step_bs: int = 0,
    attacked_image=None,
    augmentation: bool = False,
):
    """Barlow-Twins step (reference objectives.py:449-602), jittable.
    `augmentation=True` disables the "both" view (reference gates it on
    `not pl_module.augmentation`, objectives.py:525).
    Returns (ret_dict, params, new_state)."""
    from rmcl_tpu.train.step import _merge_stats

    ret: Dict[str, Any] = {}
    rngs = jax.random.split(rng, 4)
    B = batch["text_ids"].shape[0]
    psb = per_step_bs or B

    # BN running stats CHAIN through the per-step head calls (the
    # reference's torch BN updates in sequence: key, text, image, both)
    bt_params = params["barlowtwins_head"]
    infer0 = model.infer(params, batch, deterministic=True)
    k, stats = barlowtwins_head(bt_params, infer0["cls_feats"],
                                training=train)
    bt_params = _merge_stats(bt_params, stats)
    k = jax.lax.stop_gradient(k)

    loss = 0.0
    loss_num = 0

    attacked_img_batch = None
    if image_view and attacked_image is not None:
        attacked_img_batch = dict(batch, image=attacked_image)
    elif image_view and pgd_fn is not None:
        img_delta = pgd_fn(params, batch, k, None)
        attacked_img_batch = dict(batch, image=batch["image"] + img_delta)

    if text_view and attacked_text is not None:
        tbatch = dict(batch, text_ids=attacked_text["text_ids"],
                      text_masks=attacked_text["text_masks"])
        infer_t = model.infer(params, tbatch, rng=rngs[0],
                              deterministic=not train)
        q_text, stats = barlowtwins_head(bt_params, infer_t["cls_feats"],
                                         training=train)
        bt_params = _merge_stats(bt_params, stats)
        l, on, off = bt_correlation_loss(q_text, k, psb, adv_lr)
        loss, loss_num = loss + l, loss_num + 1
        ret["barlowtwins_loss_invariance_text"] = on
        ret["barlowtwins_loss_redundancy_text"] = off
        ret["pos_dist_attacked_txt"] = jnp.mean(
            jnp.linalg.norm(q_text.astype(jnp.float32) - k, axis=1))
        ret["pos_cosine_attacked_txt"] = jnp.mean(cosine_similarity(q_text, k))
        ret["pos_dot_attacked_txt"] = jnp.mean(jnp.sum(q_text * k, axis=1))

    if image_view and attacked_img_batch is not None:
        infer_i = model.infer(params, attacked_img_batch, rng=rngs[1],
                              deterministic=not train)
        q_img, stats = barlowtwins_head(bt_params, infer_i["cls_feats"],
                                        training=train)
        bt_params = _merge_stats(bt_params, stats)
        l, on, off = bt_correlation_loss(q_img, k, psb, adv_lr)
        loss, loss_num = loss + l, loss_num + 1
        ret["barlowtwins_loss_invariance_img"] = on
        ret["barlowtwins_loss_redundancy_img"] = off
        ret["pos_dist_attacked_img"] = jnp.mean(
            jnp.linalg.norm(q_img.astype(jnp.float32) - k, axis=1))
        ret["pos_cosine_attacked_img"] = jnp.mean(cosine_similarity(q_img, k))
        ret["pos_dot_attacked_img"] = jnp.mean(jnp.sum(q_img * k, axis=1))

    if text_view and image_view and not augmentation \
            and attacked_text is not None and attacked_img_batch is not None:
        bbatch = dict(attacked_img_batch,
                      text_ids=attacked_text["text_ids"],
                      text_masks=attacked_text["text_masks"])
        infer_b = model.infer(params, bbatch, rng=rngs[2],
                              deterministic=not train)
        q_both, stats = barlowtwins_head(bt_params, infer_b["cls_feats"],
                                         training=train)
        bt_params = _merge_stats(bt_params, stats)
        l, on, off = bt_correlation_loss(q_both, k, psb, adv_lr)
        loss, loss_num = loss + l, loss_num + 1
        ret["barlowtwins_loss_invariance_both"] = on
        ret["barlowtwins_loss_redundancy_both"] = off
        ret["pos_dist_attacked_both"] = jnp.mean(
            jnp.linalg.norm(q_both.astype(jnp.float32) - k, axis=1))
        ret["pos_cosine_attacked_both"] = jnp.mean(cosine_similarity(q_both, k))
        ret["pos_dot_attacked_both"] = jnp.mean(jnp.sum(q_both * k, axis=1))

    ret["barlowtwins_loss"] = jnp.asarray(loss / max(loss_num, 1),
                                          jnp.float32)

    new_state = dict(state)
    if train:
        # fully-chained running stats (all per-step BN updates applied)
        new_state["bt_bn_stats"] = jax.lax.stop_gradient({
            "projector": {
                "1": {kk: bt_params["projector"]["1"][kk]
                      for kk in ("running_mean", "running_var")},
                "4": {kk: bt_params["projector"]["4"][kk]
                      for kk in ("running_mean", "running_var")},
            },
            "norm": {kk: bt_params["norm"][kk]
                     for kk in ("running_mean", "running_var")},
        })
    return ret, params, new_state
