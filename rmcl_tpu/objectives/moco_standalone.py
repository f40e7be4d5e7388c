"""Standalone bidirectional MoCo (reference MoCo/MoCo_RMCL.py:19-265).

The reference module is legacy/prototype code that does not import
(syntax errors at MoCo_RMCL.py:12,39 — SURVEY.md §2.5); this is the
working TPU-native equivalent of its documented semantics:

  * separate text / image projections of the two CLS positions
    (text_feats[:,0], image_feats[:,0]) through per-modality
    MoCo-style projector heads;
  * bidirectional InfoNCE: attacked text query vs momentum image key,
    attacked image query vs momentum text key, both against ONE shared
    negatives queue (txt_img_queue);
  * both key batches enqueue back-to-back into the shared queue
    (reference _dequeue_and_enqueue :76-93).

Pure function over (params, state, batch); integrates with the same
PGD/greedy machinery as the main framework.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rmcl_tpu.models import heads as H
from rmcl_tpu.objectives.contrastive import infonce, momentum_update
from rmcl_tpu.objectives.losses import l2_normalize

PROJ_DIM = 128


def init_standalone_moco(key, cfg, params: Dict[str, Any],
                         state: Dict[str, Any]):
    """Add per-modality projectors + shared queue to an existing ViLT
    param/state pair (queue random-normalized, reference :49-52)."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = dict(params)
    params["txt_projector"] = H.init_moco_head(
        k1, cfg.hidden_size, cfg.hidden_size, PROJ_DIM)
    params["img_projector"] = H.init_moco_head(
        k2, cfg.hidden_size, cfg.hidden_size, PROJ_DIM)
    params["k_txt_projector"] = jax.tree.map(jnp.copy, params["txt_projector"])
    params["k_img_projector"] = jax.tree.map(jnp.copy, params["img_projector"])
    state = dict(state)
    q = jax.random.normal(k3, (PROJ_DIM, cfg.num_negative), jnp.float32)
    state["txt_img_queue"] = q / jnp.linalg.norm(q, axis=0, keepdims=True)
    state["txt_img_queue_ptr"] = jnp.zeros((), jnp.int32)
    return params, state


def _project(params, infer, prefix: str = ""):
    cls_txt = infer["text_feats"][:, 0]
    cls_img = infer["image_feats"][:, 0]
    txt = l2_normalize(H.moco_head(params[prefix + "txt_projector"],
                                   cls_txt), axis=1)
    img = l2_normalize(H.moco_head(params[prefix + "img_projector"],
                                   cls_img), axis=1)
    return txt, img


def _shared_enqueue(state, keys_txt, keys_img):
    """Enqueue text then image keys into the shared circular queue
    (reference :76-93)."""
    queue, ptr = state["txt_img_queue"], state["txt_img_queue_ptr"]
    K = queue.shape[1]
    B = keys_txt.shape[0]
    if K % B != 0:
        # same invariant as contrastive.dequeue_and_enqueue (reference
        # objectives.py:241): each write is B wide and ptr advances
        # mod K, so a non-divisible K lets dynamic_update_slice CLAMP
        # the start index at wraparound and silently desync queue
        # contents from the pointer.
        raise ValueError(
            f"standalone-MoCo queue size ({K}) must be divisible by "
            f"the batch ({B})")
    queue = jax.lax.dynamic_update_slice(
        queue, keys_txt.T.astype(queue.dtype), (0, ptr))
    ptr = jnp.mod(ptr + B, K)
    queue = jax.lax.dynamic_update_slice(
        queue, keys_img.T.astype(queue.dtype), (0, ptr))
    ptr = jnp.mod(ptr + B, K).astype(state["txt_img_queue_ptr"].dtype)
    return dict(state, txt_img_queue=queue, txt_img_queue_ptr=ptr)


STANDALONE_TWINS = ("text_embeddings", "token_type_embeddings",
                    "transformer", "txt_projector", "img_projector")


def compute_standalone_moco(model, params, state, batch, *, rng,
                            temperature: float = 0.07,
                            momentum: float = 0.999,
                            train: bool = True,
                            attacked_text: Optional[Dict[str, Any]] = None,
                            pgd_fn=None):
    """One bidirectional MoCo step.  Returns (ret, new_params, new_state).

    `pgd_fn(params, batch, txt_k, queue) -> img_delta` attacks the image
    query against the text keys (reference pgd :180-230)."""
    new_params = (momentum_update(params, momentum,
                                  twins=STANDALONE_TWINS)
                  if train else params)

    # momentum keys
    infer_k = model.infer_k(new_params, batch, deterministic=True)
    txt_k, img_k = _project(new_params, infer_k, prefix="k_")
    txt_k = jax.lax.stop_gradient(txt_k)
    img_k = jax.lax.stop_gradient(img_k)
    queue = jax.lax.stop_gradient(state["txt_img_queue"])

    # attacked views
    qbatch = dict(batch)
    if pgd_fn is not None:
        delta = pgd_fn(new_params, batch, txt_k, queue)
        qbatch["image"] = batch["image"] + delta
    if attacked_text is not None:
        qbatch["text_ids"] = attacked_text["text_ids"]
        qbatch["text_masks"] = attacked_text["text_masks"]

    infer_q = model.infer(new_params, qbatch, rng=rng,
                          deterministic=not train)
    txt_q, img_q = _project(new_params, infer_q)

    def nce(q, k):
        return infonce(q, k, queue, temperature)

    loss_txt, logits_txt = nce(txt_q, img_k)
    loss_img, logits_img = nce(img_q, txt_k)

    new_state = dict(state)
    if train:
        new_state = _shared_enqueue(new_state, txt_k, img_k)

    ret = {
        "standalone_moco_loss": 0.5 * (loss_txt + loss_img),
        "moco_txt_loss": loss_txt,
        "moco_img_loss": loss_img,
        "logits_txt": logits_txt,
        "logits_img": logits_img,
    }
    return ret, new_params, new_state
