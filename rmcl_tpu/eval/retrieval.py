"""IR/TR recall evaluation (reference objectives.py
compute_irtr_recall:1225-1346 and compute_attacked_irtr_recall:1348-1502).

The reference ranks every (image, text) pair with a Python double loop of
eager forwards — 34h58m for COCO on 8 GPUs (EVAL.md:49).  TPU redesign:

  * per-image `visual_embed` computed ONCE (the reference also caches
    this, :1274-1281, but then loops texts per image in Python);
  * the pair scoring is ONE jitted function over a (chunk_txt,) batch of
    texts against one image's cached embeddings, scanned over images by
    the host — every forward is a full static-shape batch on the MXU;
  * scores accumulate in a host numpy (n_img, n_txt) matrix; top-k both
    directions at the end (same math as reference :1324-1344).

The attacked variant perturbs text (greedy) / image (PGD) *before*
caching, then ranks identically — fixing the reference bug where
attacked preloads were computed but unused (:1440, SURVEY.md §2.5).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.core.buckets import bucket_enabled, text_bucket
from rmcl_tpu.models.heads import rank_output
from rmcl_tpu.models.vit import visual_embed


def _chunked(n: int, c: int):
    for s in range(0, n, c):
        yield s, min(s + c, n)


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


def recall_at_k(scores: np.ndarray, iids: np.ndarray, tiids: np.ndarray
                ) -> Tuple[float, ...]:
    """scores: (n_img, n_txt); iids: image id per row; tiids: the image id
    each text belongs to.  Returns (ir_r1, ir_r5, ir_r10, tr_r1, tr_r5,
    tr_r10) — same definition as reference objectives.py:1324-1344."""
    s = jnp.asarray(scores)
    iid = jnp.asarray(iids)
    tiid = jnp.asarray(tiids)

    # text retrieval: for each image (row), rank texts
    def tr(k):
        topk = jax.lax.top_k(s, min(k, s.shape[1]))[1]       # (n_img, k)
        hit = (tiid[topk] == iid[:, None]).any(axis=1)
        return float(hit.mean())

    # image retrieval: for each text (col), rank images
    st = s.T
    def ir(k):
        topk = jax.lax.top_k(st, min(k, st.shape[1]))[1]     # (n_txt, k)
        hit = (iid[topk] == tiid[:, None]).any(axis=1)
        return float(hit.mean())

    return (ir(1), ir(5), ir(10), tr(1), tr(5), tr(10))


def compute_irtr_recall(trainer, dataset_name: Optional[str] = None,
                        split: str = "test", txt_chunk: int = 256,
                        max_texts: Optional[int] = None,
                        max_images: Optional[int] = None,
                        verbose: bool = True,
                        attack_text_fn=None,
                        attack_image_fn=None,
                        shard_by_process: bool = True) -> Tuple[float, ...]:
    """Full cross-product IR/TR recall using `rank_output` scores.

    `attack_text_fn(ids, masks) -> (ids, masks)` and
    `attack_image_fn(canvas) -> canvas` perturb the cached inputs before
    ranking — the attacked-recall path (see compute_attacked_irtr_recall).

    Multi-host: with `shard_by_process` (default) each host ranks only
    its `rank::world` slice of the image rows and the partial score rows
    are reassembled with a host-level all_gather — the reference's
    rank-sliced score assembly (objectives.py:1315-1317,1537-1565).
    Every host returns the identical full recall tuple.
    """
    cfg = trainer.cfg
    model, params = trainer.model, trainer.ts.params
    name = dataset_name or cfg.datasets[0]
    dset = trainer.dm.make_no_false_dset(name, split)
    dtype = jnp.dtype(cfg.compute_dtype)

    # ---- 1. encode all texts once (host -> arrays)
    n_txt_total = len(dset)
    if max_texts:
        n_txt_total = min(n_txt_total, max_texts)
    text_ids = np.zeros((n_txt_total, cfg.max_text_len), np.int32)
    text_masks = np.zeros((n_txt_total, cfg.max_text_len), np.int32)
    tiids = np.zeros((n_txt_total,), np.int64)
    for i in range(n_txt_total):
        t = dset.get_text(i)
        text_ids[i] = np.asarray(t["text"][1]["input_ids"])
        text_masks[i] = np.asarray(t["text"][1]["attention_mask"])
        tiids[i] = t["img_index"]

    # ---- 2. unique images
    img_rows = sorted(set(int(i) for i in tiids))
    if max_images:
        img_rows = img_rows[:max_images]
        keep = np.isin(tiids, img_rows)
        text_ids, text_masks, tiids = (text_ids[keep], text_masks[keep],
                                       tiids[keep])
        n_txt_total = len(tiids)
    iids = np.asarray(img_rows, np.int64)

    if attack_text_fn is not None:
        text_ids, text_masks = attack_text_fn(text_ids, text_masks)

    # rank at the smallest /8 text bucket covering every caption
    # (computed AFTER the text attack, which can lengthen texts).
    # EXACT: the dropped rows are all-pad and attention-masked; the win
    # is geometric — at the reference's own irtr eval config
    # (max_image_len=-1, config.py:349-406 leaves the -1 default) the
    # sequence is ~217+1+40 = 258, which the fused kernels pad to 384;
    # bucketing typical ~16-token captions brings S back under 256,
    # dropping a whole 128-row tile (~33% of the O(n_img x n_txt) rank
    # FLOPs).  Same numeric class as padded-batch composition
    # (reference EVAL.md:2); disable with cfg.eval_text_bucket=False.
    if bucket_enabled(cfg, "eval") and n_txt_total:
        tb = text_bucket(int(text_masks.sum(axis=1).max()),
                         cfg.max_text_len)
        text_ids = text_ids[:, :tb]
        text_masks = text_masks[:, :tb]

    # ---- 3. jitted pair scorer: one image's cached embeds vs a text
    # chunk.  Params are explicit jit ARGUMENTS — closing over them can
    # bake host-resident leaves into the HLO as constants (remote
    # compile payload blow-up).  The jitted closures are cached on the
    # trainer: fresh function objects would miss jit's cache and
    # re-trace + re-compile the full scorer EVERY validation epoch.
    spec = trainer.model.spec
    jits = getattr(trainer, "_recall_jits", None)
    if jits is None:
        @jax.jit
        def embed_image(params, img):
            ie, im, _, _ = visual_embed(
                params["transformer"], img, spec=spec,
                max_image_len=cfg.max_image_len, dtype=dtype)
            return ie, im

        @jax.jit
        def score_chunk(params, ie, im, ids, masks):
            C = ids.shape[0]
            ieb = jnp.broadcast_to(ie, (C, *ie.shape[1:]))
            imb = jnp.broadcast_to(im, (C, im.shape[1]))
            batch = {"text_ids": ids, "text_masks": masks,
                     "text_labels": jnp.full_like(ids, -100)}
            infer = model.infer(params, batch, image_embeds=ieb,
                                image_masks=imb, deterministic=True)
            return rank_output(params["rank_output"],
                               infer["cls_feats"])[:, 0]

        jits = (embed_image, score_chunk)
        try:
            trainer._recall_jits = jits
        except AttributeError:
            pass                      # ad-hoc trainer stubs in tests
    embed_image, score_chunk = jits

    # ---- 4. rank loop: images outer (cached embed), text chunks inner;
    # multi-host: shard the image rows over processes, gather at the end
    world = jax.process_count()
    rank = jax.process_index()
    my_iis = (list(range(len(img_rows)))[rank::world]
              if (shard_by_process and world > 1)
              else list(range(len(img_rows))))
    scores = np.zeros((len(img_rows), n_txt_total), np.float32)
    t0 = time.time()
    # find one sample index per image row for image fetch
    row_to_sample = {}
    for i, (row, _) in dset.index_mapper.items():
        if row not in row_to_sample:
            row_to_sample[row] = i
    for ii in my_iis:
        row = img_rows[ii]
        img = dset.get_image(row_to_sample[row])["image"][0]
        if img.dtype == np.uint8:    # u8 wire format: host LUT normalize
            from rmcl_tpu.data.transforms import normalize_u8_array
            img = normalize_u8_array(img)
        H, W = cfg.image_bucket_hw
        canvas = np.zeros((1, H, W, 3), np.float32)
        canvas[0, :img.shape[0], :img.shape[1]] = img[:H, :W]
        if attack_image_fn is not None:
            canvas = np.asarray(attack_image_fn(canvas))
        ie, im = embed_image(params, jnp.asarray(canvas))
        for s, e in _chunked(n_txt_total, txt_chunk):
            ids = _pad_to(text_ids[s:e], txt_chunk)
            masks = _pad_to(text_masks[s:e], txt_chunk)
            out = np.asarray(score_chunk(params, ie, im, jnp.asarray(ids),
                                         jnp.asarray(masks)))
            scores[ii, s:e] = out[: e - s]
        if verbose and (ii + 1) % 50 == 0:
            dt = (time.time() - t0) / (ii + 1)
            print(f"[recall] {ii+1}/{len(img_rows)} images "
                  f"({dt:.2f}s/img)", flush=True)

    if shard_by_process and world > 1:
        # reassemble the full matrix from every host's partial rows
        from rmcl_tpu.parallel import comm
        parts = comm.all_gather({ii: scores[ii] for ii in my_iis})
        for part in parts:
            for ii, row_scores in part.items():
                scores[ii] = row_scores

    return recall_at_k(scores, iids, tiids)


def compute_attacked_irtr_recall(trainer, dataset_name: Optional[str] = None,
                                 split: str = "test",
                                 max_texts: Optional[int] = 20 * 4,
                                 max_images: Optional[int] = None,
                                 text_view: bool = True,
                                 image_view: bool = True,
                                 **kw) -> Tuple[float, ...]:
    """Attacked IR/TR recall (reference
    compute_attacked_irtr_recall:1348-1502, whose rank loop ignored the
    attacked preloads — fixed here: attacked inputs ARE ranked).

    Text attack: greedy word substitution against the in-batch matching
    loss; image attack: the repaired IRTR PGD.  Both capped by
    `max_texts` like the reference's 20-batch preload (:1350,1365).
    """
    cfg = trainer.cfg
    model, ts = trainer.model, trainer.ts
    from rmcl_tpu import attacks
    from rmcl_tpu.models.heads import moco_head
    from rmcl_tpu.objectives.losses import l2_normalize
    import jax as _jax

    attack_text_fn = None
    if text_view and getattr(trainer, "greedy", None) is not None:
        # the extras below are IRTR-shaped (text_repr, temperature,
        # sample_ids) — trainer.greedy may be a different framework's
        # attacker (build_greedy_attacker priority: moco > bt > ...),
        # so build a dedicated IRTR attacker on the same tokenizer +
        # synonym table (reference compute_attacked_irtr_recall always
        # uses the irtr attacker, objectives.py:1410)
        from rmcl_tpu.attacks.greedy import GreedyAttackIrtr
        from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
        _base = getattr(trainer.greedy, "base", trainer.greedy)
        if isinstance(_base, GreedyAttackIrtr):
            _irtr_greedy = trainer.greedy       # already IRTR-shaped
        else:
            _irtr_greedy = GreedyAttackIrtr(cfg, model, _base.tokenizer,
                                            _base.synonyms)
            if isinstance(trainer.greedy, FusedGreedyAttack):
                _irtr_greedy = FusedGreedyAttack(_irtr_greedy)

        def attack_text_fn(ids, masks):
            out_ids = ids.copy()
            out_masks = masks.copy()
            B = 16
            for s in range(0, len(ids), B):
                chunk = {"text_ids": ids[s:s + B],
                         "text_masks": masks[s:s + B]}
                # text-only proxy batch: attack vs own moco projection
                infer = model.infer(
                    ts.params,
                    dict(chunk, image=jnp.zeros(
                        (len(chunk["text_ids"]), *cfg.image_bucket_hw, 3),
                        jnp.float32) + 0.5,
                        text_labels=jnp.full_like(
                            jnp.asarray(chunk["text_ids"]), -100)),
                    deterministic=True)
                tr_repr = l2_normalize(moco_head(
                    ts.params["moco_head"], infer["cls_feats"]), axis=1)
                extras = (_jax.lax.stop_gradient(tr_repr), cfg.temperature,
                          jnp.arange(tr_repr.shape[0]))
                res = _irtr_greedy.adv_attack_samples(
                    ts.params,
                    {"text_ids": chunk["text_ids"],
                     "text_masks": chunk["text_masks"],
                     "text_labels": np.full_like(chunk["text_ids"], -100),
                     "image": np.zeros(
                         (len(chunk["text_ids"]), *cfg.image_bucket_hw, 3),
                         np.float32) + 0.5},
                    extras)
                out_ids[s:s + B] = res["txt_input_ids"]
                out_masks[s:s + B] = res["text_masks"]
            return out_ids, out_masks

    attack_image_fn = None
    if image_view and "moco_head" in ts.params:
        pgd = attacks.make_pgd_irtr(model, cfg.adv_steps_img,
                                    cfg.adv_lr_img, cfg.adv_max_norm_img,
                                    cfg.temperature)

        def attack_image_fn(canvas):
            batch = {
                "image": jnp.asarray(canvas),
                "text_ids": jnp.zeros((1, cfg.max_text_len), jnp.int32),
                "text_labels": jnp.full((1, cfg.max_text_len), -100),
                "text_masks": jnp.ones((1, cfg.max_text_len), jnp.int32),
            }
            infer = model.infer(ts.params, batch, deterministic=True)
            tr_repr = l2_normalize(moco_head(
                ts.params["moco_head"], infer["cls_feats"]), axis=1)
            delta = pgd(ts.params, batch, tr_repr)
            return canvas + np.asarray(delta)

    return compute_irtr_recall(
        trainer, dataset_name=dataset_name, split=split,
        max_texts=max_texts, max_images=max_images,
        attack_text_fn=attack_text_fn, attack_image_fn=attack_image_fn,
        **kw)
