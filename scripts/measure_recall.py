"""On-chip COCO IR/TR recall wall-clock measurement (VERDICT round-1 #8).

The reference's COCO recall epoch is a Python double loop of eager
forwards: 34h58m on 8 GPUs (reference EVAL.md:49).  Ours
(eval/retrieval.py) caches visual_embed per image and scores texts in
static-shape chunks.  This script slope-times the two jitted pieces at
the real COCO-test scale (5000 images x 25010 texts, txt_chunk=256) and
extrapolates the full-epoch wall-clock on one v5e chip.

Run: python scripts/measure_recall.py   (needs the TPU tunnel)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import bench_prog

import os

N_IMAGES = 5000
N_TEXTS = 25010
TXT_CHUNK = int(os.environ.get("RECALL_CHUNK", "256"))
MAX_IMAGE_LEN = int(os.environ.get("RECALL_MAX_IMAGE_LEN", "200"))
# ranked text length: 40 = unbucketed max_text_len; eval/retrieval.py's
# text bucket ranks at the /8 bucket of the real caption lengths (~16)
TEXT_LEN = int(os.environ.get("RECALL_TEXT_LEN", "40"))


def main():
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.models.heads import rank_output
    from rmcl_tpu.models.vilt import ViLTModel, init_vilt
    from rmcl_tpu.models.vit import visual_embed

    cfg = build_config(
        "task_finetune_irtr_coco_randaug",
        image_bucket_hw=(384, 576), max_image_len=MAX_IMAGE_LEN,
        compute_dtype="bfloat16", image_layout="patch")
    print(f"max_image_len={MAX_IMAGE_LEN} text_len={TEXT_LEN}",
          file=sys.stderr, flush=True)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    params, _ = init_vilt(jax.random.PRNGKey(0), cfg)
    model = ViLTModel(cfg)
    spec = model.spec
    dtype = jnp.dtype(cfg.compute_dtype)

    H, W = cfg.image_bucket_hw
    grid_hw = None
    if cfg.image_layout == "patch":
        P = cfg.patch_size
        grid_hw = (H // P, W // P)
        img = jnp.asarray(
            np.random.RandomState(0).rand(
                1, (H // P) * (W // P), P * P * 3), dtype=jnp.float32)
    else:
        img = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3),
                          jnp.float32)
    ids = jnp.asarray(
        np.random.RandomState(1).randint(1000, 2000,
                                         (TXT_CHUNK, TEXT_LEN)),
        jnp.int32)
    masks = jnp.ones_like(ids)

    # ---- piece 1: per-image visual_embed
    def make_embed(n):
        @jax.jit
        def f(params, img):
            def body(i, acc):
                ie, im, _, _ = visual_embed(
                    params["transformer"], img + acc * 1e-9, spec=spec,
                    max_image_len=cfg.max_image_len, dtype=dtype,
                    grid_hw=grid_hw)
                return acc + jnp.sum(ie).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    t_embed, n1 = bench_prog(make_embed, params, img, verbose=True)
    print(f"visual_embed: {t_embed*1e3:.2f} ms/image", flush=True)

    # ---- piece 2: one 256-text chunk vs one cached image
    ie0, im0 = jax.jit(
        lambda p, im_: visual_embed(p["transformer"], im_, spec=spec,
                                    max_image_len=cfg.max_image_len,
                                    dtype=dtype, grid_hw=grid_hw)[:2],
        static_argnums=())(params, img)

    def make_chunk(n):
        @jax.jit
        def f(params, ie, im, ids, masks):
            C = ids.shape[0]
            ieb = jnp.broadcast_to(ie, (C, *ie.shape[1:]))
            imb = jnp.broadcast_to(im, (C, im.shape[1]))

            def body(i, acc):
                batch = {"text_ids": ids + (acc > 1e30).astype(jnp.int32),
                         "text_masks": masks,
                         "text_labels": jnp.full_like(ids, -100)}
                infer = model.infer(params, batch, image_embeds=ieb,
                                    image_masks=imb, deterministic=True)
                s = rank_output(params["rank_output"],
                                infer["cls_feats"])[:, 0]
                return acc + jnp.sum(s).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    t_chunk, n2 = bench_prog(make_chunk, params, ie0, im0, ids, masks,
                             verbose=True)
    pairs_per_sec = TXT_CHUNK / t_chunk
    print(f"score_chunk({TXT_CHUNK}): {t_chunk*1e3:.2f} ms "
          f"-> {pairs_per_sec:,.0f} pairs/s", flush=True)

    chunks_per_img = -(-N_TEXTS // TXT_CHUNK)
    total_s = N_IMAGES * (t_embed + chunks_per_img * t_chunk)
    print(f"\nCOCO test 5000x25010 extrapolation "
          f"({chunks_per_img} chunks/img):")
    print(f"  one v5e chip : {total_s/3600:.2f} h "
          f"(reference: 34h58m on 8 GPUs, EVAL.md:49)")
    print(f"  8-chip DP    : {total_s/8/3600:.2f} h")


if __name__ == "__main__":
    main()
