"""AOT serving: trained inference paths as serialized StableHLO
artifacts (jax.export).

The reference serves through live gradio processes that hold the full
torch module in Python (reference demo.py:70-151, demo_vqa.py:57-78).
The TPU-native serving unit is instead an ahead-of-time lowered
artifact: `export_inference` traces ONE task's jitted inference at a
fixed batch shape, serializes the StableHLO module, and
`load_artifact` rehydrates a callable that needs no model code — only
the params pytree (loaded separately via the same `load_path`
semantics training uses, train/loop.py:load_initial_params).  The
artifact is portable across processes/hosts with compatible jax/XLA
versions; the serving runtime compiles it once per chip at first call.

Params are export ARGUMENTS, not baked constants, so the artifact
stays ~kB-scale (ViLT-B params as constants would be a ~0.5 GB blob)
and one artifact serves every checkpoint of the same architecture.

Tasks:
  mlm   -> (B, T, vocab) logits              (demo.py MASK-fill)
  itm   -> (B, 2) match logits
  rank  -> (B,) rank_output score            (retrieval serving)
  vqa   -> (B, vqav2_label_size) logits      (demo_vqa.py)
  embed -> (B, 128) l2-normalized moco projection (similarity serving)

Batch wire format follows cfg.image_dtype: uint8 artifacts take raw
patch rows + image_hw and normalize in-graph (PARITY #26); float32
artifacts take normalized rows.
"""

from __future__ import annotations

from typing import Dict, Optional

TASKS = ("mlm", "itm", "rank", "vqa", "embed")
# head params each task serves from (created by init_vilt for the
# matching active loss: mlm->mlm, itm->itm, rank->irtr, vqa->vqa,
# embed->moco; models/vilt.py:165-215)
REQUIRED_HEAD = {"mlm": "mlm_score", "itm": "itm_score",
                 "rank": "rank_output", "vqa": "vqa_classifier",
                 "embed": "moco_head"}


def build_infer_fn(cfg, task: str):
    """(params, batch) -> per-task output; pure/jittable."""
    if task not in TASKS:
        raise ValueError(f"task must be one of {TASKS}, got {task!r}")
    from rmcl_tpu.models import heads as H
    from rmcl_tpu.models.vilt import ViLTModel
    from rmcl_tpu.objectives.losses import l2_normalize

    model = ViLTModel(cfg)

    def f(params, batch):
        inf = model.infer(params, batch, deterministic=True)
        if task == "mlm":
            return H.mlm_head(params["mlm_score"], inf["text_feats"])
        if task == "itm":
            return H.itm_head(params["itm_score"], inf["cls_feats"])
        if task == "rank":
            return H.rank_output(params["rank_output"],
                                 inf["cls_feats"])[:, 0]
        if task == "vqa":
            return H.vqa_classifier(params["vqa_classifier"],
                                    inf["cls_feats"])
        return l2_normalize(
            H.moco_head(params["moco_head"], inf["cls_feats"]), axis=1)

    return f


def batch_spec(cfg, batch_size: int) -> Dict[str, "jax.ShapeDtypeStruct"]:
    """Serving input signature for cfg's wire format."""
    import jax
    import jax.numpy as jnp

    B, T = batch_size, cfg.max_text_len
    idtype = jnp.uint8 if cfg.image_dtype == "uint8" else jnp.float32
    if cfg.image_layout == "patch":
        gh, gw = cfg.grid_hw
        ishape = (B, gh * gw, cfg.patch_size ** 2 * 3)
    else:
        H, W = cfg.image_bucket_hw
        ishape = (B, H, W, 3)
    spec = {
        "image": jax.ShapeDtypeStruct(ishape, idtype),
        "text_ids": jax.ShapeDtypeStruct((B, T), jnp.int32),
        "text_masks": jax.ShapeDtypeStruct((B, T), jnp.int32),
    }
    if cfg.image_dtype == "uint8":
        spec["image_hw"] = jax.ShapeDtypeStruct((B, 2), jnp.int32)
    return spec


def export_inference(cfg, params, task: str, batch_size: int,
                     out_path: Optional[str] = None) -> bytes:
    """Serialize the task's inference program; optionally write it."""
    import jax
    from jax import export as jex

    if REQUIRED_HEAD[task] not in params:
        raise ValueError(
            f"params carry no {REQUIRED_HEAD[task]!r} head — export "
            f"{task!r} from a config whose loss_names activate it "
            f"(see rmcl_tpu/serve.py REQUIRED_HEAD)")
    f = jax.jit(build_infer_fn(cfg, task))
    pspec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    # multi-platform artifact: the export machine (often a CPU host)
    # need not match the serving chip
    blob = jex.export(f, platforms=("cpu", "tpu"))(
        pspec, batch_spec(cfg, batch_size)).serialize()
    if out_path:
        with open(out_path, "wb") as fh:
            fh.write(blob)
    return bytes(blob)


def load_artifact(blob_or_path):
    """bytes or file path -> callable(params, batch)."""
    from jax import export as jex

    blob = blob_or_path
    if isinstance(blob, str):
        with open(blob, "rb") as fh:
            blob = fh.read()
    exp = jex.deserialize(bytearray(blob))
    return lambda params, batch: exp.call(params, batch)
