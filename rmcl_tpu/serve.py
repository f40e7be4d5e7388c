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

import json
from typing import Dict, List, Optional, Sequence

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


def export_meta(cfg, task: str, batch_size: int) -> Dict:
    """Self-description a serving host needs to preprocess requests for
    the artifact (written as an `<out_path>.json` sidecar): the fixed
    shapes plus the host-side image/text pipeline parameters."""
    return {
        "task": task,
        "batch_size": batch_size,
        "image_dtype": cfg.image_dtype,
        "image_layout": cfg.image_layout,
        "patch_size": cfg.patch_size,
        "image_size": cfg.image_size,
        "image_bucket_hw": list(cfg.image_bucket_hw),
        "max_text_len": cfg.max_text_len,
        "tokenizer": cfg.tokenizer,
    }


def export_inference(cfg, params, task: str, batch_size: int,
                     out_path: Optional[str] = None) -> bytes:
    """Serialize the task's inference program; optionally write it
    (plus an `<out_path>.json` metadata sidecar, see export_meta)."""
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
        with open(out_path + ".json", "w") as fh:
            json.dump(export_meta(cfg, task, batch_size), fh, indent=1)
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


class ArtifactSession:
    """Serving runtime over an exported artifact: raw requests (PIL
    image + text string) -> host preprocessing through the SAME
    resize/normalize/patch-row/tokenize code paths training uses
    (data/transforms.py, data/arrow_dataset.py) -> fixed-shape padded
    batch -> artifact call -> unpadded outputs.

    Replaces the reference's gradio process that holds the live torch
    module (demo.py:34-160): here the model is the deserialized
    StableHLO program; requests beyond the exported batch size are
    chunked, short chunks are padded by repeating the first request
    (padded rows are dropped before returning).
    """

    def __init__(self, artifact, params, tokenizer, meta: Dict):
        from rmcl_tpu.data.transforms import pixelbert_transform
        self.fn = load_artifact(artifact)
        self.params = params
        self.tokenizer = tokenizer
        self.meta = dict(meta)
        # the exact training image pipeline (resize -> bucket ->
        # normalize-or-u8), incl. the fused native C++ fast path
        self._transform = pixelbert_transform(
            size=self.meta["image_size"],
            bucket_hw=tuple(self.meta["image_bucket_hw"]),
            out_dtype=self.meta["image_dtype"])

    @classmethod
    def open(cls, path: str, params, tokenizer=None):
        """Artifact + its `<path>.json` sidecar (see export_meta); the
        tokenizer defaults to the one the config trained with."""
        with open(path + ".json") as fh:
            meta = json.load(fh)
        if tokenizer is None:
            from rmcl_tpu.data.tokenizer import get_tokenizer
            tokenizer = get_tokenizer(meta["tokenizer"])
        return cls(path, params, tokenizer, meta)

    # ------------------------------------------------------- preprocessing
    def _prep_image(self, image) -> "np.ndarray":
        """PIL image (or HWC uint8 array) -> resized array in the wire
        dtype, clipped to the bucket — per-sample half of the training
        loader's image path."""
        import numpy as np
        from PIL import Image
        from rmcl_tpu.data.transforms import (
            fit_bucket, min_max_size, to_normalized_array)

        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        m = self.meta
        longer = int((1333 / 800) * m["image_size"])
        w, h = image.size
        neww, newh = min_max_size(w, h, m["image_size"], longer)
        if neww < 32 or newh < 32:
            # serving robustness: the reference MinMaxResize /32 floor
            # (transforms/utils.py:5-27) yields size 0 for extreme
            # aspect ratios and PIL raises; clamp to one patch instead
            # of refusing the request (training keeps the
            # reference-exact helper)
            img = fit_bucket(
                image.resize((max(neww, 32), max(newh, 32)),
                             Image.BICUBIC),
                tuple(m["image_bucket_hw"]))
            if m["image_dtype"] == "uint8":
                return np.asarray(img.convert("RGB"), np.uint8)
            return to_normalized_array(img)
        return self._transform(image)

    def _assemble(self, images: Sequence, texts: Sequence[str]) -> Dict:
        """<=B requests -> the exact fixed-shape batch_spec pytree."""
        import numpy as np
        from rmcl_tpu.data.arrow_dataset import _images_to_patch_rows

        m, B = self.meta, self.meta["batch_size"]
        n = len(images)
        images = list(images) + [images[0]] * (B - n)   # pad by repeat
        texts = list(texts) + [texts[0]] * (B - n)
        arrs = [self._prep_image(im) for im in images]
        H, W = m["image_bucket_hw"]
        if m["image_layout"] == "patch":
            image = _images_to_patch_rows(arrs, H, W, m["patch_size"])
        else:
            image = np.zeros(
                (B, H, W, 3),
                np.uint8 if m["image_dtype"] == "uint8" else np.float32)
            for bi, a in enumerate(arrs):
                image[bi, :a.shape[0], :a.shape[1]] = a[:H, :W]
        # truncation explicit: training tokenizes with truncation=True
        # (data/arrow_dataset.py:139) and HF BertTokenizerFast does NOT
        # truncate by default — an over-long request would otherwise
        # break the fixed (B, T) artifact signature
        enc = self.tokenizer(texts, max_length=m["max_text_len"],
                             padding="max_length", truncation=True,
                             return_tensors="np")
        batch = {
            "image": image,
            "text_ids": np.asarray(enc["input_ids"], np.int32),
            "text_masks": np.asarray(enc["attention_mask"], np.int32),
        }
        if m["image_dtype"] == "uint8":
            batch["image_hw"] = np.asarray(
                [[min(a.shape[0], H), min(a.shape[1], W)] for a in arrs],
                np.int32)
        return batch

    # ------------------------------------------------------------- serving
    def predict(self, images: Sequence, texts: Sequence[str]):
        """n requests -> (n, ...) outputs, chunked over the exported
        batch size."""
        import numpy as np

        if len(images) != len(texts):
            raise ValueError("images and texts must pair 1:1")
        if not images:
            raise ValueError("predict() needs at least one request")
        B, outs = self.meta["batch_size"], []
        for i in range(0, len(images), B):
            chunk = slice(i, i + B)
            n = len(images[chunk])
            out = self.fn(self.params, self._assemble(
                images[chunk], texts[chunk]))
            outs.append(np.asarray(out)[:n])
        return np.concatenate(outs, axis=0)


def postprocess(task: str, out, tokenizer=None, text_ids=None,
                topk: int = 5) -> List[Dict]:
    """Raw artifact outputs -> JSON-serializable per-request records
    (the `rmcl serve` response format)."""
    import numpy as np

    out = np.asarray(out, np.float32)
    recs: List[Dict] = []
    for i in range(out.shape[0]):
        if task == "itm":
            p = np.exp(out[i] - out[i].max())
            p /= p.sum()
            recs.append({"match_prob": float(p[1])})
        elif task == "rank":
            recs.append({"score": float(out[i])})
        elif task == "embed":
            recs.append({"embedding": [float(x) for x in out[i]]})
        elif task == "vqa":
            p = np.exp(out[i] - out[i].max())
            p /= p.sum()
            top = np.argsort(-p)[:topk]
            recs.append({"answers": [[int(j), float(p[j])] for j in top]})
        else:  # mlm: argmax token at each [MASK] position
            ids = np.asarray(text_ids[i])
            mask_id = tokenizer.mask_token_id
            pos = np.where(ids == mask_id)[0]
            pred = out[i].argmax(axis=-1)
            recs.append({"fills": [
                [int(p_), tokenizer.convert_ids_to_tokens(int(pred[p_]))]
                for p_ in pos]})
    return recs
