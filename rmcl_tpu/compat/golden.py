"""Golden-tensor parity harness (SURVEY.md §7 compat/).

Workflow:
  1. In a torch environment with the reference repo + public checkpoint,
     run the reference model on a pinned (image, caption) batch and dump
     the feature dict with `save_golden` (plain .npz + a manifest of the
     pinned inputs).
  2. Here, `compare_golden` loads the converted checkpoint, replays the
     same pinned inputs through rmcl_tpu's `infer`, and reports
     per-tensor max-abs-error against the dump.

Batch composition is pinned because the reference itself warns results
vary with padded batch composition (reference EVAL.md:2); the golden
file stores the exact post-transform pixel tensor, not the source image.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

GOLDEN_KEYS = ("text_feats", "image_feats", "cls_feats")


def save_golden(path: str, batch: Dict[str, np.ndarray],
                outputs: Dict[str, np.ndarray],
                meta: Optional[Dict[str, Any]] = None):
    """Dump pinned inputs + reference outputs.  `batch` must contain the
    post-transform image tensor (B, H, W, 3 channels-last) and the
    tokenized text_ids/text_masks."""
    arrays = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            arrays[f"in_{k}"] = v
    for k in GOLDEN_KEYS:
        if k in outputs:
            arrays[f"out_{k}"] = np.asarray(outputs[k], np.float32)
    np.savez_compressed(path, **arrays)
    if meta:
        with open(path + ".json", "w") as fp:
            json.dump(meta, fp, indent=2)


def load_golden(path: str) -> Tuple[Dict[str, np.ndarray],
                                    Dict[str, np.ndarray]]:
    data = np.load(path)
    batch = {k[3:]: data[k] for k in data.files if k.startswith("in_")}
    outputs = {k[4:]: data[k] for k in data.files if k.startswith("out_")}
    return batch, outputs


def compare_golden(path: str, model, params,
                   atol: float = 5e-3) -> Dict[str, float]:
    """Replay the pinned batch; returns {key: max_abs_err} and raises if
    any exceeds atol."""
    import jax
    import jax.numpy as jnp

    batch, golden = load_golden(path)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    if "text_labels" not in jb:
        jb["text_labels"] = jnp.full_like(jb["text_ids"], -100)
    out = model.infer(params, jb, deterministic=True)
    errs = {}
    for k, ref in golden.items():
        got = np.asarray(out[k], np.float32)
        errs[k] = float(np.max(np.abs(got - ref)))
    bad = {k: e for k, e in errs.items() if e > atol}
    if bad:
        raise AssertionError(f"golden mismatch beyond atol={atol}: {bad} "
                             f"(all: {errs})")
    return errs
