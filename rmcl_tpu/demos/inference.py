"""Demo inference core (reference demo.py:34-160, demo_vqa.py:30-80),
UI-independent so the gradio apps are thin shells and tests can drive it.

Three capabilities:
  * iterative [MASK] filling via mlm_score — each pass commits the single
    most-confident masked position (reference demo.py:70-84);
  * IPOT word-patch-alignment heatmap for a chosen token: transport plan
    row scattered back onto the patch grid (reference demo.py:96-151);
  * VQA answering: vqa_classifier argmax -> id2answer
    (reference demo_vqa.py:57-78).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from rmcl_tpu.core.config import RMCLConfig
from rmcl_tpu.data.transforms import min_max_resize, to_normalized_array
from rmcl_tpu.models.heads import mlm_head, vqa_classifier
from rmcl_tpu.models.vilt import ViLTModel
from rmcl_tpu.objectives.ot import cost_matrix_cosine, ipot


def prepare_image(image: Image.Image, cfg: RMCLConfig) -> np.ndarray:
    """PIL -> (1, H, W, 3) canvas-padded normalized array."""
    longer = int((1333 / 800) * cfg.image_size)
    arr = to_normalized_array(
        min_max_resize(image, shorter=cfg.image_size, longer=longer))
    H, W = cfg.image_bucket_hw
    canvas = np.zeros((1, H, W, 3), np.float32)
    h, w = min(arr.shape[0], H), min(arr.shape[1], W)
    canvas[0, :h, :w] = arr[:h, :w]
    return canvas


class DemoEngine:
    def __init__(self, cfg: RMCLConfig, params, tokenizer,
                 id2answer: Optional[Dict[int, str]] = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.id2answer = id2answer or {}
        self.model = ViLTModel(cfg)
        self._infer = jax.jit(
            lambda p, b: self.model.infer(p, b, deterministic=True))

    # ------------------------------------------------------------ helpers
    def _text_batch(self, text: str, img: np.ndarray) -> Dict[str, jnp.ndarray]:
        enc = self.tokenizer([text], max_length=self.cfg.max_text_len,
                             return_tensors="np")
        return {
            "image": jnp.asarray(img),
            "text_ids": jnp.asarray(enc["input_ids"]),
            "text_labels": jnp.asarray(enc["input_ids"]),
            "text_masks": jnp.asarray(enc["attention_mask"]),
        }

    # ---------------------------------------------------------- mlm fill
    def mlm_fill(self, image: Image.Image, masked_text: str
                 ) -> Tuple[str, List[str]]:
        """Fill every [MASK], most-confident-first.  Returns the final
        text and the per-step intermediate strings."""
        img = prepare_image(image, self.cfg)
        mask_id = self.tokenizer.mask_token_id
        n_masks = len(re.findall(r"\[MASK\]", masked_text))
        current = masked_text
        steps = [current]
        for _ in range(n_masks):
            batch = self._text_batch(current, img)
            infer = self._infer(self.params, batch)
            logits = mlm_head(self.params["mlm_score"],
                              infer["text_feats"])[0]
            probs = np.asarray(jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1))
            ids = np.asarray(batch["text_ids"][0])
            inner = ids[1:-1] if ids[-1] != 0 else ids[1:]
            n = len(ids)
            best_val = probs[:n].max(axis=-1)
            best_id = probs[:n].argmax(axis=-1)
            best_val[ids != mask_id] = 0.0
            if best_val.max() == 0.0:
                break
            pos = int(best_val.argmax())
            ids = ids.copy()
            ids[pos] = best_id[pos]
            current = self.tokenizer.decode(ids, skip_special_tokens=True)
            steps.append(current)
        return current, steps

    # ----------------------------------------------------------- heatmap
    def wpa_heatmap(self, image: Image.Image, text: str, token_idx: int,
                    ot_iterations: int = 100
                    ) -> Tuple[np.ndarray, str]:
        """IPOT transport-plan heatmap for token `token_idx` (position in
        the tokenized text incl. CLS).  Returns (heatmap (gh, gw), token)."""
        img = prepare_image(image, self.cfg)
        batch = self._text_batch(text, img)
        infer = self.model.infer(self.params, batch, deterministic=True)

        txt_emb = infer["text_feats"].astype(jnp.float32)
        img_emb = infer["image_feats"].astype(jnp.float32)
        txt_mask = np.asarray(infer["text_masks"]).astype(bool)
        img_mask = np.asarray(infer["image_masks"]).astype(bool)
        lens = txt_mask.sum(axis=1)
        txt_mask[np.arange(len(lens)), lens - 1] = False
        txt_mask[:, 0] = False
        img_mask[:, 0] = False
        txt_pad = jnp.asarray(~txt_mask)
        img_pad = jnp.asarray(~img_mask)

        cost = cost_matrix_cosine(txt_emb, img_emb)
        joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
        cost = jnp.where(joint_pad, 0.0, cost)
        txt_len = (txt_pad.shape[1] - txt_pad.sum(1)).astype(jnp.float32)
        img_len = (img_pad.shape[1] - img_pad.sum(1)).astype(jnp.float32)
        T = ipot(cost, txt_len, txt_pad, img_len, img_pad, joint_pad,
                 0.1, ot_iterations, 1)

        plan = np.asarray(T[0]) * txt_emb.shape[0]   # (img, txt)
        row = plan.T[token_idx][1:]                  # drop image CLS
        patch_index, (gh, gw) = infer["patch_index"]
        pidx = np.asarray(patch_index[0])
        heat = np.zeros((gh, gw), np.float32)
        for i in range(min(len(row), pidx.shape[0])):
            heat[pidx[i, 0], pidx[i, 1]] = row[i]
        std = heat.std() or 1.0
        heat = (heat - heat.mean()) / std
        heat = np.clip(heat, 1.0, 3.0)
        rng = heat.max() - heat.min() or 1.0
        heat = (heat - heat.min()) / rng
        ids = self.tokenizer([text], max_length=self.cfg.max_text_len,
                             return_tensors="np")["input_ids"][0]
        token = self.tokenizer.convert_ids_to_tokens(int(ids[token_idx]))
        return heat, token

    # --------------------------------------------------------------- vqa
    def answer(self, image: Image.Image, question: str,
               topk: int = 5) -> List[Tuple[str, float]]:
        img = prepare_image(image, self.cfg)
        batch = self._text_batch(question, img)
        infer = self._infer(self.params, batch)
        logits = vqa_classifier(self.params["vqa_classifier"],
                                infer["cls_feats"])[0]
        probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32)))
        top = np.argsort(-probs)[:topk]
        return [(self.id2answer.get(int(i), f"label_{int(i)}"),
                 float(probs[i])) for i in top]
