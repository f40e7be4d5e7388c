"""Produce the golden parity dump for the REAL published ViLT weights.

Run this in a torch environment that has the reference repo
(stanFurrer/Robust-Multimodal-Contrastive-Learning) importable and the
public checkpoint downloaded:

    python scripts/make_golden_reference.py \
        --reference /path/to/Robust-Multimodal-Contrastive-Learning \
        --ckpt models_weight/vilt_200k_mlm_itm.ckpt \
        --out models_weight/golden_vilt_200k.npz

It drives the reference's own ViLTransformerSS.infer on a pinned batch
(fixed-seed uniform image on the 384x384 canvas + a fixed caption) and
saves inputs + {text_feats, image_feats, cls_feats} via
rmcl_tpu.compat.golden.save_golden.  tests/test_compat.py's
test_real_checkpoint_convert_and_forward then compares the converted
JAX forward against this dump (atol 5e-3; reference EVAL.md:2 itself
warns of batch-composition sensitivity, which pinning removes).

This script contains no reference code — it imports the reference as a
library, exactly like the reference's own demo.py does.
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-text-len", type=int, default=40)
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch
    from transformers import BertTokenizer
    from vilt import config as vilt_config
    from vilt.modules import ViLTransformerSS

    cfg = vilt_config.ex.run(
        command_name="print_config",
        named_configs=["task_mlm_itm"],
        config_updates={"load_path": args.ckpt, "test_only": True},
    ).config

    model = ViLTransformerSS(cfg)
    model.setup("test")
    model.eval()

    rng = np.random.RandomState(0)
    img = rng.uniform(-1, 1, (1, 3, 384, 384)).astype(np.float32)
    tok = BertTokenizer.from_pretrained("bert-base-uncased")
    enc = tok("a dog is playing in the park",
              padding="max_length", max_length=args.max_text_len,
              truncation=True, return_tensors="pt")
    batch = {
        "image": [torch.from_numpy(img)],
        "text_ids": enc["input_ids"],
        "text_masks": enc["attention_mask"],
        "text_labels": torch.full_like(enc["input_ids"], -100),
    }
    with torch.no_grad():
        out = model.infer(batch, max_image_len=-1)

    from rmcl_tpu.compat.golden import save_golden
    save_golden(
        args.out,
        {
            # channels-last for the JAX side
            "image": np.transpose(img, (0, 2, 3, 1)),
            "text_ids": enc["input_ids"].numpy().astype(np.int32),
            "text_masks": enc["attention_mask"].numpy().astype(np.int32),
        },
        {k: out[k].float().numpy()
         for k in ("text_feats", "image_feats", "cls_feats")},
        meta={"ckpt": os.path.basename(args.ckpt),
              "caption": "a dog is playing in the park",
              "max_image_len": -1},
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
