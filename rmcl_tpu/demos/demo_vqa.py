"""VQA demo (reference demo_vqa.py): answer a free-form question about an
image with the finetuned VQAv2 checkpoint.

    python -m rmcl_tpu.demos.demo_vqa --ckpt vilt_vqa.ckpt \
        --image cat.jpg --question "what animal is this?"
"""

from __future__ import annotations

import argparse
import json

from PIL import Image

from rmcl_tpu.compat import load_torch_checkpoint
from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.data.tokenizer import get_tokenizer
from rmcl_tpu.demos.inference import DemoEngine


def build_engine(ckpt: str, vocab: str = None,
                 answers_json: str = None) -> DemoEngine:
    cfg = build_config("task_finetune_vqa", test_only=True,
                       image_bucket_hw=(608, 608))
    params, _ = load_torch_checkpoint(ckpt, cfg)
    tok = get_tokenizer(cfg.tokenizer, vocab)
    id2answer = {}
    if answers_json:
        with open(answers_json) as fp:
            id2answer = {int(k): v for k, v in json.load(fp).items()}
    return DemoEngine(cfg, params, tok, id2answer=id2answer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--answers", default=None,
                    help="json {label_id: answer} from the datamodule vocab")
    ap.add_argument("--image", required=True)
    ap.add_argument("--question", required=True)
    ap.add_argument("--web", action="store_true")
    args = ap.parse_args()

    engine = build_engine(args.ckpt, args.vocab, args.answers)
    if args.web:
        import gradio as gr
        import numpy as np

        def infer(image, question):
            out = engine.answer(Image.fromarray(image), question)
            return {a: p for a, p in out}

        gr.Interface(fn=infer, inputs=[gr.Image(), gr.Textbox()],
                     outputs=gr.Label(num_top_classes=5)).launch()
    else:
        image = Image.open(args.image).convert("RGB")
        for a, p in engine.answer(image, args.question):
            print(f"{a}: {p:.4f}")


if __name__ == "__main__":
    main()
