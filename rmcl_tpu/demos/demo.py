"""MLM-fill + word-patch-alignment demo (reference demo.py).

With gradio installed: a web UI.  Otherwise: CLI one-shot.
    python -m rmcl_tpu.demos.demo --ckpt vilt_200k_mlm_itm.ckpt \
        --image cat.jpg --text "a [MASK] sitting on the grass" --hidx 2
"""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image

from rmcl_tpu.compat import load_torch_checkpoint
from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.data.tokenizer import get_tokenizer
from rmcl_tpu.demos.inference import DemoEngine


def build_engine(ckpt: str, vocab: str = None) -> DemoEngine:
    cfg = build_config(loss_names=loss_names({"mlm": 1, "itm": 1}),
                       image_bucket_hw=(608, 608))
    params, _ = load_torch_checkpoint(ckpt, cfg)
    tok = get_tokenizer(cfg.tokenizer, vocab)
    return DemoEngine(cfg, params, tok)


def run_cli(args):
    engine = build_engine(args.ckpt, args.vocab)
    image = Image.open(args.image).convert("RGB")
    filled, steps = engine.mlm_fill(image, args.text)
    print("filled:", filled)
    for i, s in enumerate(steps):
        print(f"  step {i}: {s}")
    if args.hidx > 0:
        heat, token = engine.wpa_heatmap(image, filled, args.hidx)
        print(f"alignment heatmap for token {token!r}:")
        for row in (heat * 9).astype(int):
            print("  " + "".join(str(v) for v in row))


def run_gradio(args):
    import gradio as gr
    engine = build_engine(args.ckpt, args.vocab)

    def infer(image, text, hidx):
        image = Image.fromarray(image)
        filled, _ = engine.mlm_fill(image, text)
        token = ""
        if hidx and int(hidx) > 0:
            heat, token = engine.wpa_heatmap(image, filled, int(hidx))
            w, h = image.size
            overlay = Image.fromarray(
                np.uint8(heat * 255), "L").resize((w, h), Image.NEAREST)
            image = image.copy()
            image.putalpha(overlay)
        return np.array(image), filled, token

    gr.Interface(
        fn=infer,
        inputs=[gr.Image(), gr.Textbox(label="masked text"),
                gr.Number(value=0, label="token index for heatmap")],
        outputs=[gr.Image(), gr.Textbox(label="filled"),
                 gr.Textbox(label="selected token")],
    ).launch()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--image", default=None)
    ap.add_argument("--text", default="a photo of a [MASK]")
    ap.add_argument("--hidx", type=int, default=0)
    ap.add_argument("--web", action="store_true")
    args = ap.parse_args()
    if args.web:
        run_gradio(args)
    else:
        if not args.image:
            raise SystemExit("--image required in CLI mode")
        run_cli(args)


if __name__ == "__main__":
    main()
