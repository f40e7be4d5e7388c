"""CLI entry point (reference run.py + Sacred's `with` syntax).

Usage mirrors the reference exactly:
    rmcl with task_moco text_view=True image_view=True data_root=/data
    rmcl with task_finetune_vqa_randaug test_only=True load_path=ckpt
plus:
    rmcl configs                 # list named configs
    rmcl prepare nlvr2 --root R --out O   # arrow conversion (prepare_data.py)
    rmcl export vqa out.stablehlo with <cfg> load_path=...   # AOT artifact
    rmcl serve out.stablehlo input=reqs.jsonl with <cfg> load_path=...
"""

from __future__ import annotations

import ast
import sys
from typing import Any, Dict, List, Tuple

from rmcl_tpu.core.config import build_config, named_configs


# reference key spellings accepted verbatim (MIGRATION.md): the GPU
# wording maps onto the device-count/per-device fields 1:1
_KEY_ALIASES = {
    "per_gpu_batchsize": "per_device_batchsize",
    "num_gpus": "num_devices",
}


def parse_with(argv: List[str]) -> Tuple[List[str], Dict[str, Any]]:
    names: List[str] = []
    overrides: Dict[str, Any] = {}
    for tok in argv:
        if "=" in tok:
            k, v = tok.split("=", 1)
            k = _KEY_ALIASES.get(k, k)
            try:
                overrides[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                overrides[k] = v
        else:
            names.append(tok)
    return names, overrides


def _compute_setup() -> None:
    """Process setup for the compute subcommands (export/serve/train):
    raising the TPU scoped-vmem limit must precede the first libtpu
    touch, and the persistent compile cache is a global jax.config
    mutation (which also initializes the backend to check it is a
    TPU) — neither belongs at module import, nor in the data-only
    subcommands (configs/prepare/help), which must not grab the
    exclusive TPU device."""
    from rmcl_tpu.core.tpu_env import (
        ensure_compilation_cache, ensure_scoped_vmem_flag)
    ensure_scoped_vmem_flag()   # before first jax TPU touch (fused_train MLP)
    ensure_compilation_cache()  # restarts replay compiles from disk (TPU)


def main(argv: List[str] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    if argv[0] == "configs":
        for n in named_configs():
            print(n)
        return 0

    if argv[0] == "prepare":
        from rmcl_tpu.data.writers import WRITERS
        name = argv[1]
        kw = dict(a.split("=", 1) for a in argv[2:] if "=" in a)
        root = kw.get("--root") or kw.get("root")
        out = kw.get("--out") or kw.get("out")
        if name not in WRITERS or not root or not out:
            print(f"usage: rmcl prepare {{{'|'.join(WRITERS)}}} "
                  f"root=RAW_DIR out=ARROW_DIR")
            return 2
        WRITERS[name](root, out)
        return 0

    if argv[0] == "export":
        # rmcl export <task> <out.stablehlo> [batch_size=N] with <cfg> ...
        from rmcl_tpu.serve import TASKS, export_inference
        if len(argv) < 3 or argv[1] not in TASKS:
            print(f"usage: rmcl export {{{'|'.join(TASKS)}}} OUT "
                  f"[batch_size=N] with <named_config> load_path=...")
            return 2
        task, out = argv[1], argv[2]
        rest = argv[3:]
        bs = 1
        if rest and rest[0].startswith("batch_size="):
            bs = int(rest[0].split("=", 1)[1])
            rest = rest[1:]
        if rest and rest[0] == "with":
            rest = rest[1:]
        names, overrides = parse_with(rest)
        cfg = build_config(*names, **overrides)
        _compute_setup()
        import jax
        from rmcl_tpu.models.vilt import init_vilt
        from rmcl_tpu.train.loop import load_initial_params
        params, state = init_vilt(jax.random.PRNGKey(cfg.seed), cfg)
        params, _ = load_initial_params(cfg, params, state)
        blob = export_inference(cfg, params, task, bs, out_path=out)
        print(f"[rmcl] exported {task} (batch {bs}, "
              f"{cfg.image_dtype} wire) -> {out} ({len(blob)} bytes)")
        return 0

    if argv[0] == "serve":
        # rmcl serve <artifact> [input=F] [output=F] with <cfg> load_path=...
        # requests: one JSON per line, {"image": path, "text": str}
        from rmcl_tpu.serve import ArtifactSession, postprocess
        if len(argv) < 2:
            print("usage: rmcl serve ARTIFACT [input=FILE] [output=FILE] "
                  "with <named_config> load_path=...")
            return 2
        art = argv[1]
        rest, inp, outp = argv[2:], None, None
        while rest and "=" in rest[0] and \
                rest[0].split("=", 1)[0] in ("input", "output"):
            k, v = rest[0].split("=", 1)
            inp, outp = (v, outp) if k == "input" else (inp, v)
            rest = rest[1:]
        if rest and rest[0] == "with":
            rest = rest[1:]
        names, overrides = parse_with(rest)
        cfg = build_config(*names, **overrides)
        _compute_setup()
        import json

        import jax
        from PIL import Image

        from rmcl_tpu.data.tokenizer import get_tokenizer
        from rmcl_tpu.models.vilt import init_vilt
        from rmcl_tpu.train.loop import load_initial_params
        params, state = init_vilt(jax.random.PRNGKey(cfg.seed), cfg)
        params, _ = load_initial_params(cfg, params, state)
        tok = get_tokenizer(cfg.tokenizer)
        sess = ArtifactSession.open(art, params, tok)
        with (open(inp) if inp else sys.stdin) as fin:
            reqs = [json.loads(ln) for ln in fin if ln.strip()]
        if not reqs:
            print("[rmcl] no requests", file=sys.stderr)
            return 0
        task, B = sess.meta["task"], sess.meta["batch_size"]
        fout = open(outp, "w") if outp else sys.stdout
        served = 0
        # stream in artifact-batch chunks: bounds open image fds at B
        # (PIL holds the file until load) and keeps host memory flat
        for i in range(0, len(reqs), B):
            chunk = reqs[i:i + B]
            images = []
            for r in chunk:
                with Image.open(r["image"]) as im:
                    images.append(im.convert("RGB"))  # loads, frees fd
            texts = [r["text"] for r in chunk]
            out = sess.predict(images, texts)
            ids = None
            if task == "mlm":   # postprocess needs ids only for mlm
                ids = tok(texts, max_length=sess.meta["max_text_len"],
                          padding="max_length", truncation=True,
                          return_tensors="np")["input_ids"]
            for rec in postprocess(task, out, tokenizer=tok,
                                   text_ids=ids):
                fout.write(json.dumps(rec) + "\n")
                served += 1
        if outp:
            fout.close()
        print(f"[rmcl] served {served} {task} requests "
              f"(artifact batch {B})", file=sys.stderr)
        return 0

    if argv[0] == "with":
        argv = argv[1:]
    names, overrides = parse_with(argv)
    try:
        cfg = build_config(*names, **overrides)
    except (KeyError, TypeError) as e:
        print(f"error: {e}\n  named configs: rmcl configs\n"
              f"  overrides must be valid RMCLConfig fields", file=sys.stderr)
        return 2

    _compute_setup()
    import jax
    from rmcl_tpu.train.loop import Trainer

    if jax.process_count() > 1:
        jax.distributed.initialize()

    trainer = Trainer(cfg, workdir=cfg.log_dir)
    trainer.setup()
    print(f"[rmcl] exp={cfg.exp_name} tasks={[k for k, v in cfg.loss_names.items() if v >= 1]} "
          f"devices={jax.device_count()} max_steps={trainer.max_steps}")

    if cfg.test_only:
        metrics = trainer.validate(split="test")
        for k, v in sorted(metrics.items()):
            print(f"{k}: {v}")
    else:
        trainer.fit()
        metrics = trainer.validate(split="val")
        for k, v in sorted(metrics.items()):
            print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
