"""CLI entry tests (reference run.py + Sacred `with` syntax, C1).

Covers the argv surface end-to-end: named-config listing, override
parsing, error exits, and a full `rmcl with ... fast_dev_run=True`
train+validate through main() on synthetic arrow data.
"""

import io
import os

import numpy as np
import pyarrow as pa
import pytest
from PIL import Image

from rmcl_tpu.cli.run import main, parse_with


def test_parse_with_literals_and_strings():
    names, ov = parse_with(
        ["task_moco", "step25k", "text_view=True", "batch_size=8",
         "adv_lr_img=0.05", "load_path=weights/x.ckpt",
         "image_bucket_hw=(64,96)", "datasets=('coco',)"])
    assert names == ["task_moco", "step25k"]
    assert ov["text_view"] is True
    assert ov["batch_size"] == 8
    assert ov["adv_lr_img"] == 0.05
    assert ov["load_path"] == "weights/x.ckpt"       # non-literal -> str
    assert ov["image_bucket_hw"] == (64, 96)
    assert ov["datasets"] == ("coco",)


def test_parse_with_reference_key_aliases():
    """A reference TRAIN.md command line works verbatim (MIGRATION.md):
    num_gpus/per_gpu_batchsize map onto the device-count fields."""
    from rmcl_tpu.core.config import build_config
    names, ov = parse_with(
        ["task_moco", "num_gpus=8", "per_gpu_batchsize=64"])
    assert ov == {"num_devices": 8, "per_device_batchsize": 64}
    cfg = build_config(*names, **ov)
    assert cfg.num_devices == 8 and cfg.per_device_batchsize == 64


def test_configs_listing(capsys):
    assert main(["configs"]) == 0
    out = capsys.readouterr().out
    for name in ("task_moco", "task_barlowtwins", "task_mlm_itm",
                 "task_finetune_vqa_randaug", "step200k"):
        assert name in out


def test_unknown_config_exits_2(capsys):
    assert main(["with", "task_does_not_exist"]) == 2
    assert "named configs" in capsys.readouterr().err


def test_bad_override_exits_2():
    assert main(["with", "task_mlm_itm", "not_a_field=3"]) == 2


def test_prepare_usage_exits_2(capsys):
    assert main(["prepare", "nope"]) == 2
    assert "usage" in capsys.readouterr().out


def _write_caption_arrow(d, n=8):
    def png(seed):
        img = Image.fromarray(np.random.RandomState(seed).randint(
            0, 255, (40, 48, 3), np.uint8))
        b = io.BytesIO()
        img.save(b, format="PNG")
        return b.getvalue()

    rows = {
        "image": [png(i) for i in range(n)],
        "caption": [["a dog running in the park"] for _ in range(n)],
        "image_id": [f"{i}.jpg" for i in range(n)],
        "split": ["train"] * n,
    }
    t = pa.table(rows)
    for name in ("coco_caption_karpathy_train", "coco_caption_karpathy_val",
                 "coco_caption_karpathy_test"):
        with pa.OSFile(os.path.join(d, f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, t.schema) as w:
                w.write_table(t)


def test_cli_fast_dev_run_end_to_end(tmp_path, capsys):
    """`rmcl with task_mlm_itm <tiny overrides> fast_dev_run=True`
    through main(): builds the datamodule from arrow, trains, validates,
    prints metrics, exits 0."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow))
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    rc = main([
        "with", "task_mlm_itm",
        f"data_root={arrow}", "datasets=('coco',)",
        f"tokenizer={vocab}",
        "hidden_size=32", "num_heads=2", "num_layers=1", "patch_size=16",
        "image_size=32", "image_bucket_hw=(32,48)", "max_text_len=12",
        "vocab_size=64", "use_pallas_attention=False",
        "compute_dtype='float32'", "drop_rate=0.0", "max_steps=2",
        "warmup_steps=0", "batch_size=4", "draw_false_image=1",
        "num_workers=2", "fast_dev_run=True", "max_image_len=-1",
        f"log_dir={tmp_path / 'out'}",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[rmcl] exp=" in out
    assert "mlm" in out and "itm" in out
    assert "the_metric" in out or "val" in out.lower()


def test_compile_cache_never_enabled_on_cpu(tmp_path, monkeypatch):
    """The persistent compilation cache is TPU-only: this jaxlib's CPU
    backend aborts the process deserializing the big one-program
    executable (write run green, warm re-run fatal), so on CPU
    ensure_compilation_cache() must leave jax.config untouched even
    with an explicit cache dir requested."""
    import jax

    from rmcl_tpu.core.tpu_env import ensure_compilation_cache

    monkeypatch.setenv("RMCL_COMPILE_CACHE", str(tmp_path / "xla"))
    before = jax.config.jax_compilation_cache_dir
    ensure_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before
    assert not (tmp_path / "xla").exists()


def test_text_bucket_flag_family():
    """VERDICT r4 #5: the three text-bucket consumers (attack internals,
    recall ranking, train-batch slicing) each have their own flag; the
    pre-round-5 `greedy_text_bucket` name survives as the umbrella
    default every unset per-consumer flag inherits."""
    from rmcl_tpu.core.buckets import bucket_enabled
    from rmcl_tpu.core.config import build_config

    cfg = build_config("task_moco")
    assert all(bucket_enabled(cfg, w) for w in ("attack", "eval", "train"))

    # deprecated umbrella alias still controls all three
    cfg = build_config("task_moco", greedy_text_bucket=False)
    assert not any(bucket_enabled(cfg, w)
                   for w in ("attack", "eval", "train"))

    # per-consumer flags override the umbrella independently
    cfg = build_config("task_moco", greedy_text_bucket=False,
                       eval_text_bucket=True)
    assert bucket_enabled(cfg, "eval")
    assert not bucket_enabled(cfg, "attack")
    assert not bucket_enabled(cfg, "train")

    cfg = build_config("task_moco", attack_text_bucket=False)
    assert not bucket_enabled(cfg, "attack")
    assert bucket_enabled(cfg, "eval") and bucket_enabled(cfg, "train")
