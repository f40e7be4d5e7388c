"""AOT serving exports (rmcl_tpu/serve.py): serialized StableHLO
inference artifacts that reproduce the live model's outputs with no
model code at load time."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.serve import (
    TASKS, build_infer_fn, export_inference, load_artifact)
from __graft_entry__ import _fake_batch


TASK_LOSS = {"mlm": {"mlm": 1}, "itm": {"itm": 1}, "rank": {"irtr": 1},
             "vqa": {"vqa": 1}, "embed": {"moco": 1}}


def _cfg(task="embed", **kw):
    base = dict(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names(TASK_LOSS[task]),
        use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=10, warmup_steps=0, vqav2_label_size=7)
    base.update(kw)
    return build_config(**base)


def _params(cfg):
    from rmcl_tpu.models.vilt import init_vilt
    params, _ = init_vilt(jax.random.PRNGKey(0), cfg)
    return params


@pytest.mark.parametrize("task,shape_of", [
    ("mlm", lambda cfg, B: (B, cfg.max_text_len, cfg.vocab_size)),
    ("itm", lambda cfg, B: (B, 2)),
    ("rank", lambda cfg, B: (B,)),
    ("vqa", lambda cfg, B: (B, cfg.vqav2_label_size)),
    ("embed", lambda cfg, B: (B, 128)),
])
def test_export_roundtrip_matches_live(task, shape_of, tmp_path):
    """serialize -> file -> deserialize reproduces the live jitted
    inference exactly, for every served task head."""
    cfg = _cfg(task, image_dtype="float32")
    params = _params(cfg)
    B = 2
    b = _fake_batch(cfg, B)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("image", "text_ids", "text_masks")}

    live = build_infer_fn(cfg, task)(params, batch)
    assert live.shape == shape_of(cfg, B)

    path = str(tmp_path / f"{task}.stablehlo")
    blob = export_inference(cfg, params, task, B, out_path=path)
    assert len(blob) > 0

    served = load_artifact(path)(params, batch)
    np.testing.assert_allclose(np.asarray(served), np.asarray(live),
                               rtol=1e-6, atol=1e-6)


def test_export_u8_wire_matches_f32_artifact():
    """A uint8-wire artifact normalizes in-graph and matches the
    f32-wire artifact fed the equivalent normalized pixels."""
    cfg8 = _cfg("embed", image_dtype="uint8")
    cfg32 = _cfg("embed", image_dtype="float32")
    params = _params(cfg8)
    B = 2

    b8 = _fake_batch(cfg8, B, image_dtype="uint8")
    keys = ("image", "text_ids", "text_masks", "image_hw")
    batch8 = {k: jnp.asarray(v) for k, v in b8.items() if k in keys}
    # equivalent f32 batch: normalize valid pixels, zero the padding
    u8 = np.asarray(b8["image"], np.float32)
    norm = ((u8 / 255.0) - 0.5) / 0.5
    gh, gw = cfg8.grid_hw
    P = cfg8.patch_size
    n = np.arange(norm.shape[1])
    e = np.arange(norm.shape[2])
    py = (n // gw)[:, None] * P + e[None, :] // (P * 3)
    px = (n % gw)[:, None] * P + (e[None, :] % (P * 3)) // 3
    hw = np.asarray(b8["image_hw"])
    valid = ((py[None] < hw[:, 0, None, None])
             & (px[None] < hw[:, 1, None, None]))
    batch32 = {k: v for k, v in batch8.items() if k != "image_hw"}
    batch32["image"] = jnp.asarray(np.where(valid, norm, 0.0))

    out8 = load_artifact(
        export_inference(cfg8, params, "embed", B))(params, batch8)
    out32 = load_artifact(
        export_inference(cfg32, params, "embed", B))(params, batch32)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out32),
                               rtol=1e-6, atol=1e-6)


def test_cli_export(tmp_path):
    """`rmcl export` writes a loadable artifact from a fresh init."""
    from rmcl_tpu.cli.run import main as cli_main

    out = str(tmp_path / "embed.stablehlo")
    rc = cli_main([
        "export", "embed", out, "batch_size=2", "with",
        "hidden_size=32", "num_heads=2", "num_layers=1", "patch_size=16",
        "image_size=32", "image_bucket_hw=(32,48)", "max_text_len=10",
        "vocab_size=64", "use_pallas_attention=False",
        "compute_dtype=float32", "drop_rate=0.0",
        "loss_names={'moco': 1}"])
    assert rc == 0
    import os
    assert os.path.getsize(out) > 0
    cfg = _cfg("embed", image_dtype="uint8",
               num_layers=1)             # CLI default wire format
    b = _fake_batch(cfg, 2, image_dtype="uint8")
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("image", "text_ids", "text_masks", "image_hw")}
    out_arr = load_artifact(out)(_params(cfg), batch)
    assert np.asarray(out_arr).shape == (2, 128)


def test_all_tasks_listed():
    assert set(TASKS) == {"mlm", "itm", "rank", "vqa", "embed"}
