"""u8 image wire format (PARITY #26): host ships raw resized uint8 +
(h, w) metadata; the device normalizes at program entry.  Every test
asserts BIT-equality against the f32 pipeline — same (x/255-0.5)/0.5
f32 op order, padding forced to exactly 0.0 from the metadata rect."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.data.transforms import pixelbert_transform
from rmcl_tpu.models.vit import normalize_image_inputs


def _pil(seed, size=(120, 90)):
    return Image.fromarray(np.random.RandomState(seed).randint(
        0, 255, (size[1], size[0], 3), np.uint8))


def test_transform_u8_matches_f32_bitwise():
    bucket = (96, 128)
    tr_f32 = pixelbert_transform(64, bucket, out_dtype="float32")
    tr_u8 = pixelbert_transform(64, bucket, out_dtype="uint8")
    for seed in range(3):
        img = _pil(seed)
        a32 = tr_f32(img)
        a8 = tr_u8(img)
        assert a8.dtype == np.uint8 and a32.dtype == np.float32
        assert a8.shape == a32.shape
        norm = ((a8.astype(np.float32) / 255.0) - 0.5) / 0.5
        assert np.array_equal(norm, a32)


@pytest.mark.parametrize("layout", ["patch", "hwc"])
def test_normalize_image_inputs_bitwise(layout):
    """collate(u8) + device normalize == collate(f32), bit for bit —
    incl. the zero-padding region the metadata rect must reproduce."""
    from rmcl_tpu.data.arrow_dataset import collate

    rng = np.random.RandomState(0)
    H, W, P = 96, 128, 32
    # (33, 47): partial edge patches — the per-pixel metadata mask must
    # keep exactly the pixels the f32 canvas keeps inside them
    sizes = [(96, 96), (64, 128), (32, 32), (33, 47)]
    imgs_u8 = [rng.randint(0, 255, (h, w, 3), np.uint8) for h, w in sizes]
    imgs_f32 = [((u.astype(np.float32) / 255.0) - 0.5) / 0.5
                for u in imgs_u8]

    def batchify(imgs):
        items = [{"image": [im]} for im in imgs]
        return collate(items, None, bucket_hw=(H, W),
                       image_layout=layout, patch_size=P)

    b8 = batchify(imgs_u8)
    b32 = batchify(imgs_f32)
    assert b8["image"].dtype == np.uint8
    assert "image_hw" in b8 and "image_hw" not in b32
    assert np.array_equal(b8["image_hw"], np.asarray(sizes, np.int32))

    out = normalize_image_inputs(
        {k: jnp.asarray(v) for k, v in b8.items() if k != "text"},
        grid_hw=(H // P, W // P), patch_size=P)
    assert np.array_equal(np.asarray(out["image"]), b32["image"])


def _tiny_moco():
    return build_config(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names({"moco": 1}),
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0,
        max_steps=100, warmup_steps=0, num_negative=16, momentum=0.99,
        temperature=0.07, image_view=True, text_view=True,
        adv_steps_img=2, adv_lr_img=0.05, adv_max_norm_img=0.005)


def test_full_moco_step_u8_matches_f32():
    """The flagship RMCL step (EMA + PGD + attacked views + queue) is
    IDENTICAL under both wire formats."""
    from rmcl_tpu.train.step import create_train_state, make_train_step
    from tests.conftest import make_fake_batch

    cfg = _tiny_moco()
    b = make_fake_batch(cfg, batch=4)
    batch32 = {k: jnp.asarray(v) for k, v in b.items()}
    batch32["attacked_text_ids"] = jnp.roll(batch32["text_ids"], 1, axis=1)
    batch32["attacked_text_masks"] = batch32["text_masks"]

    # rebuild the image in u8 wire format: quantize the f32 fake batch
    # to a valid u8 source, then regenerate BOTH batches from it so the
    # two pipelines see the same pixels.  (B, N, P*P*3) patch rows; the
    # fake batch has no padding -> hw = full bucket.
    P = cfg.patch_size
    gh, gw = cfg.grid_hw
    rows32 = np.asarray(batch32["image"])
    u8 = np.clip((rows32 * 0.5 + 0.5) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    rows32_q = ((u8.astype(np.float32) / 255.0) - 0.5) / 0.5
    batch32 = dict(batch32, image=jnp.asarray(rows32_q))
    batch8 = dict(batch32, image=jnp.asarray(u8),
                  image_hw=jnp.asarray(
                      [[gh * P, gw * P]] * u8.shape[0], jnp.int32))

    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, donate=False)

    ts32, m32 = step_fn(ts, batch32, jax.random.PRNGKey(1))
    _, ts8, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    ts8, m8 = step_fn(ts8, batch8, jax.random.PRNGKey(1))

    # The INPUT tensors are bit-equal (asserted elsewhere); at step
    # level the u8 program fuses the entry normalize into the graph and
    # XLA's re-tiling can reorder fp reductions, so compare at float
    # noise level, not bitwise.
    np.testing.assert_allclose(np.asarray(m32["moco_loss"]),
                               np.asarray(m8["moco_loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m32["attacked_img_loss"]),
                               np.asarray(m8["attacked_img_loss"]),
                               rtol=1e-6)
    q32 = np.asarray(ts32.params["moco_head"]["projector"]["0"]["kernel"])
    q8 = np.asarray(ts8.params["moco_head"]["projector"]["0"]["kernel"])
    np.testing.assert_allclose(q32, q8, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ts32.state["proj_queue"]),
                               np.asarray(ts8.state["proj_queue"]),
                               atol=2e-6)


def test_padding_region_exact_zero():
    """u8 padding (0) must normalize to exactly 0.0 (the f32 canvas
    value), NOT -1 — otherwise the pixel-derived validity masks break."""
    H, W, P = 64, 64, 32
    u8 = np.zeros((1, (H // P) * (W // P), P * P * 3), np.uint8)
    u8[0, 0] = 128                      # one valid patch
    out = normalize_image_inputs(
        {"image": jnp.asarray(u8),
         "image_hw": jnp.asarray([[P, P]], jnp.int32)},
        grid_hw=(H // P, W // P), patch_size=P)
    a = np.asarray(out["image"])
    assert a[0, 1:].max() == 0.0 and a[0, 1:].min() == 0.0
    assert abs(a[0, 0, 0] - ((128 / 255.0 - 0.5) / 0.5)) < 1e-7


def test_nlvr2_u8_two_image_step_8dev():
    """u8 wire format through the two-image NLVR2 attacked step on an
    8-device DP mesh: image_0/image_1 (+ their _hw metadata) normalize
    independently, and the (B, 2) hw keys shard over the data axis."""
    from rmcl_tpu.parallel import make_mesh, shard_batch
    from rmcl_tpu.train.step import create_train_state, make_train_step
    from tests.conftest import make_fake_batch

    assert jax.device_count() >= 8
    cfg = build_config(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names({"nlvr2_attacked": 1}),
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0,
        max_steps=100, warmup_steps=0, image_view=True,
        adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
        attack_idx=(True, False))
    mesh = make_mesh(jax.devices()[:8])
    P = cfg.patch_size
    gh, gw = cfg.grid_hw

    def to_u8(rows):
        rows = np.asarray(rows)
        u8 = np.clip((rows * 0.5 + 0.5) * 255.0 + 0.5,
                     0, 255).astype(np.uint8)
        q = ((u8.astype(np.float32) / 255.0) - 0.5) / 0.5
        return u8, q

    b = make_fake_batch(cfg, batch=8, valid_hw=(gh * P, gw * P))
    base = {k: jnp.asarray(v) for k, v in b.items()}
    img1 = make_fake_batch(cfg, batch=8, seed=3,
                           valid_hw=(gh * P, gw * P))["image"]
    u80, q0 = to_u8(base.pop("image"))
    u81, q1 = to_u8(img1)
    hw = np.asarray([[gh * P, gw * P]] * 8, np.int32)
    base["answers"] = jnp.asarray(np.arange(8) % 2, jnp.int32)

    def run(image_0, image_1, extra):
        model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
        step_fn = make_train_step(cfg, model, tx, mesh=mesh, donate=False)
        batch = dict(base, image_0=jnp.asarray(image_0),
                     image_1=jnp.asarray(image_1), **extra)
        batch = shard_batch(batch, mesh)
        _, m = step_fn(ts, batch, jax.random.PRNGKey(1))
        return m

    m32 = run(q0, q1, {})
    m8 = run(u80, u81, {"image_0_hw": jnp.asarray(hw),
                        "image_1_hw": jnp.asarray(hw)})
    np.testing.assert_allclose(
        np.asarray(m32["nlvr2_original_loss"]),
        np.asarray(m8["nlvr2_original_loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m32["nlvr2_attacked_loss"]),
        np.asarray(m8["nlvr2_attacked_loss"]), rtol=1e-5)
