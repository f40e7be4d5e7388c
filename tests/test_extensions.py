"""Tests: standalone bidirectional MoCo (MoCo_RMCL equivalent), MPPD /
MPFR objectives, cross-entropy geometric greedy attack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.models.vilt import ViLTModel, init_vilt
from tests.conftest import make_fake_batch


def _cfg(losses, **kw):
    base = dict(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names(losses), max_image_len=-1,
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0)
    base.update(kw)
    return build_config(**base)


def test_standalone_moco_bidirectional():
    from rmcl_tpu.objectives.moco_standalone import (
        compute_standalone_moco, init_standalone_moco)

    cfg = _cfg({"moco": 1}, num_negative=8, momentum=0.99, temperature=0.07)
    model = ViLTModel(cfg)
    params, state = init_vilt(jax.random.PRNGKey(0), cfg)
    params, state = init_standalone_moco(jax.random.PRNGKey(1), cfg,
                                         params, state)
    assert "txt_img_queue" in state
    # queue columns are normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state["txt_img_queue"]), axis=0),
        1.0, atol=1e-5)

    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg, batch=2).items()}

    ret, new_params, new_state = jax.jit(
        lambda p, s, bb, r: compute_standalone_moco(
            model, p, s, bb, rng=r, temperature=0.07, momentum=0.99))(
        params, state, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(ret["standalone_moco_loss"]))
    assert np.isfinite(float(ret["moco_txt_loss"]))
    assert np.isfinite(float(ret["moco_img_loss"]))
    assert ret["logits_txt"].shape == (2, 1 + 8)
    # shared queue advanced by 2*B (text keys then image keys)
    assert int(new_state["txt_img_queue_ptr"]) == 4


def test_mppd_mpfr_objectives():
    from rmcl_tpu.objectives.pretrain import compute_mpfr, compute_mppd

    cfg = _cfg({"mppd": 1, "mpfr": 1})
    model = ViLTModel(cfg)
    params, _ = init_vilt(jax.random.PRNGKey(0), cfg)
    assert "mppd_score" in params and "mpfr_score" in params
    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg, batch=2).items()}

    ret = jax.jit(lambda p, bb, r: compute_mppd(model, p, bb, rng=r))(
        params, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(ret["mppd_loss"]))
    P = cfg.patch_size
    assert ret["mppd_logits"].shape[-1] == P * P * 3

    ret2 = jax.jit(lambda p, bb, r: compute_mpfr(model, p, bb, rng=r))(
        params, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(ret2["mpfr_loss"]))
    assert ret2["mpfr_logits"].shape[-1] == cfg.hidden_size


def test_mppd_targets_are_patch_pixels():
    from rmcl_tpu.objectives.pretrain import _gather_patch_targets

    img = np.zeros((1, 32, 32, 3), np.float32)
    img[0, :16, :16] = 1.0     # patch (0,0) all ones
    img[0, 16:, 16:] = 2.0     # patch (1,1) all twos
    pidx = jnp.asarray([[[0, 0], [1, 1], [0, 1], [1, 0]]])
    t = np.asarray(_gather_patch_targets(jnp.asarray(img), pidx, 16))
    assert t.shape == (1, 4, 16 * 16 * 3)
    np.testing.assert_allclose(t[0, 0], 1.0)
    np.testing.assert_allclose(t[0, 1], 2.0)
    np.testing.assert_allclose(t[0, 2], 0.0)


def test_ce_geometric_greedy_attack(tmp_path):
    from rmcl_tpu.attacks.greedy import GreedyAttackNlvr2CrossEntropy
    from rmcl_tpu.data.tokenizer import WordPieceTokenizer, make_tiny_vocab

    vocab = str(tmp_path / "v.txt")
    make_tiny_vocab(vocab, ["dog", "cat", "hound", "grass", "park",
                            "running", "sitting"])
    tok = WordPieceTokenizer(vocab)

    class Syn:
        def candidates(self, w):
            return {"dog": ["cat", "hound"], "cat": ["dog"]}.get(w, [w])

        def __contains__(self, w):
            return w in ("dog", "cat")

    cfg = _cfg({"nlvr2_attacked": 1}, vocab_size=tok.vocab_size,
               n_candidates=2, max_loops=2)
    model = ViLTModel(cfg)
    params, _ = init_vilt(jax.random.PRNGKey(0), cfg)

    atk = GreedyAttackNlvr2CrossEntropy(cfg, model, tok, Syn())
    ids, masks = tok.batch_encode(
        ["dog running grass", "cat sitting park"], cfg.max_text_len)
    b0 = make_fake_batch(cfg, batch=2)
    batch = {
        "text_ids": ids, "text_masks": masks,
        "text_labels": np.full_like(ids, -100),
        "image_0": b0["image"],
        "image_1": make_fake_batch(cfg, batch=2, seed=5)["image"],
        "answers": np.array([0, 1], np.int32),
    }
    out = atk.adv_attack_samples(params, batch,
                                 (jnp.asarray(batch["answers"]),))
    assert out["txt_input_ids"].shape == ids.shape
    assert 0.0 <= out["change_rate"] <= 1.0
    # substitutions restricted to the synonym table
    dec = [tok.decode(r) for r in out["txt_input_ids"]]
    for d in dec:
        assert all(w in ("dog", "cat", "hound", "running", "sitting",
                         "grass", "park") for w in d.split())

def test_native_imageproc_bit_parity_and_speed():
    """The C++ bicubic resize must be BIT-IDENTICAL to PIL's (Pillow
    fixed-point semantics) across up/down/mixed scaling, and the full
    native pixelbert path must equal the PIL+numpy path elementwise."""
    import time

    from PIL import Image
    from rmcl_tpu.data._native import load_imageproc
    from rmcl_tpu.data.transforms import (
        _native_pixelbert, fit_bucket, min_max_resize, to_normalized_array)

    lib = load_imageproc()
    if lib is None:
        import pytest
        pytest.skip("no C++ toolchain")

    r = np.random.RandomState(0)
    import ctypes

    def native_resize(arr, ow, oh):
        out = np.empty((oh, ow, 3), np.uint8)
        lib.ip_resize_bicubic_u8(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            arr.shape[0], arr.shape[1], 3, oh, ow,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out

    for (h, w), (oh, ow) in [((100, 150), (64, 96)), ((40, 60), (384, 576)),
                             ((233, 177), (96, 128)), ((500, 401), (32, 48)),
                             ((87, 93), (200, 50))]:
        arr = np.ascontiguousarray(r.randint(0, 256, (h, w, 3), np.uint8))
        pil = np.asarray(Image.fromarray(arr).resize((ow, oh),
                                                     Image.BICUBIC))
        np.testing.assert_array_equal(pil, native_resize(arr, ow, oh),
                                      err_msg=f"{h}x{w}->{oh}x{ow}")

    # full pipeline parity (resize chain + normalize), down + up cases
    for h, w in [(300, 500), (50, 70)]:
        img = Image.fromarray(r.randint(0, 256, (h, w, 3), np.uint8))
        size, longer, bucket = 64, int(1333 / 800 * 64), (64, 96)
        ref = min_max_resize(img, shorter=size, longer=longer)
        ref = fit_bucket(ref, bucket)
        ref = to_normalized_array(ref)
        fast = _native_pixelbert(lib, img, size, longer, bucket)
        np.testing.assert_array_equal(ref, fast)

    # speed: native fused path vs PIL+numpy on a realistic decode size
    img = Image.fromarray(r.randint(0, 256, (480, 640, 3), np.uint8))
    size, longer, bucket = 384, int(1333 / 800 * 384), (384, 576)
    t0 = time.perf_counter()
    for _ in range(10):
        ref = min_max_resize(img, shorter=size, longer=longer)
        ref = fit_bucket(ref, bucket)
        _ = to_normalized_array(ref)
    t_pil = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        _ = _native_pixelbert(lib, img, size, longer, bucket)
    t_nat = time.perf_counter() - t0
    print(f"pixelbert 480x640->384-bucket: PIL {t_pil*100:.1f} ms/img, "
          f"native {t_nat*100:.1f} ms/img")


def test_image_to_patch_rows_matches_numpy():
    """C++ patch-row scatter (ip_image_to_patch_rows) is bit-exact vs
    the numpy canvas+transpose reference, including clipping an
    oversize image and zero-padding partial-patch edges."""
    import numpy as np
    from rmcl_tpu.data.arrow_dataset import (
        _images_to_patch_rows, hwc_to_patch_rows)
    from rmcl_tpu.data import _native

    if _native.load_imageproc() is None:
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.RandomState(0)
    B, H, W, P = 5, 96, 128, 32
    imgs = [rng.randn(96, 112, 3).astype(np.float32),
            rng.randn(100, 160, 3).astype(np.float32),   # oversize: clip
            rng.randn(33, 47, 3).astype(np.float32),     # partial patches
            rng.randn(96, 128, 3).astype(np.float32),    # exact fit
            rng.randn(1, 1, 3).astype(np.float32)]       # degenerate
    canvas = np.zeros((B, H, W, 3), np.float32)
    for bi, im in enumerate(imgs):
        h, w = im.shape[:2]
        canvas[bi, :min(h, H), :min(w, W)] = im[:H, :W]
    ref = hwc_to_patch_rows(canvas, P)
    got = _images_to_patch_rows(imgs, H, W, P)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)
