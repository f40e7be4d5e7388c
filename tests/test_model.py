"""Model-layer tests: shapes, masking semantics, parity vs torch ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.models import layers as L
from rmcl_tpu.models.text_embeddings import init_text_embeddings, text_embeddings
from rmcl_tpu.models.vilt import ViLTModel, infer, init_vilt
from rmcl_tpu.models.vit import (
    ViTSpec, _bilinear_weights, init_vit, resample_pos_embed, visual_embed,
)
from tests.conftest import make_fake_batch


def test_linear_matches_torch(rng):
    import torch

    p = L.linear_init(rng, 8, 16)
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    y = L.linear(p, jnp.asarray(x))
    ty = torch.nn.functional.linear(
        torch.tensor(x), torch.tensor(np.array(p["kernel"]).T),
        torch.tensor(np.array(p["bias"])))
    np.testing.assert_allclose(np.array(y), ty.numpy(), atol=1e-5)


def test_layernorm_matches_torch(rng):
    import torch

    dim = 16
    p = L.layer_norm_init(dim)
    p = {"weight": p["weight"] * 1.3 + 0.1, "bias": p["bias"] + 0.05}
    x = np.random.RandomState(1).randn(4, dim).astype(np.float32)
    y = L.layer_norm(p, jnp.asarray(x), eps=1e-6)
    ty = torch.nn.functional.layer_norm(
        torch.tensor(x), (dim,), torch.tensor(np.array(p["weight"])),
        torch.tensor(np.array(p["bias"])), eps=1e-6)
    np.testing.assert_allclose(np.array(y), ty.numpy(), atol=1e-5)


def test_text_embeddings_matches_hf(rng):
    """Parity with HF BertEmbeddings (what the reference uses,
    vilt_module.py:26-38)."""
    import torch
    from transformers.models.bert.modeling_bert import BertConfig, BertEmbeddings

    vocab, hidden, maxpos = 50, 32, 12
    params = init_text_embeddings(rng, vocab, hidden, maxpos)
    bc = BertConfig(vocab_size=vocab, hidden_size=hidden,
                    max_position_embeddings=maxpos,
                    hidden_dropout_prob=0.0)
    te = BertEmbeddings(bc).eval()
    with torch.no_grad():
        te.word_embeddings.weight.copy_(
            torch.tensor(np.array(params["word_embeddings"]["weight"])))
        te.position_embeddings.weight.copy_(
            torch.tensor(np.array(params["position_embeddings"]["weight"])))
        te.token_type_embeddings.weight.copy_(
            torch.tensor(np.array(params["token_type_embeddings"]["weight"])))
        te.LayerNorm.weight.copy_(
            torch.tensor(np.array(params["LayerNorm"]["weight"])))
        te.LayerNorm.bias.copy_(
            torch.tensor(np.array(params["LayerNorm"]["bias"])))

    ids = np.random.RandomState(0).randint(0, vocab, (3, maxpos))
    ours = text_embeddings(params, jnp.asarray(ids))
    with torch.no_grad():
        theirs = te(torch.tensor(ids))
    np.testing.assert_allclose(np.array(ours), theirs.numpy(), atol=1e-5)


def test_bilinear_weights_match_torch_interpolate():
    """Pos-embed resample == F.interpolate(bilinear, align_corners=True)
    (reference vision_transformer.py:577-586)."""
    import torch

    S, C = 6, 8
    spatial = np.random.RandomState(2).randn(S, S, C).astype(np.float32)
    for h, w in [(3, 5), (6, 6), (1, 4), (9, 2)]:
        gh, gw = 10, 10
        ours = resample_pos_embed(jnp.asarray(spatial), jnp.int32(h),
                                  jnp.int32(w), gh, gw)
        t = torch.nn.functional.interpolate(
            torch.tensor(spatial).permute(2, 0, 1)[None],
            size=(h, w), mode="bilinear", align_corners=True,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(np.array(ours)[:h, :w], t, atol=1e-5)
        assert np.all(np.array(ours)[h:] == 0)
        assert np.all(np.array(ours)[:, w:] == 0)


def test_visual_embed_shapes_and_mask(tiny_cfg, rng):
    spec = ViTSpec(hidden_size=tiny_cfg.hidden_size, num_heads=tiny_cfg.num_heads,
                   num_layers=tiny_cfg.num_layers, patch_size=tiny_cfg.patch_size,
                   img_size=tiny_cfg.image_size, drop_rate=0.0, use_pallas=False)
    params = init_vit(rng, spec)
    batch = make_fake_batch(tiny_cfg, batch=3, valid_hw=(48, 64))
    x, m, (pidx, (gh, gw)), lab = visual_embed(
        params, jnp.asarray(batch["image"]), spec=spec,
        max_image_len=-1, dtype=jnp.float32)
    N = (64 // 16) * (96 // 16)
    assert x.shape == (3, N + 1, tiny_cfg.hidden_size)
    assert m.shape == (3, N + 1)
    # valid grid is (48/16, 64/16) = (3, 4) -> 12 valid + CLS
    assert int(m.sum()) == 3 * (12 + 1)
    assert lab is None
    assert pidx.shape == (3, N, 2)
    assert (gh, gw) == (4, 6)


def test_visual_embed_patch_selection(tiny_cfg, rng):
    """max_image_len truncation keeps valid patches first."""
    spec = ViTSpec(hidden_size=tiny_cfg.hidden_size, num_heads=tiny_cfg.num_heads,
                   num_layers=tiny_cfg.num_layers, patch_size=tiny_cfg.patch_size,
                   img_size=tiny_cfg.image_size, drop_rate=0.0, use_pallas=False)
    params = init_vit(rng, spec)
    batch = make_fake_batch(tiny_cfg, batch=2, valid_hw=(32, 32))  # 4 valid
    x, m, (pidx, _), _ = visual_embed(
        params, jnp.asarray(batch["image"]), spec=spec,
        max_image_len=6, dtype=jnp.float32)
    assert x.shape[1] == 7  # 6 + CLS
    assert int(m[0].sum()) == 5  # 4 valid + CLS
    # the 4 valid patches are the (2x2) top-left grid coords
    got = set(map(tuple, np.array(pidx[0][:4])))
    assert got == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_infer_end_to_end(tiny_cfg, rng):
    model = ViLTModel(tiny_cfg)
    params, state = model.init(rng)
    batch = {k: jnp.asarray(v) for k, v in make_fake_batch(tiny_cfg).items()}
    out = jax.jit(lambda p, b: model.infer(p, b))(params, batch)
    B, T = 2, tiny_cfg.max_text_len
    N = tiny_cfg.num_patches
    assert out["text_feats"].shape == (B, T, tiny_cfg.hidden_size)
    assert out["image_feats"].shape == (B, N + 1, tiny_cfg.hidden_size)
    assert out["cls_feats"].shape == (B, tiny_cfg.hidden_size)
    assert np.all(np.isfinite(np.array(out["cls_feats"])))


def test_infer_mask_invariance(tiny_cfg, rng):
    """Padded image patches must not influence cls feats: growing the
    canvas (more pad) leaves outputs unchanged."""
    model = ViLTModel(tiny_cfg)
    params, _ = model.init(rng)
    b1 = make_fake_batch(tiny_cfg, batch=1, valid_hw=(48, 64))
    out1 = model.infer(params, {k: jnp.asarray(v) for k, v in b1.items()})

    big = tiny_cfg.replace(image_bucket_hw=(64, 128))
    img2 = np.zeros((1, 64, 128, 3), np.float32)
    img2[:, :64, :96] = b1["image"]
    b2 = dict(b1, image=img2)
    model2 = ViLTModel(big)
    out2 = model2.infer(params, {k: jnp.asarray(v) for k, v in b2.items()})
    np.testing.assert_allclose(np.array(out1["cls_feats"]),
                               np.array(out2["cls_feats"]), atol=1e-4)


def test_attention_mask_blocks_padded_text(tiny_cfg, rng):
    """Changing token ids at masked text positions must not change outputs."""
    model = ViLTModel(tiny_cfg)
    params, _ = model.init(rng)
    b = make_fake_batch(tiny_cfg, batch=1)
    out1 = model.infer(params, {k: jnp.asarray(v) for k, v in b.items()})
    b2 = dict(b)
    ids = b2["text_ids"].copy()
    ids[0, -1] = 77  # masked position
    b2["text_ids"] = ids
    out2 = model.infer(params, {k: jnp.asarray(v) for k, v in b2.items()})
    np.testing.assert_allclose(np.array(out1["cls_feats"]),
                               np.array(out2["cls_feats"]), atol=1e-5)


def test_moco_twins_initialised_equal(rng):
    cfg = build_config(
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 32), max_text_len=8,
        vocab_size=64, loss_names=loss_names({"moco": 1}), num_negative=16,
        use_pallas_attention=False, compute_dtype="float32")
    params, state = init_vilt(rng, cfg)
    for k in ("text_embeddings", "transformer", "moco_head",
              "token_type_embeddings"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.array(a), np.array(b)),
            params[k], params["k_" + k])
    assert state["proj_queue"].shape == (128, 16)
    assert int(state["proj_queue_ptr"]) == 0


def test_nlvr2_token_type_rows(rng):
    cfg = build_config("task_finetune_nlvr2",
                       hidden_size=32, num_heads=2, num_layers=1,
                       patch_size=16, image_size=32, image_bucket_hw=(32, 32),
                       max_text_len=8, vocab_size=64,
                       use_pallas_attention=False, compute_dtype="float32")
    params, _ = init_vilt(jax.random.PRNGKey(3), cfg)
    w = np.array(params["token_type_embeddings"]["weight"])
    assert w.shape[0] == 3
    np.testing.assert_array_equal(w[2], w[1])


def test_patchify_matches_torch_conv(rng):
    """Reshape-matmul patchify == stride-P conv2d (reference PatchEmbed)."""
    import torch

    P, C = 8, 12
    kernel = np.random.RandomState(0).randn(P * P * 3, C).astype(np.float32)
    bias = np.random.RandomState(1).randn(C).astype(np.float32)
    img = np.random.RandomState(2).randn(2, 24, 16, 3).astype(np.float32)

    from rmcl_tpu.models.vit import patchify
    ours = patchify({"proj": {"kernel": jnp.asarray(kernel),
                              "bias": jnp.asarray(bias)}},
                    jnp.asarray(img), dtype=jnp.float32)

    # torch conv weight (C_out, C_in, kh, kw); our flat order is (ph, pw, ch)
    w = kernel.reshape(P, P, 3, C).transpose(3, 2, 0, 1)
    conv = torch.nn.functional.conv2d(
        torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(w),
        torch.tensor(bias), stride=P)
    theirs = conv.flatten(2).transpose(1, 2).numpy()  # (B, N, C)
    np.testing.assert_allclose(np.array(ours), theirs, atol=1e-4)


def test_patch_row_layout_matches_hwc(tiny_cfg, rng):
    """The TPU-native patch-row image layout must produce IDENTICAL
    features to the pixel canvas (it's a pure host relayout)."""
    from rmcl_tpu.data.arrow_dataset import hwc_to_patch_rows
    from tests.conftest import make_fake_batch

    cfg = tiny_cfg
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    b = make_fake_batch(cfg, batch=2)
    batch_hwc = {k: jnp.asarray(v) for k, v in b.items()}
    rows = hwc_to_patch_rows(b["image"], cfg.patch_size)
    assert rows.shape == (2, cfg.num_patches, cfg.patch_size ** 2 * 3)
    batch_rows = dict(batch_hwc, image=jnp.asarray(rows))

    o1 = model.infer(params, batch_hwc, deterministic=True)
    o2 = model.infer(params, batch_rows, deterministic=True)
    np.testing.assert_allclose(np.asarray(o1["cls_feats"]),
                               np.asarray(o2["cls_feats"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1["image_feats"]),
                               np.asarray(o2["image_feats"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o1["image_masks"]),
                                  np.asarray(o2["image_masks"]))

    # MPP labels identical across layouts too
    from rmcl_tpu.models.vit import visual_embed
    _, _, _, lab1 = visual_embed(
        params["transformer"], batch_hwc["image"], spec=model.spec,
        max_image_len=-1, mask_it=True, rng=jax.random.PRNGKey(3),
        deterministic=True, dtype=jnp.float32)
    _, _, _, lab2 = visual_embed(
        params["transformer"], batch_rows["image"], spec=model.spec,
        max_image_len=-1, mask_it=True, rng=jax.random.PRNGKey(3),
        deterministic=True, dtype=jnp.float32, grid_hw=cfg.grid_hw)
    np.testing.assert_array_equal(np.asarray(lab1), np.asarray(lab2))


# ----------------------------------------------- impl/remat derivations
def test_spec_derivations_mesh_routing():
    """make_spec derivation matrix (models/vilt.py): kernels + shard
    mesh on pure-DP meshes, XLA + remat elsewhere.  On CPU the impls
    derive "" (kernels are TPU-only), so explicit impls probe the
    mesh-routing and remat logic."""
    from rmcl_tpu.core.config import build_config
    from rmcl_tpu.models.vilt import _derive_remat, make_spec
    from rmcl_tpu.parallel.mesh import make_mesh

    cfg = build_config("task_moco")
    # CPU: no kernels derived, no shard mesh, remat derived off
    spec = make_spec(cfg)
    assert spec.attn_impl == "" and spec.mlp_impl == ""
    assert spec.shard_mesh is None and spec.remat is False

    # explicit fused impls + pure-DP mesh -> shard_mesh set
    mesh = make_mesh()
    cfg_f = cfg.replace(attention_impl="fused", mlp_impl="fused")
    spec_f = make_spec(cfg_f, mesh)
    assert spec_f.shard_mesh is mesh

    # model-axis mesh (tensor parallel): kernels must NOT shard-wrap
    tp = make_mesh(shape=(4, 2), axis_names=("data", "model"))
    assert make_spec(cfg_f, tp).shard_mesh is None

    # explicit remat_blocks always wins over derivation
    assert make_spec(cfg.replace(remat_blocks=True)).remat is True
    # fully-fused single-chip derivation turns remat off; any other
    # combination keeps it on-TPU (exercise the pure function directly)
    assert _derive_remat(cfg, "fused", "fused_train") in (False,)
