"""Checkpoint-compat tests: state-dict round-trip and NUMERIC parity of
the full converted forward against a torch re-implementation of the
reference ViLT semantics (reference vilt/modules/vilt_module.py:275-351,
vision_transformer.py) on a full-valid image (no patch selection)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from rmcl_tpu.compat.torch_loader import (
    convert_state_dict, export_state_dict, graft_pretrain_heads,
    resize_pos_embed)
from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.models.vilt import ViLTModel, init_vilt


def _cfg(losses, **kw):
    base = dict(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=8,
        image_size=32, image_bucket_hw=(32, 32), max_text_len=8,
        vocab_size=50, loss_names=loss_names(losses), max_image_len=-1,
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0)
    base.update(kw)
    return build_config(**base)


# ----------------------------------------------------------- round-trip
def test_export_convert_roundtrip():
    cfg = _cfg({"moco": 1, "nlvr2": 1, "mlm": 1, "itm": 1,
                "barlowtwins": 1}, num_negative=8)
    params, state = init_vilt(jax.random.PRNGKey(0), cfg)
    sd = export_state_dict(params, state, cfg.num_layers)
    p2, s2 = convert_state_dict(sd, cfg)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(p2)[0])
    # mask_token is synthesized when absent; all real leaves must match
    for path, v1 in flat1:
        assert path in flat2, f"missing {path}"
        np.testing.assert_allclose(np.asarray(v1), np.asarray(flat2[path]),
                                   rtol=1e-6, err_msg=str(path))
    np.testing.assert_allclose(np.asarray(state["proj_queue"]),
                               np.asarray(s2["proj_queue"]), rtol=1e-6)


def test_resize_pos_embed():
    pos = np.random.RandomState(0).randn(1, 1 + 16, 8).astype(np.float32)
    out = resize_pos_embed(pos, 36)
    assert out.shape == (1, 37, 8)
    np.testing.assert_allclose(out[:, 0], pos[:, 0])  # cls untouched


# ------------------------------------------------- torch reference model
class TorchViLT(nn.Module):
    """Minimal faithful torch ViLT (reference semantics, full-valid image)."""

    def __init__(self, cfg):
        super().__init__()
        C, H = cfg.hidden_size, cfg.num_heads
        P = cfg.patch_size
        V, T = cfg.vocab_size, cfg.max_text_len
        grid = cfg.image_size // P

        class BertEmb(nn.Module):
            def __init__(self):
                super().__init__()
                self.word_embeddings = nn.Embedding(V, C)
                self.position_embeddings = nn.Embedding(T, C)
                self.token_type_embeddings = nn.Embedding(2, C)
                self.LayerNorm = nn.LayerNorm(C, eps=1e-12)

            def forward(self, ids):
                pos = torch.arange(ids.shape[1])[None]
                x = (self.word_embeddings(ids)
                     + self.position_embeddings(pos)
                     + self.token_type_embeddings(torch.zeros_like(ids)))
                return self.LayerNorm(x)

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = nn.LayerNorm(C, eps=1e-6)

                class Attn(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.qkv = nn.Linear(C, 3 * C)
                        self.proj = nn.Linear(C, C)

                    def forward(self, x):
                        B, S, _ = x.shape
                        qkv = self.qkv(x).reshape(B, S, 3, H, C // H)
                        qkv = qkv.permute(2, 0, 3, 1, 4)
                        q, k, v = qkv[0], qkv[1], qkv[2]
                        attn = (q @ k.transpose(-2, -1)) * (C // H) ** -0.5
                        attn = attn.softmax(dim=-1)
                        x = (attn @ v).transpose(1, 2).reshape(B, S, C)
                        return self.proj(x)

                self.attn = Attn()
                self.norm2 = nn.LayerNorm(C, eps=1e-6)

                class Mlp(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.fc1 = nn.Linear(C, C * cfg.mlp_ratio)
                        self.fc2 = nn.Linear(C * cfg.mlp_ratio, C)

                    def forward(self, x):
                        return self.fc2(nn.functional.gelu(self.fc1(x)))

                self.mlp = Mlp()

            def forward(self, x):
                x = x + self.attn(self.norm1(x))
                return x + self.mlp(self.norm2(x))

        class ViT(nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embed = nn.Module()
                self.patch_embed.proj = nn.Conv2d(3, C, P, stride=P)
                self.cls_token = nn.Parameter(torch.randn(1, 1, C) * 0.02)
                self.pos_embed = nn.Parameter(
                    torch.randn(1, grid * grid + 1, C) * 0.02)
                self.blocks = nn.ModuleList(
                    [Block() for _ in range(cfg.num_layers)])
                self.norm = nn.LayerNorm(C, eps=1e-6)

        class Pooler(nn.Module):
            def __init__(self):
                super().__init__()
                self.dense = nn.Linear(C, C)

            def forward(self, x):
                return torch.tanh(self.dense(x[:, 0]))

        self.text_embeddings = BertEmb()
        self.token_type_embeddings = nn.Embedding(2, C)
        self.transformer = ViT()
        self.pooler = Pooler()
        self.cfg = cfg

    def forward(self, ids, img):
        # full-valid image path of reference infer (vilt_module.py:275-351)
        t = self.transformer
        x = t.patch_embed.proj(img)                   # (B, C, gh, gw)
        B, C, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)              # (B, N, C)
        x = x + t.pos_embed[:, 1:]
        cls = t.cls_token.expand(B, -1, -1) + t.pos_embed[:, :1]
        image_embeds = torch.cat([cls, x], dim=1)

        text_embeds = self.text_embeddings(ids)
        text_embeds = text_embeds + self.token_type_embeddings(
            torch.zeros_like(ids))
        image_embeds = image_embeds + self.token_type_embeddings(
            torch.ones(B, image_embeds.shape[1], dtype=torch.long))

        co = torch.cat([text_embeds, image_embeds], dim=1)
        for blk in t.blocks:
            co = blk(co)
        co = t.norm(co)
        return co, self.pooler(co)


def test_converted_forward_matches_torch():
    torch.manual_seed(0)
    cfg = _cfg({"itm": 1})
    tm = TorchViLT(cfg).eval()

    # export torch -> reference-named state dict
    sd = {k: v for k, v in tm.state_dict().items()}
    params, _ = convert_state_dict(sd, cfg)
    # pooler may be missing? no: pooler in sd as pooler.dense.*
    model = ViLTModel(cfg)

    r = np.random.RandomState(0)
    img = r.uniform(0.1, 1.0, (2, 32, 32, 3)).astype(np.float32)
    ids = r.randint(1, cfg.vocab_size, (2, cfg.max_text_len)).astype(np.int32)
    masks = np.ones_like(ids)

    with torch.no_grad():
        feats_t, cls_t = tm(torch.tensor(ids, dtype=torch.long),
                            torch.tensor(img).permute(0, 3, 1, 2))

    batch = {"image": jnp.asarray(img), "text_ids": jnp.asarray(ids),
             "text_labels": jnp.full_like(jnp.asarray(ids), -100),
             "text_masks": jnp.asarray(masks)}
    out = model.infer(params, batch, deterministic=True)

    ours = np.concatenate([np.asarray(out["text_feats"]),
                           np.asarray(out["image_feats"])], axis=1)
    np.testing.assert_allclose(ours, feats_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["cls_feats"]),
                               cls_t.numpy(), atol=2e-4)


def test_graft_pretrain_heads():
    sd = {"mlm_score.bias": np.zeros(5), "itm_score.fc.weight": np.zeros((2, 4)),
          "itm_score.fc.bias": np.zeros(2)}
    pre = {
        "mlm_score.bias": np.ones(5),
        "mlm_score.transform.dense.weight": np.ones((4, 4)),
        "mlm_score.transform.dense.bias": np.ones(4),
        "mlm_score.transform.LayerNorm.weight": np.ones(4),
        "mlm_score.transform.LayerNorm.bias": np.ones(4),
        "mlm_score.decoder.weight": np.ones((5, 4)),
        "itm_score.fc.weight": np.ones((2, 4)),
        "itm_score.fc.bias": np.ones(2),
    }
    out = graft_pretrain_heads(sd, pre, loss_names({"mlm": 1, "itm": 1}))
    assert np.all(out["mlm_score.bias"] == 1)
    assert np.all(out["itm_score.fc.weight"] == 1)
    out2 = graft_pretrain_heads(sd, pre, loss_names({"vqa": 1}))
    assert np.all(out2["mlm_score.bias"] == 0)


def test_torch_ckpt_file_loading(tmp_path):
    """torch.save -> load_torch_checkpoint end-to-end."""
    from rmcl_tpu.compat.torch_loader import load_torch_checkpoint
    torch.manual_seed(1)
    cfg = _cfg({"itm": 1})
    tm = TorchViLT(cfg)
    path = str(tmp_path / "ckpt.ckpt")
    torch.save({"state_dict": tm.state_dict()}, path)
    params, state = load_torch_checkpoint(path, cfg)
    assert "transformer" in params and "pooler" in params
    k = np.asarray(params["transformer"]["blocks"]["attn"]["qkv"]["kernel"])
    assert k.shape == (cfg.num_layers, cfg.hidden_size, 3 * cfg.hidden_size)


def test_golden_harness_roundtrip(tmp_path):
    """save_golden from a torch forward -> compare_golden through the
    converted params must pass; corrupted goldens must fail."""
    from rmcl_tpu.compat.golden import compare_golden, load_golden, save_golden
    from rmcl_tpu.models.vilt import ViLTModel

    torch.manual_seed(3)
    cfg = _cfg({"itm": 1})
    tm = TorchViLT(cfg).eval()
    r = np.random.RandomState(1)
    img = r.uniform(0.1, 1.0, (2, 32, 32, 3)).astype(np.float32)
    ids = r.randint(1, cfg.vocab_size, (2, cfg.max_text_len)).astype(np.int32)
    masks = np.ones_like(ids)
    with torch.no_grad():
        feats, cls = tm(torch.tensor(ids, dtype=torch.long),
                        torch.tensor(img).permute(0, 3, 1, 2))
    T = cfg.max_text_len
    path = str(tmp_path / "golden.npz")
    save_golden(path,
                {"image": img, "text_ids": ids, "text_masks": masks},
                {"text_feats": feats[:, :T].numpy(),
                 "image_feats": feats[:, T:].numpy(),
                 "cls_feats": cls.numpy()},
                meta={"note": "test"})

    params, _ = convert_state_dict(dict(tm.state_dict()), cfg)
    model = ViLTModel(cfg)
    errs = compare_golden(path, model, params, atol=5e-4)
    assert max(errs.values()) < 5e-4

    # corrupt -> must raise
    b, g = load_golden(path)
    g["cls_feats"] = g["cls_feats"] + 1.0
    save_golden(path, b, g)
    with pytest.raises(AssertionError):
        compare_golden(path, model, params, atol=5e-4)


def test_load_timm_vit_linear_and_conv_patch_embed():
    from rmcl_tpu.compat.torch_loader import load_timm_vit

    cfg = _cfg({"itm": 1})
    C, P = cfg.hidden_size, cfg.patch_size
    grid = cfg.image_size // P
    sd = {}
    rng = np.random.RandomState(0)
    conv_w = rng.randn(C, 3, P, P).astype(np.float32)
    sd["patch_embed.proj.weight"] = conv_w
    sd["patch_embed.proj.bias"] = np.zeros(C, np.float32)
    sd["cls_token"] = rng.randn(1, 1, C).astype(np.float32)
    # timm ckpt from a DIFFERENT grid (e.g. 224/8=28 -> here 4): resize
    sd["pos_embed"] = rng.randn(1, 50, C).astype(np.float32)
    for i in range(cfg.num_layers):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(C, np.float32)
        sd[b + "norm1.bias"] = np.zeros(C, np.float32)
        sd[b + "attn.qkv.weight"] = rng.randn(3 * C, C).astype(np.float32)
        sd[b + "attn.qkv.bias"] = np.zeros(3 * C, np.float32)
        sd[b + "attn.proj.weight"] = rng.randn(C, C).astype(np.float32)
        sd[b + "attn.proj.bias"] = np.zeros(C, np.float32)
        sd[b + "norm2.weight"] = np.ones(C, np.float32)
        sd[b + "norm2.bias"] = np.zeros(C, np.float32)
        sd[b + "mlp.fc1.weight"] = rng.randn(4 * C, C).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = np.zeros(4 * C, np.float32)
        sd[b + "mlp.fc2.weight"] = rng.randn(C, 4 * C).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = np.zeros(C, np.float32)
    sd["norm.weight"] = np.ones(C, np.float32)
    sd["norm.bias"] = np.zeros(C, np.float32)

    conv = load_timm_vit(sd, cfg)
    assert conv["pos_embed"].shape == (1, grid * grid + 1, C)
    assert conv["patch_embed"]["proj"]["kernel"].shape == (P * P * 3, C)

    # linear-format patch embed gives identical kernel after adaptation
    sd2 = dict(sd)
    sd2["patch_embed.proj.weight"] = conv_w.reshape(C, 3 * P * P)
    conv2 = load_timm_vit(sd2, cfg)
    np.testing.assert_allclose(
        np.asarray(conv["patch_embed"]["proj"]["kernel"]),
        np.asarray(conv2["patch_embed"]["proj"]["kernel"]))


# ------------------------------------------- real published checkpoints
# Auto-skipping harness for the public ViLT weights (reference EVAL.md:
# vilt_200k_mlm_itm.ckpt etc.).  The environment this repo is built in
# has no datasets or checkpoints mounted; the moment the weights land in
# models_weight/ these tests light up without any code change.
_CKPT_CANDIDATES = [
    "models_weight/vilt_200k_mlm_itm.ckpt",
    "../models_weight/vilt_200k_mlm_itm.ckpt",
]
_REAL_CKPT = next((p for p in _CKPT_CANDIDATES if __import__("os").path.isfile(p)), None)


@pytest.mark.skipif(_REAL_CKPT is None,
                    reason="public ViLT checkpoint not mounted in this env")
def test_real_checkpoint_convert_and_forward():
    """Full-size conversion of the published vilt_200k_mlm_itm weights +
    a pinned-batch forward; runs the EVAL.md-style golden comparison when
    a reference-side dump (models_weight/golden_vilt_200k.npz, produced
    by scripts/make_golden_reference.py) is present."""
    import os
    from rmcl_tpu.compat.torch_loader import load_torch_checkpoint
    from rmcl_tpu.compat.golden import compare_golden

    cfg = build_config("task_mlm_itm", vit="vit32_base",
                       image_bucket_hw=(384, 384), max_image_len=-1,
                       use_pallas_attention=False, compute_dtype="float32",
                       drop_rate=0.0, image_layout="hwc")
    params, state = load_torch_checkpoint(_REAL_CKPT, cfg)
    model = ViLTModel(cfg)

    golden = os.path.join(os.path.dirname(_REAL_CKPT),
                          "golden_vilt_200k.npz")
    if os.path.isfile(golden):
        errs = compare_golden(golden, model, params, atol=5e-3)
        print("golden parity:", errs)
        return

    # no reference dump: assert the converted forward is finite and the
    # MLM head reproduces tokens of an unmasked caption (weak but real
    # signal that the layout conversion is correct end-to-end)
    rng = np.random.RandomState(0)
    img = rng.uniform(-1, 1, (1, 384, 384, 3)).astype(np.float32)
    ids = np.array([[101, 1037, 3899, 2003, 2652, 1999, 1996, 2380,
                     102, 0, 0, 0]], np.int32)  # "a dog is playing in the park"
    masks = (ids != 0).astype(np.int32)
    batch = {"image": jnp.asarray(img), "text_ids": jnp.asarray(ids),
             "text_masks": jnp.asarray(masks),
             "text_labels": jnp.full_like(jnp.asarray(ids), -100)}
    out = model.infer(params, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["cls_feats"])).all()
    from rmcl_tpu.models.heads import mlm_head
    logits = np.asarray(mlm_head(params["mlm_score"], out["text_feats"]))
    # an MLM head over unmasked text should mostly predict the input
    pred = logits[0].argmax(-1)
    agree = float((pred[1:8] == ids[0, 1:8]).mean())
    assert agree > 0.5, f"MLM self-reconstruction too low: {agree}"


# ------------------------------------- full reference-namespace harness
def _full_reference_sd(C=32, L=2, P=8, V=50, vqa=9, seed=0):
    """Synthetic torch-layout state_dict covering the COMPLETE reference
    namespace (SURVEY.md §5.4 / vilt_module.py:20-250): every task head,
    the k_* momentum twins, proj_queue/ptr buffers, conv-layout
    patch_embed, and the 2-row token-type table that NLVR2 configs must
    expand to 3 rows (vilt_module.py:201-206)."""
    rs = np.random.RandomState(seed)
    sd = {}

    def t(*s):
        return rs.randn(*s).astype(np.float32)

    def lin(name, out, inn, bias=True):
        sd[name + ".weight"] = t(out, inn)
        if bias:
            sd[name + ".bias"] = t(out)

    def ln(name, d):
        sd[name + ".weight"] = t(d)
        sd[name + ".bias"] = t(d)

    def bn(name, d, affine=True):
        sd[name + ".running_mean"] = t(d)
        sd[name + ".running_var"] = np.abs(t(d)) + 0.5
        if affine:
            ln(name, d)

    for pre in ("", "k_"):
        sd[f"{pre}text_embeddings.word_embeddings.weight"] = t(V, C)
        sd[f"{pre}text_embeddings.position_embeddings.weight"] = t(8, C)
        sd[f"{pre}text_embeddings.token_type_embeddings.weight"] = t(2, C)
        ln(f"{pre}text_embeddings.LayerNorm", C)
        sd[f"{pre}token_type_embeddings.weight"] = t(2, C)  # -> 3 rows
        tr = f"{pre}transformer"
        sd[f"{tr}.cls_token"] = t(1, 1, C)
        sd[f"{tr}.pos_embed"] = t(1, 1 + (32 // P) ** 2, C)
        sd[f"{tr}.mask_token"] = t(1, 1, C)
        sd[f"{tr}.patch_embed.proj.weight"] = t(C, 3, P, P)  # conv layout
        sd[f"{tr}.patch_embed.proj.bias"] = t(C)
        ln(f"{tr}.norm", C)
        for i in range(L):
            b = f"{tr}.blocks.{i}"
            ln(b + ".norm1", C)
            lin(b + ".attn.qkv", 3 * C, C)
            lin(b + ".attn.proj", C, C)
            ln(b + ".norm2", C)
            lin(b + ".mlp.fc1", 4 * C, C)
            lin(b + ".mlp.fc2", C, 4 * C)
        lin(f"{pre}moco_head.projector.0", C, C)
        ln(f"{pre}moco_head.projector.1", C)
        lin(f"{pre}moco_head.projector.3", 16, C, bias=False)

    lin("pooler.dense", C, C)
    lin("mlm_score.transform.dense", C, C)
    ln("mlm_score.transform.LayerNorm", C)
    sd["mlm_score.decoder.weight"] = t(V, C)
    sd["mlm_score.bias"] = t(V)
    lin("itm_score.fc", 2, C)
    lin("mpp_score.transform.dense", C, C)
    ln("mpp_score.transform.LayerNorm", C)
    lin("mpp_score.decoder", 256 * 3, C)
    lin("vqa_classifier.0", 2 * C, C)
    ln("vqa_classifier.1", 2 * C)
    lin("vqa_classifier.3", vqa, 2 * C)
    lin("nlvr2_classifier.0", 2 * C, 2 * C)
    ln("nlvr2_classifier.1", 2 * C)
    lin("nlvr2_classifier.3", 2, 2 * C)
    lin("rank_output", 1, C)
    lin("barlowtwins_head.projector.0", 64, C, bias=False)
    bn("barlowtwins_head.projector.1", 64)
    lin("barlowtwins_head.projector.3", 64, 64, bias=False)
    bn("barlowtwins_head.projector.4", 64)
    lin("barlowtwins_head.projector.6", 64, 64, bias=False)
    bn("barlowtwins_head.norm", 64, affine=False)
    sd["proj_queue"] = t(16, 8)
    sd["proj_queue_ptr"] = np.zeros(1, np.int64)
    return sd


def test_full_namespace_convert_structure_and_roundtrip():
    """The complete reference namespace converts to EXACTLY the pytree
    structure init_vilt builds for an all-task config, and
    convert -> export -> convert is byte-identical — so when the public
    vilt_*.ckpt files land, only numeric values (not plumbing) can
    differ (VERDICT r2 next #6)."""
    cfg = _cfg({"mlm": 1, "mpp": 1, "itm": 1, "vqa": 1, "nlvr2": 1,
                "irtr": 1, "moco": 1, "barlowtwins": 1},
               vqav2_label_size=9, num_negative=8)
    sd = _full_reference_sd()
    p1, s1 = convert_state_dict(sd, cfg)

    # structural identity with the fresh-init pytree (path sets; BT/moco
    # projector dims are synthetic-small, so shapes are checked by the
    # forward-parity tests instead)
    init_p, init_s = init_vilt(jax.random.PRNGKey(0), cfg)
    paths1 = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_flatten_with_path(p1)[0]}
    pathsi = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_flatten_with_path(init_p)[0]}
    # mppd/mpfr heads are rmcl-only completions (dormant in the
    # reference) — excluded from the reference namespace by construction
    pathsi = {p for p in pathsi
              if not p.startswith("['mppd_score']")
              and not p.startswith("['mpfr_score']")}
    assert paths1 == pathsi, (
        f"missing={sorted(pathsi - paths1)} extra={sorted(paths1 - pathsi)}")
    assert set(s1) == set(init_s) == {"proj_queue", "proj_queue_ptr"}
    # NLVR2 3-row expansion applied to BOTH prefixes
    assert np.asarray(p1["token_type_embeddings"]["weight"]).shape[0] == 3
    assert np.asarray(p1["k_token_type_embeddings"]["weight"]).shape[0] == 3

    # convert -> export -> convert byte-identity
    sd2 = export_state_dict(p1, s1, cfg.num_layers)
    p2, s2 = convert_state_dict(sd2, cfg)
    flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(p2)[0])
    for path, v1 in flat1:
        assert np.array_equal(np.asarray(v1), np.asarray(flat2[path])), path
    assert np.array_equal(np.asarray(s1["proj_queue"]),
                          np.asarray(s2["proj_queue"]))
    assert int(s1["proj_queue_ptr"]) == int(s2["proj_queue_ptr"])


def test_full_namespace_graft_byte_equality():
    """Head grafting over the full namespace: the grafted-and-converted
    MLM/ITM heads are byte-equal to the pretrain checkpoint's
    (vilt_module.py:134-160)."""
    cfg = _cfg({"mlm": 1, "mpp": 1, "itm": 1, "vqa": 1, "nlvr2": 1,
                "irtr": 1, "moco": 1, "barlowtwins": 1},
               vqav2_label_size=9, num_negative=8)
    sd = _full_reference_sd(seed=0)
    pre = _full_reference_sd(seed=1)
    grafted = graft_pretrain_heads(sd, pre, {"mlm": 1, "itm": 1})
    pg, _ = convert_state_dict(grafted, cfg)

    m = pg["mlm_score"]
    assert np.array_equal(np.asarray(m["transform"]["dense"]["kernel"]),
                          pre["mlm_score.transform.dense.weight"].T)
    assert np.array_equal(np.asarray(m["transform"]["dense"]["bias"]),
                          pre["mlm_score.transform.dense.bias"])
    assert np.array_equal(np.asarray(m["decoder"]["kernel"]),
                          pre["mlm_score.decoder.weight"].T)
    assert np.array_equal(np.asarray(m["bias"]), pre["mlm_score.bias"])
    assert np.array_equal(np.asarray(pg["itm_score"]["fc"]["kernel"]),
                          pre["itm_score.fc.weight"].T)
    assert np.array_equal(np.asarray(pg["itm_score"]["fc"]["bias"]),
                          pre["itm_score.fc.bias"])
    # non-grafted modules keep the base checkpoint's values
    assert np.array_equal(np.asarray(pg["pooler"]["dense"]["kernel"]),
                          sd["pooler.dense.weight"].T)


# ------------------------------------------------------- named ViT presets
def _synthetic_timm_sd(cfg, grid: int, rng):
    """Bare timm VisionTransformer state dict at cfg's geometry with a
    `grid`x`grid` pos-embed (timm naming, reference
    vision_transformer.py:926-1383 factories)."""
    C, P, M = cfg.hidden_size, cfg.patch_size, cfg.mlp_ratio
    sd = {
        "patch_embed.proj.weight":
            rng.randn(C, 3, P, P).astype(np.float32) * 0.05,
        "patch_embed.proj.bias": np.zeros(C, np.float32),
        "cls_token": rng.randn(1, 1, C).astype(np.float32) * 0.05,
        "pos_embed":
            rng.randn(1, grid * grid + 1, C).astype(np.float32) * 0.05,
        "norm.weight": np.ones(C, np.float32),
        "norm.bias": np.zeros(C, np.float32),
    }
    for i in range(cfg.num_layers):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(C, np.float32)
        sd[b + "norm1.bias"] = np.zeros(C, np.float32)
        sd[b + "attn.qkv.weight"] = (
            rng.randn(3 * C, C).astype(np.float32) * 0.05)
        sd[b + "attn.qkv.bias"] = np.zeros(3 * C, np.float32)
        sd[b + "attn.proj.weight"] = (
            rng.randn(C, C).astype(np.float32) * 0.05)
        sd[b + "attn.proj.bias"] = np.zeros(C, np.float32)
        sd[b + "norm2.weight"] = np.ones(C, np.float32)
        sd[b + "norm2.bias"] = np.zeros(C, np.float32)
        sd[b + "mlp.fc1.weight"] = (
            rng.randn(M * C, C).astype(np.float32) * 0.05)
        sd[b + "mlp.fc1.bias"] = np.zeros(M * C, np.float32)
        sd[b + "mlp.fc2.weight"] = (
            rng.randn(C, M * C).astype(np.float32) * 0.05)
        sd[b + "mlp.fc2.bias"] = np.zeros(C, np.float32)
    return sd


def test_vit_preset_table_geometry():
    """`build_config(vit=<name>)` fills in the registered timm geometry
    (reference vision_transformer.py:926-1383); explicit keys win."""
    from rmcl_tpu.core.config import VIT_PRESETS

    c = build_config(vit="vit_small_patch16_224")
    # reference :927-934 — the "custom small": depth 8, heads 8, mlp 3
    assert (c.patch_size, c.hidden_size, c.num_layers, c.num_heads,
            c.mlp_ratio) == (16, 768, 8, 8, 3)
    assert c.image_size == 224 and c.image_bucket_hw == (224, 352)
    assert c.image_bucket_hw[1] % c.patch_size == 0

    c = build_config(vit="vit_large_patch16_384")
    assert (c.hidden_size, c.num_layers, c.num_heads) == (1024, 24, 16)
    assert c.image_bucket_hw == (384, 608)

    # every preset's static canvas aligns with its patch grid
    for name, g in VIT_PRESETS.items():
        cc = build_config(vit=name)
        assert cc.image_bucket_hw[0] % cc.patch_size == 0, name
        assert cc.image_bucket_hw[1] % cc.patch_size == 0, name
        assert cc.hidden_size % cc.num_heads == 0, name

    # explicit geometry beats the preset (Sacred-style override order)
    c = build_config(vit="vit_base_patch16_224", num_layers=2)
    assert c.num_layers == 2 and c.patch_size == 16

    with pytest.raises(KeyError):
        build_config(vit="vit_enormous_patch7_999")


def test_vit_preset_trains_and_converts_timm_dict():
    """`vit="vit_small_patch16_224"` trains a step at the registered
    geometry and loads a synthetic timm state dict through
    load_timm_vit, including the pos-embed grid resize (reference
    vision_transformer.py:854-922)."""
    from rmcl_tpu.compat.torch_loader import load_timm_vit
    from rmcl_tpu.train.step import create_train_state, make_train_step
    from tests.conftest import make_fake_batch

    cfg = build_config(
        vit="vit_small_patch16_224", loss_names=loss_names({"mlm": 1}),
        max_text_len=8, vocab_size=64, max_image_len=16,
        use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=10, warmup_steps=0,
        # shrink the canvas (NOT the model) to keep the CPU step cheap;
        # the p16 patch grid and d8/h8/mlp3 geometry stay faithful
        image_bucket_hw=(96, 112))
    assert cfg.num_layers == 8 and cfg.mlp_ratio == 3
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    fc1 = ts.params["transformer"]["blocks"]["mlp"]["fc1"]["kernel"]
    assert fc1.shape == (cfg.num_layers, 768, 3 * 768)

    step = make_train_step(cfg, model, tx, donate=False)
    b = make_fake_batch(cfg, batch=2)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    labels = np.full(b["text_ids"].shape, -100, np.int32)
    labels[:, 2] = np.asarray(b["text_ids"])[:, 2]
    batch["text_ids_mlm"] = batch["text_ids"]
    batch["text_labels_mlm"] = jnp.asarray(labels)
    _, m = step(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))

    # timm dict at the preset's NATIVE 224/16 grid (14x14) -> model grid
    rng = np.random.RandomState(0)
    sd = _synthetic_timm_sd(cfg, grid=224 // 16, rng=rng)
    conv = load_timm_vit(sd, cfg)
    n_model = (cfg.image_size // cfg.patch_size) ** 2 + 1
    assert conv["pos_embed"].shape == (1, n_model, 768)
    assert conv["blocks"]["mlp"]["fc1"]["kernel"].shape == (8, 768, 3 * 768)
    # non-resized leaves round-trip exactly (qkv is transposed to (C,3C))
    np.testing.assert_allclose(
        np.asarray(conv["blocks"]["attn"]["qkv"]["kernel"][3]),
        sd["blocks.3.attn.qkv.weight"].T)

    # grafting the converted trunk into live params still runs forward
    params = dict(ts.params, transformer=conv)
    out = model.infer(params, batch, deterministic=True)
    assert np.all(np.isfinite(np.asarray(out["cls_feats"])))
