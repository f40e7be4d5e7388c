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


# ---------------------------------------------------------- runtime
def _vocab(tmp_path):
    from rmcl_tpu.data.tokenizer import WordPieceTokenizer, make_tiny_vocab
    p = str(tmp_path / "vocab.txt")
    make_tiny_vocab(p, ["dog", "cat", "park", "the"])
    return p, WordPieceTokenizer(p)


def _pil_images(n, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    # deliberately varied raw sizes: exercises min_max_resize+fit_bucket
    sizes = [(40, 56), (64, 32), (48, 48), (80, 40)]
    return [Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        for (h, w) in (sizes[i % len(sizes)] for i in range(n))]


def test_artifact_session_chunks_and_pads(tmp_path):
    """predict() on n != exported-B requests: chunking + pad-by-repeat
    reproduce per-request outputs exactly, through the real host
    preprocessing (resize -> bucket -> patch rows -> tokenize)."""
    from rmcl_tpu.serve import ArtifactSession, export_meta

    cfg = _cfg("embed", image_dtype="uint8")
    params = _params(cfg)
    _, tok = _vocab(tmp_path)
    path = str(tmp_path / "embed.stablehlo")
    export_inference(cfg, params, "embed", 2, out_path=path)
    import os
    assert os.path.isfile(path + ".json")   # sidecar metadata

    sess = ArtifactSession.open(path, params, tok)
    assert sess.meta == export_meta(cfg, "embed", 2)

    imgs = _pil_images(3)
    texts = ["the dog", "a cat in the park", "dog park"]
    out = sess.predict(imgs, texts)
    assert out.shape == (3, 128)
    # chunk 2 of predict(3) came from a padded half-batch; it must
    # equal the same request served alone
    solo = sess.predict(imgs[2:], texts[2:])
    np.testing.assert_allclose(out[2], solo[0], rtol=1e-6, atol=1e-6)
    # row order is request order
    np.testing.assert_allclose(
        out[:2], sess.predict(imgs[:2], texts[:2]), rtol=1e-6, atol=1e-6)


def test_artifact_session_u8_matches_f32(tmp_path):
    """The two wire formats serve identical results for identical
    requests (the u8 artifact normalizes in-graph, PARITY #26)."""
    from rmcl_tpu.serve import ArtifactSession

    _, tok = _vocab(tmp_path)
    imgs, texts = _pil_images(2, seed=3), ["the dog", "cat"]
    outs = {}
    for wire in ("uint8", "float32"):
        cfg = _cfg("embed", image_dtype=wire)
        params = _params(cfg)
        path = str(tmp_path / f"{wire}.stablehlo")
        export_inference(cfg, params, "embed", 2, out_path=path)
        outs[wire] = ArtifactSession.open(path, params, tok).predict(
            imgs, texts)
    np.testing.assert_allclose(outs["uint8"], outs["float32"],
                               rtol=1e-5, atol=1e-5)


def test_artifact_session_hwc_layout_matches_patch(tmp_path):
    """The hwc-canvas wire layout serves the same results as the
    patch-row layout (same pixels, different device layout)."""
    from rmcl_tpu.serve import ArtifactSession

    _, tok = _vocab(tmp_path)
    imgs, texts = _pil_images(2, seed=5), ["the dog", "a cat"]
    outs = {}
    for layout in ("patch", "hwc"):
        cfg = _cfg("embed", image_dtype="float32", image_layout=layout)
        params = _params(cfg)
        path = str(tmp_path / f"{layout}.stablehlo")
        export_inference(cfg, params, "embed", 2, out_path=path)
        outs[layout] = ArtifactSession.open(path, params, tok).predict(
            imgs, texts)
    np.testing.assert_allclose(outs["patch"], outs["hwc"],
                               rtol=1e-5, atol=1e-5)


def test_artifact_session_truncates_overlong_text(tmp_path):
    """Over-long request text must be truncated to the artifact's fixed
    (B, T) signature — HF tokenizers do NOT truncate by default, so the
    session passes truncation=True exactly like training
    (data/arrow_dataset.py:139)."""
    import json

    transformers = pytest.importorskip("transformers")
    from rmcl_tpu.serve import ArtifactSession

    vocab, _ = _vocab(tmp_path)
    hf_tok = transformers.BertTokenizer(vocab_file=vocab,
                                        do_lower_case=True)
    cfg = _cfg("embed", image_dtype="float32")
    params = _params(cfg)
    path = str(tmp_path / "embed.stablehlo")
    export_inference(cfg, params, "embed", 2, out_path=path)
    with open(path + ".json") as fh:
        meta = json.load(fh)
    sess = ArtifactSession(path, params, hf_tok, meta)
    out = sess.predict(_pil_images(2), ["the dog " * 40, "cat"])
    assert out.shape == (2, 128) and np.isfinite(
        np.asarray(out, np.float32)).all()


def test_postprocess_records(tmp_path):
    from rmcl_tpu.serve import postprocess

    _, tok = _vocab(tmp_path)
    assert postprocess("rank", np.asarray([1.5]))[0] == {"score": 1.5}
    itm = postprocess("itm", np.asarray([[0.0, 0.0]]))[0]
    assert abs(itm["match_prob"] - 0.5) < 1e-6
    emb = postprocess("embed", np.eye(2, 4, dtype=np.float32))
    assert len(emb) == 2 and len(emb[0]["embedding"]) == 4
    vqa = postprocess("vqa", np.asarray([[0.0, 5.0, 1.0]]), topk=2)[0]
    assert vqa["answers"][0][0] == 1 and len(vqa["answers"]) == 2
    # mlm: argmax token reported at each [MASK] position
    ids = tok(["the [MASK]"], max_length=6, padding="max_length",
              return_tensors="np")["input_ids"]
    pos = int(np.where(ids[0] == tok.mask_token_id)[0][0])
    logits = np.zeros((1, 6, tok.vocab_size), np.float32)
    dog = tok.convert_tokens_to_ids("dog")
    logits[0, pos, dog] = 9.0
    rec = postprocess("mlm", logits, tokenizer=tok, text_ids=ids)[0]
    assert rec["fills"] == [[pos, "dog"]]


def test_cli_serve_e2e(tmp_path):
    """export -> serve over a JSONL request file reproduces the
    ArtifactSession outputs (full CLI path, fresh-init params)."""
    import json

    from rmcl_tpu.cli.run import main as cli_main

    vocab, tok = _vocab(tmp_path)
    overrides = [
        "hidden_size=32", "num_heads=2", "num_layers=1", "patch_size=16",
        "image_size=32", "image_bucket_hw=(32,48)", "max_text_len=10",
        "vocab_size=64", "use_pallas_attention=False",
        "compute_dtype=float32", "drop_rate=0.0", "vqav2_label_size=7",
        f"tokenizer={vocab}", "loss_names={'vqa': 1}", "seed=0"]
    art = str(tmp_path / "vqa.stablehlo")
    assert cli_main(["export", "vqa", art, "batch_size=2", "with",
                     *overrides]) == 0

    reqs = str(tmp_path / "reqs.jsonl")
    outp = str(tmp_path / "out.jsonl")
    imgs = _pil_images(3, seed=7)
    with open(reqs, "w") as fh:
        for i, im in enumerate(imgs):
            ip = str(tmp_path / f"img{i}.png")
            im.save(ip)
            fh.write(json.dumps(
                {"image": ip, "text": f"the dog {i}"}) + "\n")

    assert cli_main(["serve", art, f"input={reqs}", f"output={outp}",
                     "with", *overrides]) == 0
    recs = [json.loads(ln) for ln in open(outp)]
    assert len(recs) == 3
    for r in recs:
        assert len(r["answers"]) == 5
        assert all(0.0 <= p <= 1.0 for _, p in r["answers"])
