"""Attack tests: PGD Linf bounds + loss ascent; greedy substitution E2E."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.attacks.greedy import (
    GreedyAttackMoco, SynonymTable, check_word)
from rmcl_tpu.attacks.pgd import make_pgd_moco, make_pgd_nlvr2
from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.data.tokenizer import WordPieceTokenizer, make_tiny_vocab
from rmcl_tpu.models.heads import moco_head
from rmcl_tpu.models.vilt import ViLTModel
from rmcl_tpu.objectives.contrastive import infonce
from rmcl_tpu.objectives.losses import l2_normalize
from tests.conftest import make_fake_batch

WORDS = ["dog", "cat", "puppy", "kitten", "car", "auto", "red",
         "crimson", "blue", "big", "large", "small", "tiny", "runs",
         "sprints", "sits", "park", "garden", "street", "road",
         "in", "the", "a", "on"]
# synonym pairs share a direction in the fake embedding space
SYN_GROUPS = [["dog", "puppy"], ["cat", "kitten"], ["car", "auto"],
              ["red", "crimson"], ["big", "large"], ["small", "tiny"],
              ["runs", "sprints"], ["park", "garden"], ["street", "road"]]


@pytest.fixture(scope="module")
def moco_setup():
    cfg = build_config(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=None, loss_names=loss_names({"moco": 1}),
        num_negative=16, temperature=0.07, n_candidates=3, max_loops=2,
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0)
    return cfg


@pytest.fixture(scope="module")
def tiny_tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    make_tiny_vocab(str(p), WORDS)
    return WordPieceTokenizer(str(p))


@pytest.fixture(scope="module")
def tiny_synonyms(tmp_path_factory):
    p = tmp_path_factory.mktemp("emb") / "vectors.txt"
    rng = np.random.RandomState(0)
    vecs = {}
    for gi, group in enumerate(SYN_GROUPS):
        base = rng.randn(16)
        for j, w in enumerate(group):
            vecs[w] = base + 0.05 * rng.randn(16)
    for w in WORDS:
        if w not in vecs:
            vecs[w] = rng.randn(16)
    with open(p, "w") as f:
        for w, v in vecs.items():
            f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
    return SynonymTable(str(p), n_candidates=3, sim_thred=0.5)


def test_check_word():
    assert check_word("the")
    assert check_word(",")
    assert check_word("[CLS]")
    assert not check_word("dog")


def test_synonym_table(tiny_synonyms):
    cands = tiny_synonyms.candidates("dog")
    assert "puppy" in cands
    assert "dog" not in cands or cands == ["dog"]
    # unknown word maps to itself
    assert tiny_synonyms.candidates("zebra") == ["zebra"]


def test_synonym_table_rejects_foreign_cache(tmp_path):
    """A cache written for a DIFFERENT embedding file at the same
    sim_path must be rebuilt, not trusted: the default sim_path is a
    relative CWD path shared by unrelated runs, and a foreign cache
    carries out-of-range neighbour ids (seen as KeyError building the
    candidate table)."""
    rng = np.random.RandomState(1)

    def write(path, words):
        with open(path, "w") as f:
            for w in words:
                v = rng.randn(8)
                f.write(w + " " + " ".join(f"{x:.4f}" for x in v) + "\n")

    big = tmp_path / "big.txt"
    small = tmp_path / "small.txt"
    write(big, [f"w{i}" for i in range(16)])
    write(small, ["alpha", "beta", "gamma"])
    cache = str(tmp_path / "cos_sim_cache.npy")

    SynonymTable(str(big), n_candidates=3, sim_thred=-1.0, cache_path=cache)
    # same cache path, 3-word vocab: k check alone would accept the
    # 16-word cache and index id2word out of range
    t = SynonymTable(str(small), n_candidates=3, sim_thred=-1.0,
                     cache_path=cache)
    assert set(t.candidates("alpha")) <= {"alpha", "beta", "gamma"}
    # and the rebuilt cache is reusable for its own vocab
    t2 = SynonymTable(str(small), n_candidates=3, sim_thred=-1.0,
                      cache_path=cache)
    assert t2.candidates("alpha") == t.candidates("alpha")


def _moco_model_and_batch(moco_setup, vocab_size):
    cfg = moco_setup.replace(vocab_size=vocab_size)
    model = ViLTModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return cfg, model, params, state


def test_pgd_moco_bounds_and_ascent(moco_setup):
    cfg, model, params, state = _moco_model_and_batch(moco_setup, 64)
    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg).items()}

    infer_k = model.infer_k(params, b, deterministic=True)
    k = l2_normalize(moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)
    queue = state["proj_queue"]

    attack = make_pgd_moco(model, adv_steps=3, adv_lr=0.05,
                           max_norm=0.005, temperature=cfg.temperature)
    delta = jax.jit(attack)(params, b, k, queue)
    d = np.array(delta)
    assert d.shape == b["image"].shape
    assert np.max(np.abs(d)) <= 0.005 + 1e-6
    assert np.max(np.abs(d)) > 0  # attack actually moved

    def loss_of(img):
        infer = model.infer(params, dict(b, image=img), deterministic=True)
        q = l2_normalize(moco_head(params["moco_head"], infer["cls_feats"]), 1)
        return float(infonce(q, k, queue, cfg.temperature)[0])

    assert loss_of(b["image"] + delta) > loss_of(b["image"])


def test_pgd_fast_matches_slow(moco_setup):
    """Hoisted-geometry PGD (geometry computed once from the clean image)
    must equal the per-iteration-recompute path: dL/dδ is exactly zero on
    padding and unselected patches, so the mask / pos-embed / selection
    are δ-invariant (models/vit.py VisualPrep)."""
    cfg = moco_setup.replace(vocab_size=64, max_image_len=4)  # select 4 of 6
    model = ViLTModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg).items()}
    infer_k = model.infer_k(params, b, deterministic=True)
    k = l2_normalize(moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)
    queue = state["proj_queue"]

    args = (3, 0.05, 0.005, cfg.temperature)
    d_fast = jax.jit(make_pgd_moco(model, *args, fast=True))(params, b, k, queue)
    d_slow = jax.jit(make_pgd_moco(model, *args, fast=False))(params, b, k, queue)
    assert d_fast.shape == b["image"].shape
    np.testing.assert_allclose(np.array(d_fast), np.array(d_slow),
                               atol=1e-6, rtol=1e-5)

    # patch-row layout: δ comes back in the same layout as the input
    from rmcl_tpu.data.arrow_dataset import hwc_to_patch_rows
    from rmcl_tpu.models.vit import to_patch_rows
    rows = jnp.asarray(hwc_to_patch_rows(np.asarray(b["image"]),
                                         cfg.patch_size))
    b_rows = dict(b, image=rows)
    d_rows = jax.jit(make_pgd_moco(model, *args, fast=True))(
        params, b_rows, k, queue)
    assert d_rows.shape == rows.shape
    np.testing.assert_allclose(
        np.array(d_rows),
        np.array(to_patch_rows(d_fast, cfg.patch_size)),
        atol=1e-6, rtol=1e-5)


def test_pgd_nlvr2_gating(moco_setup):
    cfg = moco_setup.replace(
        vocab_size=64, loss_names=loss_names({"nlvr2": 1}))
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    fb = make_fake_batch(cfg)
    b = {
        "text_ids": jnp.asarray(fb["text_ids"]),
        "text_masks": jnp.asarray(fb["text_masks"]),
        "text_labels": jnp.asarray(fb["text_labels"]),
        "image_0": jnp.asarray(fb["image"]),
        "image_1": jnp.asarray(make_fake_batch(cfg, seed=3)["image"]),
    }
    labels = jnp.asarray(np.array([0, 1], np.int32))
    attack = make_pgd_nlvr2(model, adv_steps=2, adv_lr=0.05, max_norm=0.005,
                            attack_idx=(False, True))
    d0, d1 = jax.jit(attack)(params, b, labels)
    assert np.all(np.array(d0) == 0)       # gated off
    assert np.max(np.abs(np.array(d1))) > 0


def test_greedy_attack_moco_end_to_end(moco_setup, tiny_tok, tiny_synonyms):
    cfg, model, params, state = _moco_model_and_batch(
        moco_setup, tiny_tok.vocab_size)
    sentences = ["dog runs in park", "cat sits in street"]
    ids, masks = tiny_tok.batch_encode(sentences, cfg.max_text_len)
    fb = make_fake_batch(cfg)
    batch = {
        "image": fb["image"],
        "text_ids": ids.astype(np.int32),
        "text_masks": masks.astype(np.int32),
        "text_labels": np.full_like(ids, -100),
    }
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    infer_k = model.infer_k(params, dev, deterministic=True)
    k = l2_normalize(moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)

    attacker = GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms)
    out = attacker.adv_attack_samples(
        params, batch, (k, state["proj_queue"], cfg.temperature))

    assert out["txt_input_ids"].shape == ids.shape
    assert out["text_masks"].shape == masks.shape
    assert len(out["text"]) == 2
    assert out["num_changes"] >= 0
    # substituted words must come from the word's synonym candidates
    for orig, new in zip(sentences, out["text"]):
        for ow, nw in zip(orig.split(), new.split()):
            if ow != nw:
                assert nw in tiny_synonyms.candidates(ow), (ow, nw)

def test_fused_greedy_matches_host(moco_setup, tiny_tok, tiny_synonyms):
    """The on-device fused loop (attacks/greedy_fused.py) must reproduce
    the host orchestrator's final token ids exactly: same decode ->
    saliency -> pick -> candidate -> commit trajectory, no RNG."""
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack

    cfg, model, params, state = _moco_model_and_batch(
        moco_setup, tiny_tok.vocab_size)
    sentences = ["dog runs in park", "cat sits in street",
                 "big red car on road", "the a on in"]  # last: no targets
    ids, masks = tiny_tok.batch_encode(sentences, cfg.max_text_len)
    fb = make_fake_batch(cfg, batch=len(sentences))
    batch = {
        "image": fb["image"],
        "text_ids": ids.astype(np.int32),
        "text_masks": masks.astype(np.int32),
        "text_labels": np.full_like(ids, -100),
    }
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    infer_k = model.infer_k(params, dev, deterministic=True)
    k = l2_normalize(moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)
    extras = (k, state["proj_queue"], cfg.temperature)

    host = GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms)
    fused = FusedGreedyAttack(
        GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms))

    out_h = host.adv_attack_samples(params, batch, extras)
    out_f = fused.adv_attack_samples(params, batch, extras)

    np.testing.assert_array_equal(out_f["txt_input_ids"],
                                  out_h["txt_input_ids"])
    np.testing.assert_array_equal(out_f["text_masks"], out_h["text_masks"])
    assert out_f["changes_verification"] == out_h["changes_verification"]
    assert out_f["text"] == out_h["text"]
    assert out_f["num_changes"] == out_h["num_changes"]
    assert abs(out_f["change_rate"] - out_h["change_rate"]) < 1e-9
    # something actually changed somewhere (attack effectiveness)
    assert out_f["num_changes"] > 0

def test_fused_greedy_compaction_exact(moco_setup, tiny_tok,
                                       tiny_synonyms):
    """Live-set compaction (greedy_compact_frac) must be a pure perf
    transform: identical final token ids and change counts vs the
    uncompacted fused loop.  The batch mixes early-converging sentences
    (no attackable words / tiny budgets) with a long all-content one so
    the live count decays and phase 2 actually runs (Bc=1 here)."""
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack

    cfg, model, params, state = _moco_model_and_batch(
        moco_setup, tiny_tok.vocab_size)
    sentences = ["big red car on road near park",  # stays live longest
                 "the a on in",                    # no targets: dead at 0
                 "dog runs", "cat sits"]           # 1-commit budgets
    ids, masks = tiny_tok.batch_encode(sentences, cfg.max_text_len)
    fb = make_fake_batch(cfg, batch=len(sentences))
    batch = {
        "image": fb["image"],
        "text_ids": ids.astype(np.int32),
        "text_masks": masks.astype(np.int32),
        "text_labels": np.full_like(ids, -100),
    }
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    infer_k = model.infer_k(params, dev, deterministic=True)
    k = l2_normalize(moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)
    extras = (k, state["proj_queue"], cfg.temperature)

    outs = {}
    for frac in (0.0, 0.25, 0.5):
        c = cfg.replace(greedy_compact_frac=frac)
        att = FusedGreedyAttack(
            GreedyAttackMoco(c, model, tiny_tok, tiny_synonyms))
        outs[frac] = att.adv_attack_samples(params, batch, extras)
    for frac in (0.25, 0.5):
        np.testing.assert_array_equal(outs[frac]["txt_input_ids"],
                                      outs[0.0]["txt_input_ids"])
        np.testing.assert_array_equal(outs[frac]["text_masks"],
                                      outs[0.0]["text_masks"])
        assert (outs[frac]["changes_verification"]
                == outs[0.0]["changes_verification"])
    assert outs[0.5]["num_changes"] > 0


def test_fused_greedy_chunked_scoring_exact(moco_setup, tiny_tok,
                                            tiny_synonyms):
    """greedy_score_max_rows must be a pure memory transform: scoring
    the candidate axis in lax.map chunks (here ncg=2 over NC=5, with a
    padded 6th slot) produces identical final token ids and change
    counts vs the single (B*NC)-row forward — on both the fused and the
    host schedulers."""
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack

    cfg, model, params, state = _moco_model_and_batch(
        moco_setup, tiny_tok.vocab_size)
    sentences = ["dog runs in park", "cat sits in street",
                 "big red car on road", "the a on in"]
    ids, masks = tiny_tok.batch_encode(sentences, cfg.max_text_len)
    fb = make_fake_batch(cfg, batch=len(sentences))
    batch = {
        "image": fb["image"],
        "text_ids": ids.astype(np.int32),
        "text_masks": masks.astype(np.int32),
        "text_labels": np.full_like(ids, -100),
    }
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    infer_k = model.infer_k(params, dev, deterministic=True)
    k = l2_normalize(moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)
    extras = (k, state["proj_queue"], cfg.temperature)

    B = len(sentences)
    outs = {}
    for cap in (0, 2 * B):   # 0 = unchunked; 2*B -> ncg=2, G=3, 1 pad
        c = cfg.replace(greedy_score_max_rows=cap)
        att = FusedGreedyAttack(
            GreedyAttackMoco(c, model, tiny_tok, tiny_synonyms))
        outs[cap] = att.adv_attack_samples(params, batch, extras)
    np.testing.assert_array_equal(outs[2 * B]["txt_input_ids"],
                                  outs[0]["txt_input_ids"])
    np.testing.assert_array_equal(outs[2 * B]["text_masks"],
                                  outs[0]["text_masks"])
    assert (outs[2 * B]["changes_verification"]
            == outs[0]["changes_verification"])
    assert outs[0]["num_changes"] > 0

    # host scheduler rides the same knob through score_pass
    host = GreedyAttackMoco(cfg.replace(greedy_score_max_rows=2 * B),
                            model, tiny_tok, tiny_synonyms)
    out_h = host.adv_attack_samples(params, batch, extras)
    np.testing.assert_array_equal(out_h["txt_input_ids"],
                                  outs[0]["txt_input_ids"])


def test_fused_greedy_matches_host_nlvr2_and_bt(moco_setup, tiny_tok,
                                                tiny_synonyms):
    """Fused-vs-host parity for the two structurally different
    frameworks: NLVR2 (two-image infer, tiled labels) and BarlowTwins
    (batch-coupled loss + aux carried through the grad-reuse cond)."""
    from rmcl_tpu.attacks.greedy import (
        GreedyAttackBarlowTwins, GreedyAttackNlvr2)
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
    from rmcl_tpu.core.config import loss_names

    sentences = ["dog runs in park", "cat sits in street"]
    ids, masks = tiny_tok.batch_encode(sentences, 12)

    # ---- NLVR2
    cfg = moco_setup.replace(vocab_size=tiny_tok.vocab_size,
                             loss_names=loss_names({"nlvr2_attacked": 1}))
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(3))
    batch = {
        "text_ids": ids.astype(np.int32),
        "text_masks": masks.astype(np.int32),
        "text_labels": np.full_like(ids, -100),
        "image_0": make_fake_batch(cfg)["image"],
        "image_1": make_fake_batch(cfg, seed=7)["image"],
    }
    extras = (jnp.asarray([0, 1], jnp.int32),)
    host = GreedyAttackNlvr2(cfg, model, tiny_tok, tiny_synonyms)
    fused = FusedGreedyAttack(
        GreedyAttackNlvr2(cfg, model, tiny_tok, tiny_synonyms))
    oh = host.adv_attack_samples(params, batch, extras)
    of = fused.adv_attack_samples(params, batch, extras)
    np.testing.assert_array_equal(of["txt_input_ids"], oh["txt_input_ids"])
    assert of["changes_verification"] == oh["changes_verification"]

    # ---- BarlowTwins (batch-coupled loss; aux = q from the grad pass)
    cfg = moco_setup.replace(vocab_size=tiny_tok.vocab_size,
                             loss_names=loss_names({"barlowtwins": 1}))
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(4))
    batch = {
        "text_ids": ids.astype(np.int32),
        "text_masks": masks.astype(np.int32),
        "text_labels": np.full_like(ids, -100),
        "image": make_fake_batch(cfg)["image"],
    }
    D = params["barlowtwins_head"]["projector"]["6"]["kernel"].shape[1]
    k = jnp.asarray(np.random.RandomState(9).randn(2, D), jnp.float32)
    extras = (k, 2, cfg.adv_lr)
    host = GreedyAttackBarlowTwins(cfg, model, tiny_tok, tiny_synonyms)
    fused = FusedGreedyAttack(
        GreedyAttackBarlowTwins(cfg, model, tiny_tok, tiny_synonyms))
    oh = host.adv_attack_samples(params, batch, extras)
    of = fused.adv_attack_samples(params, batch, extras)
    np.testing.assert_array_equal(of["txt_input_ids"], oh["txt_input_ids"])
    assert of["changes_verification"] == oh["changes_verification"]

    # barlowtwins is NOT chunk-invariant (its scoring forward runs the
    # projector BatchNorm in training mode over the whole scoring
    # batch), so greedy_score_max_rows must be IGNORED for it — a tiny
    # cap yields the identical program/token ids on both schedulers.
    cap_cfg = cfg.replace(greedy_score_max_rows=2)
    host_cap = GreedyAttackBarlowTwins(cap_cfg, model, tiny_tok,
                                       tiny_synonyms)
    fused_cap = FusedGreedyAttack(
        GreedyAttackBarlowTwins(cap_cfg, model, tiny_tok, tiny_synonyms))
    np.testing.assert_array_equal(
        host_cap.adv_attack_samples(params, batch, extras)
        ["txt_input_ids"], oh["txt_input_ids"])
    np.testing.assert_array_equal(
        fused_cap.adv_attack_samples(params, batch, extras)
        ["txt_input_ids"], of["txt_input_ids"])

def test_attacked_train_step_one_program_parity(moco_setup, tiny_tok,
                                                tiny_synonyms):
    """make_attacked_train_step (extras + fused attack + train step in
    ONE jitted program) must match the 3-program pipeline: same attacked
    ids -> same loss and same updated params."""
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
    from rmcl_tpu.core.config import loss_names
    from rmcl_tpu.train.loop import make_greedy_extras_fn
    from rmcl_tpu.train.step import (
        create_train_state, make_attacked_train_step, make_train_step)

    cfg = moco_setup.replace(
        vocab_size=tiny_tok.vocab_size, text_view=True, image_view=True,
        adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
        num_negative=16, momentum=0.99, warmup_steps=0, max_steps=100)
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    fused = FusedGreedyAttack(
        GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms))

    ids, masks = tiny_tok.batch_encode(
        ["dog runs in park", "cat sits in street"], cfg.max_text_len)
    fb = make_fake_batch(cfg)
    batch = {
        "image": jnp.asarray(fb["image"]),
        "text_ids": jnp.asarray(ids, jnp.int32),
        "text_masks": jnp.asarray(masks, jnp.int32),
        "text_labels": jnp.full_like(jnp.asarray(ids), -100),
    }
    rng = jax.random.PRNGKey(7)

    # ---- 3-program pipeline: extras -> attack -> step
    extras = make_greedy_extras_fn(cfg, model)(ts, batch)
    out = fused.adv_attack_samples(ts.params, batch, extras)
    b2 = dict(batch,
              attacked_text_ids=jnp.asarray(out["txt_input_ids"]),
              attacked_text_masks=jnp.asarray(out["text_masks"]))
    ts1, m1 = make_train_step(cfg, model, tx, donate=False)(ts, b2, rng)

    # ---- ONE program
    tables = {k: jnp.asarray(v)
              for k, v in fused.prep_tables(ids).items()}
    step2 = make_attacked_train_step(cfg, model, tx, fused, donate=False)
    ts2, m2 = step2(ts, dict(batch, **tables), rng)

    np.testing.assert_allclose(float(m1["moco_loss"]),
                               float(m2["moco_loss"]), rtol=1e-5)
    w1 = np.asarray(ts1.params["moco_head"]["projector"]["0"]["kernel"])
    w2 = np.asarray(ts2.params["moco_head"]["projector"]["0"]["kernel"])
    np.testing.assert_allclose(w1, w2, atol=1e-6)
    assert float(m2["num_changes"]) == out["num_changes"]
    assert abs(float(m2["change_rate"]) - out["change_rate"]) < 1e-6

def test_fused_greedy_fuzz_parity(moco_setup, tiny_tok, tiny_synonyms):
    """Randomised host-vs-fused parity: random sentences (including
    multi-sub-token OOV words that push the M bucket to 8/16) must
    produce identical attacked ids across several batches."""
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack

    cfg, model, params, state = _moco_model_and_batch(
        moco_setup, tiny_tok.vocab_size)
    host = GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms)
    fused = FusedGreedyAttack(
        GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms))

    pool = WORDS + ["extraordinarily", "unquestionably"]  # char-split OOV
    r = np.random.RandomState(11)
    for trial in range(4):
        sents = [" ".join(r.choice(pool, size=r.randint(2, 9)))
                 for _ in range(3)]
        ids, masks = tiny_tok.batch_encode(sents, cfg.max_text_len)
        fb = make_fake_batch(cfg, batch=3, seed=trial)
        batch = {
            "image": fb["image"],
            "text_ids": ids.astype(np.int32),
            "text_masks": masks.astype(np.int32),
            "text_labels": np.full_like(ids, -100),
        }
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        infer_k = model.infer_k(params, dev, deterministic=True)
        k = l2_normalize(
            moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)
        extras = (k, state["proj_queue"], cfg.temperature)

        oh = host.adv_attack_samples(params, batch, extras)
        of = fused.adv_attack_samples(params, batch, extras)
        np.testing.assert_array_equal(
            of["txt_input_ids"], oh["txt_input_ids"],
            err_msg=f"trial {trial}: {sents}")
        assert of["changes_verification"] == oh["changes_verification"], \
            (trial, sents)

def test_attacked_train_step_one_program_nlvr2(moco_setup, tiny_tok,
                                               tiny_synonyms):
    """One-program attack+step for the NLVR2 framework: label extras
    come straight from the batch in-graph; parity vs the pipeline."""
    from rmcl_tpu.attacks.greedy import GreedyAttackNlvr2
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
    from rmcl_tpu.core.config import loss_names
    from rmcl_tpu.train.loop import make_greedy_extras_fn
    from rmcl_tpu.train.step import (
        create_train_state, make_attacked_train_step, make_train_step)

    cfg = moco_setup.replace(
        vocab_size=tiny_tok.vocab_size,
        loss_names=loss_names({"nlvr2_attacked": 1}),
        text_view=True, image_view=True, adv_steps_img=1,
        adv_lr_img=0.05, adv_max_norm_img=0.005,
        warmup_steps=0, max_steps=100)
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    fused = FusedGreedyAttack(
        GreedyAttackNlvr2(cfg, model, tiny_tok, tiny_synonyms))

    ids, masks = tiny_tok.batch_encode(
        ["dog runs in park", "cat sits in street"], cfg.max_text_len)
    batch = {
        "image_0": jnp.asarray(make_fake_batch(cfg)["image"]),
        "image_1": jnp.asarray(make_fake_batch(cfg, seed=7)["image"]),
        "text_ids": jnp.asarray(ids, jnp.int32),
        "text_masks": jnp.asarray(masks, jnp.int32),
        "text_labels": jnp.full_like(jnp.asarray(ids), -100),
        "answers": jnp.asarray([0, 1], jnp.int32),
    }
    rng = jax.random.PRNGKey(7)

    extras = make_greedy_extras_fn(cfg, model)(ts, batch)
    out = fused.adv_attack_samples(ts.params, batch, extras)
    b2 = dict(batch,
              attacked_text_ids=jnp.asarray(out["txt_input_ids"]),
              attacked_text_masks=jnp.asarray(out["text_masks"]))
    ts1, m1 = make_train_step(cfg, model, tx, donate=False)(ts, b2, rng)

    tables = {k: jnp.asarray(v)
              for k, v in fused.prep_tables(ids).items()}
    step2 = make_attacked_train_step(cfg, model, tx, fused, donate=False)
    ts2, m2 = step2(ts, dict(batch, **tables), rng)

    np.testing.assert_allclose(float(m1["nlvr2_attacked_loss"]),
                               float(m2["nlvr2_attacked_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["nlvr2_original_loss"]),
                               float(m2["nlvr2_original_loss"]), rtol=1e-5)
    w1 = np.asarray(ts1.params["nlvr2_classifier"]["0"]["kernel"])
    w2 = np.asarray(ts2.params["nlvr2_classifier"]["0"]["kernel"])
    np.testing.assert_allclose(w1, w2, atol=1e-6)


def test_fused_greedy_text_bucket_exact(moco_setup, tiny_tok,
                                        tiny_synonyms):
    """greedy_text_bucket (attacks/greedy_fused.py:_text_bucket) must be
    a pure perf transform: the attack's internal forwards run at the
    smaller static text bucket Ts < max_text_len, yet the final token
    ids / masks / change counts equal both the unbucketed fused program
    and the host orchestrator."""
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack

    # widen T so the bucket visibly engages (captions stay ~6 tokens)
    cfg = moco_setup.replace(vocab_size=tiny_tok.vocab_size,
                             max_text_len=24)
    model = ViLTModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    sentences = ["dog runs in park", "cat sits in street",
                 "big red car on road", "the a on in"]
    ids, masks = tiny_tok.batch_encode(sentences, cfg.max_text_len)
    fb = make_fake_batch(cfg, batch=len(sentences))
    batch = {
        "image": fb["image"],
        "text_ids": ids.astype(np.int32),
        "text_masks": masks.astype(np.int32),
        "text_labels": np.full_like(ids, -100),
    }
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    infer_k = model.infer_k(params, dev, deterministic=True)
    k = l2_normalize(moco_head(params["k_moco_head"], infer_k["cls_feats"]), 1)
    extras = (k, state["proj_queue"], cfg.temperature)

    outs = {}
    for bucket in (False, True):
        c = cfg.replace(attack_text_bucket=bucket)
        att = FusedGreedyAttack(
            GreedyAttackMoco(c, model, tiny_tok, tiny_synonyms))
        if bucket:
            tb = att.prep_tables(ids.astype(np.int32))["gw_tbucket"]
            assert tb.shape[1] < cfg.max_text_len, \
                "bucket should engage for short captions"
            assert tb.shape[1] % 8 == 0
        outs[bucket] = att.adv_attack_samples(params, batch, extras)

    host = GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms)
    out_h = host.adv_attack_samples(params, batch, extras)

    for o in (outs[True], outs[False]):
        np.testing.assert_array_equal(o["txt_input_ids"],
                                      out_h["txt_input_ids"])
        np.testing.assert_array_equal(o["text_masks"], out_h["text_masks"])
        assert o["changes_verification"] == out_h["changes_verification"]
    assert outs[True]["num_changes"] > 0


def test_text_bucket_collapses_host_side_when_pad_neutral(
        moco_setup, tiny_tok, tiny_synonyms):
    """On the fused-kernel path the text bucket must collapse to
    max_text_len HOST-side (gw_tbucket SHAPE == T) whenever it cannot
    lower the _S_ALIGN-padded S: a varying host shape would retrace the
    whole one-program attack+train executable once per /8 caption
    bucket for a bit-identical program (ROADMAP round 4)."""
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack

    sentences = ["dog runs in park", "cat sits in street"]

    def tbucket_width(max_text_len, max_image_len):
        cfg = moco_setup.replace(vocab_size=tiny_tok.vocab_size,
                                 max_text_len=max_text_len,
                                 max_image_len=max_image_len,
                                 attention_impl="fused")
        model = ViLTModel(cfg)
        assert model.spec.attn_impl == "fused"
        att = FusedGreedyAttack(
            GreedyAttackMoco(cfg, model, tiny_tok, tiny_synonyms))
        ids, _ = tiny_tok.batch_encode(sentences, cfg.max_text_len)
        return att.prep_tables(ids.astype(np.int32))["gw_tbucket"].shape[1]

    # this grid has 6 patches -> image_seq_len = 7 regardless of
    # max_image_len=200: 7+24 and 7+Ts both pad to 128, bucket is
    # S_pad-neutral and must collapse to T for a stable program shape
    assert tbucket_width(24, 200) == 24
    # regression (round-4 review): the neutrality check must size S
    # from the REAL image tokens min(num_patches, max_image_len)+1
    # (cfg.image_seq_len), not the raw max_image_len — 7+64 also pads
    # to 128, so the bucket must collapse here too (the unclamped
    # formula compared 265->384 vs 209->256 and kept it engaged,
    # retracing the one-program executable once per /8 caption bucket)
    assert tbucket_width(64, 200) == 64
    # 7+128 pads to 256 but short captions bucket back under 128: the
    # bucket drops a whole 128-row tile and must stay engaged
    w = tbucket_width(128, 200)
    assert w < 128 and w % 8 == 0
