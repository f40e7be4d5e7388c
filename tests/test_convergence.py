"""Convergence smoke tests: the training system must LEARN, not just
run.  Single-step unit tests catch shape/wiring bugs but miss sign and
scale errors (a negated loss, a mis-scaled gradient, an EMA that
overwrites the query net) that only show up as non-decreasing loss.
The reference's de-facto functional test is "trains to EVAL.md
numbers" (SURVEY §4) — environment-gated here, so overfit-a-fixed-batch
is the next-strongest check: one objective per family (generative MLM,
adversarial-contrastive MoCo, classification VQA)."""

import jax
import jax.numpy as jnp
import numpy as np

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.train.step import create_train_state, make_train_step
from tests.conftest import make_fake_batch


def _tiny(loss, **kw):
    base = dict(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names(loss),
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0,
        # constant-ish high lr: no warmup, negligible decay over the run
        learning_rate=5e-3, warmup_steps=0, max_steps=10000,
        decay_power=1, end_lr=0.0)
    base.update(kw)
    return build_config(**base)


def _run(cfg, batch, n_steps, seed=0):
    """Train n_steps on the one fixed batch; returns the per-step
    scalar-metric history."""
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, donate=False)
    history = []
    rng = jax.random.PRNGKey(seed)
    for _ in range(n_steps):
        rng, sub = jax.random.split(rng)
        ts, metrics = step_fn(ts, batch, sub)
        history.append({k: float(v) for k, v in metrics.items()
                        if np.ndim(v) == 0})
    return history


def _trend(history, key, factor, vs="first"):
    """mean(last 5) must fall below `factor` x the first (or the PEAK,
    vs="peak" — contrastive losses legitimately RISE while the queue
    fills with real keys before learning brings them down)."""
    losses = [h[key] for h in history]
    assert all(np.isfinite(losses)), losses
    ref = max(losses) if vs == "peak" else losses[0]
    last = float(np.mean(losses[-5:]))
    assert last < factor * ref, (key, ref, last, losses)


def test_mlm_overfit():
    """MLM on one fixed masked batch must overfit hard (vocab 64)."""
    cfg = _tiny({"mlm": 1})
    b = make_fake_batch(cfg, batch=4)
    labels = np.full_like(b["text_ids"], -100)
    labels[:, 2:5] = b["text_ids"][:, 2:5]
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["text_ids_mlm"] = batch["text_ids"]
    batch["text_labels_mlm"] = jnp.asarray(labels)

    # measured: 4.22 -> 0.017 over 60 steps at lr 5e-3
    _trend(_run(cfg, batch, 60), "mlm_loss", 0.05)


def test_vqa_overfit():
    """VQA BCE to fixed soft targets must decrease steadily."""
    cfg = _tiny({"vqa": 1}, vqav2_label_size=8)
    b = make_fake_batch(cfg, batch=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    t = np.zeros((4, 8), np.float32)
    t[np.arange(4), np.arange(4)] = 1.0
    t[1, 5] = 0.3
    batch["vqa_targets"] = jnp.asarray(t)

    # measured: 5.43 -> 0.21 over 60 steps (floor: the soft 0.3-score
    # target keeps an irreducible BCE term)
    _trend(_run(cfg, batch, 60), "vqa_loss", 0.1)


def test_barlowtwins_overfit():
    """The full BT step (frozen-key forward + PGD image view +
    attacked-text view + both view, batch-coupled BN projector) must
    drive the correlation loss down from its peak on a repeated batch.
    Catches the λ (= adv_lr = 0.0051) off-diagonal sign/scale bug class
    (reference objectives.py:476-534) that single-step finiteness tests
    can't: a negated on-diag term or a mis-scaled redundancy term still
    produces finite losses but never trends down."""
    cfg = _tiny({"barlowtwins": 1}, learning_rate=2e-3,
                adv_lr=0.0051, image_view=True, text_view=True,
                bt_proj_dims=(64, 64, 32),
                adv_steps_img=3, adv_lr_img=0.05, adv_max_norm_img=0.005)
    b = make_fake_batch(cfg, batch=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["attacked_text_ids"] = jnp.roll(batch["text_ids"], 1, axis=1)
    batch["attacked_text_masks"] = batch["text_masks"]

    history = _run(cfg, batch, 60)
    # vs peak: the first steps move the BN running stats and the PGD
    # delta against a fresh projector before the on-diagonal terms
    # start aligning
    _trend(history, "barlowtwins_loss", 0.5, vs="peak")
    # the invariance (on-diagonal) terms must actually approach 1·I:
    # they start near D (each diag entry ~0 -> (0-1)^2 summed) and
    # collapse as q aligns with the frozen k
    _trend(history, "barlowtwins_loss_invariance_text", 0.5, vs="peak")


def test_nlvr2_overfit():
    """NLVR2 CE on a fixed two-image batch must overfit to ~chance-free
    accuracy (reference compute_nlvr2, objectives.py:1002-1060)."""
    cfg = _tiny({"nlvr2": 1}, learning_rate=5e-3)
    b = make_fake_batch(cfg, batch=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["image_1"] = jnp.asarray(
        make_fake_batch(cfg, batch=8, seed=3)["image"])
    # the 3-row token-type embedding path reads image_0 when present
    batch["image_0"] = batch.pop("image")
    batch["answers"] = jnp.asarray(
        np.arange(8) % 2, jnp.int32)

    history = _run(cfg, batch, 60)
    _trend(history, "nlvr2_loss", 0.1)
    # step accuracy is emitted in-graph; the fixed batch must become
    # fully separable
    acc = [h["nlvr2_step_accuracy"] for h in history]
    assert float(np.mean(acc[-5:])) >= 0.99, acc


def test_moco_rmcl_overfit():
    """The FULL RMCL MoCo step (EMA twins + 5-step PGD image view +
    attacked-text view + 16-slot queue) must still learn on a repeated
    batch: the query projections align with the (EMA-tracked) keys and
    repel the queue negatives.  The loss floor is above zero — each
    sample's own stale key sits in the queue as a negative — but the
    trend must be clearly down.  Catches EMA-direction bugs (k
    overwriting q trains nothing) and attack-view loss-sign errors."""
    # lr 5e-3 oscillates against the lagging EMA target; 2e-3 converges
    # (measured: moco 2.74 -> 0.83 over 60 steps, chance = ln(17) = 2.83)
    cfg = _tiny({"moco": 1}, learning_rate=2e-3, num_negative=16,
                momentum=0.9, temperature=0.07, image_view=True,
                text_view=True, adv_steps_img=5, adv_lr_img=0.05,
                adv_max_norm_img=0.005)
    b = make_fake_batch(cfg, batch=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["attacked_text_ids"] = jnp.roll(batch["text_ids"], 1, axis=1)
    batch["attacked_text_masks"] = batch["text_masks"]

    history = _run(cfg, batch, 60)
    _trend(history, "moco_loss", 0.55)
    # the adversarial views' losses trend down from their PEAK — they
    # first RISE while the 16-slot queue fills with real (hard) keys
    for key in ("attacked_img_loss", "attacked_txt_loss"):
        _trend(history, key, 0.5, vs="peak")
