"""Training-layer tests: schedules, param grouping, full train steps, and
8-virtual-device data-parallel sharding (substitute for the reference's
missing distributed tests, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.parallel import make_mesh, shard_batch
from rmcl_tpu.train.schedule import (
    BASE_DECAY, BASE_NO_DECAY, FROZEN, HEAD_DECAY, HEAD_NO_DECAY,
    make_lr_schedule, param_group_labels)
from rmcl_tpu.train.step import create_train_state, make_eval_step, make_train_step
from tests.conftest import make_fake_batch


def _tiny(loss, **kw):
    base = dict(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names(loss),
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0,
        max_steps=100, warmup_steps=10)
    base.update(kw)
    return build_config(**base)


# ----------------------------------------------------------- schedules
def test_polynomial_schedule_matches_hf():
    cfg = _tiny({"mlm": 1}, learning_rate=1e-4, warmup_steps=10,
                max_steps=100, decay_power=1, end_lr=0.0)
    s = make_lr_schedule(cfg, 100)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(s(5)), 0.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(10)), 1e-4, rtol=1e-5)
    # linear decay midpoint: step 55 is halfway through the 90 decay steps
    np.testing.assert_allclose(float(s(55)), 0.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-10)


def test_cosine_schedule_endpoints():
    cfg = _tiny({"mlm": 1}, learning_rate=2e-4, warmup_steps=0.1,
                max_steps=None, decay_power="cosine")
    s = make_lr_schedule(cfg, 100)
    np.testing.assert_allclose(float(s(10)), 2e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(55)), 1e-4, rtol=1e-3)
    assert float(s(100)) < 1e-8


def test_param_group_labels():
    cfg = _tiny({"moco": 1, "vqa": 1}, num_negative=16)
    _, ts, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    labels = param_group_labels(ts.params)
    # transformer weights decay at base lr
    assert labels["transformer"]["blocks"]["attn"]["qkv"]["kernel"] == BASE_DECAY
    assert labels["transformer"]["blocks"]["attn"]["qkv"]["bias"] == BASE_NO_DECAY
    # any norm layer -> no decay
    assert labels["transformer"]["blocks"]["norm1"]["weight"] == BASE_NO_DECAY
    assert labels["pooler"]["dense"]["kernel"] == BASE_DECAY
    # heads get lr_mult
    assert labels["vqa_classifier"]["0"]["kernel"] == HEAD_DECAY
    assert labels["vqa_classifier"]["0"]["bias"] == HEAD_NO_DECAY
    assert labels["moco_head"]["projector"]["0"]["kernel"] == HEAD_DECAY
    # momentum twins frozen
    assert labels["k_transformer"]["blocks"]["attn"]["qkv"]["kernel"] == FROZEN
    assert labels["k_moco_head"]["projector"]["0"]["kernel"] == FROZEN


# ----------------------------------------------------------- train steps
def test_train_step_mlm_itm():
    cfg = _tiny({"mlm": 1, "itm": 1})
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, donate=False)

    b = make_fake_batch(cfg, batch=4)
    labels = np.full_like(b["text_ids"], -100)
    labels[:, 2] = b["text_ids"][:, 2]
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["text_ids_mlm"] = batch["text_ids"]
    batch["text_labels_mlm"] = jnp.asarray(labels)
    batch["false_image_0"] = jnp.asarray(make_fake_batch(cfg, batch=4, seed=9)["image"])

    w0 = np.array(ts.params["transformer"]["blocks"]["attn"]["qkv"]["kernel"])
    ts1, metrics = step_fn(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["mlm_loss"]))
    assert np.isfinite(float(metrics["itm_loss"]))
    assert int(ts1.step) == 1
    # HF warmup semantics: lr(step 0) == 0, so the first step is a no-op
    assert float(metrics["lr"]) == 0.0
    np.testing.assert_allclose(
        w0, np.array(ts1.params["transformer"]["blocks"]["attn"]["qkv"]["kernel"]))

    ts2, m2 = step_fn(ts1, batch, jax.random.PRNGKey(2))
    assert int(ts2.step) == 2
    assert float(m2["lr"]) > float(metrics["lr"])  # warming up
    w2 = np.array(ts2.params["transformer"]["blocks"]["attn"]["qkv"]["kernel"])
    assert not np.allclose(w0, w2)  # params moved once lr > 0


def test_train_step_moco_pgd_dataparallel_8dev():
    """Full MoCo RMCL step (EMA + PGD image view + queue) sharded over 8
    virtual devices — covers the reference's DDP all_gather semantics."""
    assert jax.device_count() >= 8
    cfg = _tiny({"moco": 1}, num_negative=16, momentum=0.99,
                temperature=0.07, image_view=True, text_view=True,
                adv_steps_img=2, adv_lr_img=0.05, adv_max_norm_img=0.005,
                warmup_steps=0)  # lr > 0 from step 0
    mesh = make_mesh(jax.devices()[:8])
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, mesh=mesh, donate=False)

    b = make_fake_batch(cfg, batch=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    # host-side greedy attack output (simulated): perturbed ids
    batch["attacked_text_ids"] = jnp.roll(batch["text_ids"], 1, axis=1)
    batch["attacked_text_masks"] = batch["text_masks"]
    batch = shard_batch(batch, mesh)

    k0 = np.array(ts.params["k_moco_head"]["projector"]["0"]["kernel"])
    q0 = np.array(ts.params["moco_head"]["projector"]["0"]["kernel"])
    ts1, metrics = step_fn(ts, batch, jax.random.PRNGKey(1))

    assert np.isfinite(float(metrics["moco_loss"]))
    assert np.isfinite(float(metrics["attacked_img_loss"]))
    assert np.isfinite(float(metrics["attacked_txt_loss"]))
    assert float(metrics["pgd_delta"]) > 0  # PGD actually perturbed
    assert int(ts1.state["proj_queue_ptr"]) == 8
    # optimizer moved q; EMA kept k at old value (q==k at init, m<1 but
    # the EMA ran before the optimizer update)
    q1 = np.array(ts1.params["moco_head"]["projector"]["0"]["kernel"])
    assert not np.allclose(q0, q1)
    k1 = np.array(ts1.params["k_moco_head"]["projector"]["0"]["kernel"])
    np.testing.assert_allclose(k0, k1, atol=1e-6)

    # second step: EMA now pulls k towards the updated q
    ts2, _ = step_fn(ts1, batch, jax.random.PRNGKey(2))
    k2 = np.array(ts2.params["k_moco_head"]["projector"]["0"]["kernel"])
    assert not np.allclose(k1, k2)
    np.testing.assert_allclose(k2, k1 * 0.99 + q1 * 0.01, atol=1e-5)
    assert int(ts2.state["proj_queue_ptr"]) == 0  # wrapped 16-slot queue


def test_train_step_vqa():
    cfg = _tiny({"vqa": 1}, vqav2_label_size=13, lr_mult=10)
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, donate=False)
    b = make_fake_batch(cfg, batch=2)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    t = np.zeros((2, 13), np.float32)
    t[0, 3] = 1.0
    t[1, 5] = 0.6
    batch["vqa_targets"] = jnp.asarray(t)
    ts1, metrics = step_fn(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["vqa_loss"]))


def test_eval_step_returns_logits():
    cfg = _tiny({"nlvr2": 1})
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    ev = make_eval_step(cfg, model)
    b = make_fake_batch(cfg, batch=2)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["image_0"] = batch["image"]
    batch["image_1"] = jnp.asarray(make_fake_batch(cfg, seed=3)["image"])
    batch["answers"] = jnp.asarray([0, 1])
    ret = ev(ts.params, ts.state, batch, jax.random.PRNGKey(1))
    assert ret["nlvr2_logits"].shape == (2, 2)
    assert np.isfinite(float(ret["total_loss"]))


def test_frozen_leaves_not_updated_by_optimizer():
    """BatchNorm running stats + k_* twins receive zero optimizer updates."""
    cfg = _tiny({"barlowtwins": 1}, adv_lr=0.0051)
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, donate=False)
    b = make_fake_batch(cfg, batch=4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["attacked_text_ids"] = jnp.roll(batch["text_ids"], 1, axis=1)
    batch["attacked_text_masks"] = batch["text_masks"]

    cfg_tv = cfg.replace(text_view=True)
    step_fn = make_train_step(cfg_tv, model, tx, donate=False)
    ts1, metrics = step_fn(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["barlowtwins_loss"]))
    # running stats advanced functionally (not by adamw)
    rm0 = np.array(ts.params["barlowtwins_head"]["projector"]["1"]["running_mean"])
    rm1 = np.array(ts1.params["barlowtwins_head"]["projector"]["1"]["running_mean"])
    assert not np.allclose(rm0, rm1)


def test_tensor_parallel_step_4x2():
    """Megatron TP rules over a (data=4, model=2) mesh: fat matmuls are
    sharded on 'model', the step runs, and the loss matches the pure-DP
    layout (same math, different collectives)."""
    from rmcl_tpu.parallel.sharding_rules import param_shardings
    assert jax.device_count() >= 8
    cfg = _tiny({"moco": 1, "mlm": 1}, num_negative=16, momentum=0.99,
                temperature=0.07, warmup_steps=0)
    mesh_tp = make_mesh(jax.devices()[:8], shape=(4, 2),
                        axis_names=("data", "model"))
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg,
                                       mesh=mesh_tp)
    qkv = ts.params["transformer"]["blocks"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    fc2 = ts.params["transformer"]["blocks"]["mlp"]["fc2"]["kernel"]
    assert "model" in str(fc2.sharding.spec)
    dec = ts.params["mlm_score"]["decoder"]["kernel"]
    assert "model" in str(dec.sharding.spec)
    # momentum twins shard by the same rule
    kq = ts.params["k_transformer"]["blocks"]["attn"]["qkv"]["kernel"]
    assert "model" in str(kq.sharding.spec)

    step_tp = make_train_step(cfg, model, tx, mesh=mesh_tp, donate=False)
    b = make_fake_batch(cfg, batch=8)  # divisible by both data axes (4, 8)
    labels = np.full_like(b["text_ids"], -100)
    labels[:, 2] = b["text_ids"][:, 2]
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["text_ids_mlm"] = batch["text_ids"]
    batch["text_labels_mlm"] = jnp.asarray(labels)
    batch = shard_batch(batch, mesh_tp)
    ts1, m_tp = step_tp(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m_tp["total_loss"]))

    # pure-DP on the same seed: identical loss at step 0
    mesh_dp = make_mesh(jax.devices()[:8])
    model2, ts2, tx2 = create_train_state(jax.random.PRNGKey(0), cfg)
    step_dp = make_train_step(cfg, model2, tx2, mesh=mesh_dp, donate=False)
    b2 = {k: jnp.asarray(v) for k, v in b.items()}
    b2["text_ids_mlm"] = b2["text_ids"]
    b2["text_labels_mlm"] = jnp.asarray(labels)
    b2 = shard_batch(b2, mesh_dp)
    _, m_dp = step_dp(ts2, b2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_tp["total_loss"]),
                               float(m_dp["total_loss"]), rtol=1e-4)


def test_train_step_nlvr2_attacked_pgd_8dev():
    """Attacked NLVR2 finetune step: two-image PGD with attack_idx gating,
    clean+attacked CE summed (fixes the reference's crashing train
    branch), sharded over 8 devices."""
    assert jax.device_count() >= 8
    cfg = _tiny({"nlvr2_attacked": 1}, image_view=True,
                adv_steps_img=2, adv_lr_img=0.05, adv_max_norm_img=0.005,
                attack_idx=(True, False), warmup_steps=0)
    mesh = make_mesh(jax.devices()[:8])
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, mesh=mesh, donate=False)

    b = make_fake_batch(cfg, batch=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["image_0"] = batch.pop("image")
    batch["image_1"] = jnp.asarray(make_fake_batch(cfg, batch=8, seed=3)["image"])
    batch["answers"] = jnp.asarray(np.arange(8) % 2, jnp.int32)
    batch = shard_batch(batch, mesh)

    ts1, m = step_fn(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["nlvr2_original_loss"]))
    assert np.isfinite(float(m["nlvr2_attacked_loss"]))
    assert float(m["pgd_delta"]) > 0
    assert float(m["total_loss"]) == pytest.approx(
        float(m["nlvr2_original_loss"]) + float(m["nlvr2_attacked_loss"]),
        rel=1e-5)


def test_train_step_vqa_attacked_pgd():
    cfg = _tiny({"vqa_attacked": 1}, vqav2_label_size=7, image_view=True,
                adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
                warmup_steps=0)
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, model, tx, donate=False)
    b = make_fake_batch(cfg, batch=2)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    t = np.zeros((2, 7), np.float32)
    t[0, 1] = 1.0
    t[1, 2] = 0.9
    batch["vqa_targets"] = jnp.asarray(t)
    ts1, m = step_fn(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["vqa_attacked_loss"]))
    assert int(ts1.step) == 1


def _with_false_texts(batch, b, F, cfg, seed=7):
    """Attach false_text_{i}_ids/_masks the IRTR collator would emit."""
    r = np.random.RandomState(seed)
    T = cfg.max_text_len
    for i in range(F):
        ids = r.randint(5, cfg.vocab_size, (b, T)).astype(np.int32)
        masks = np.ones((b, T), np.int32)
        masks[:, T - 2:] = 0
        ids[masks == 0] = 0
        batch[f"false_text_{i}_ids"] = jnp.asarray(ids)
        batch[f"false_text_{i}_masks"] = jnp.asarray(masks)
    return batch


def test_train_step_irtr_8dev():
    """IRTR finetune step: 1 true + F false texts scored by rank_output
    (reference objectives.py:1180-1222), 8-device data parallel.  Covers
    the irtr_loss wiring in train/step.py:_TASK_LOSS_KEYS."""
    assert jax.device_count() >= 8
    F = 3
    cfg = _tiny({"irtr": 1, "itm": 0.5}, draw_false_text=F, warmup_steps=0)
    mesh = make_mesh(jax.devices()[:8])
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    assert "rank_output" in ts.params  # grafted from ITM head row 1
    step_fn = make_train_step(cfg, model, tx, mesh=mesh, donate=False)

    b = make_fake_batch(cfg, batch=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch = _with_false_texts(batch, 8, F, cfg)
    batch = shard_batch(batch, mesh)

    w0 = np.array(ts.params["rank_output"]["kernel"])
    ts1, m = step_fn(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["irtr_loss"]))
    assert 0.0 <= float(m["irtr_step_accuracy"]) <= 1.0
    # itm at weight 0.5 is INACTIVE as a task (reference gating >=1);
    # total loss must be exactly the irtr loss
    assert float(m["total_loss"]) == pytest.approx(float(m["irtr_loss"]),
                                                   rel=1e-6)
    # rank_output actually received gradient
    w1 = np.array(ts1.params["rank_output"]["kernel"])
    assert not np.allclose(w0, w1)


def test_train_step_irtr_attacked_8dev():
    """Attacked IRTR step: moco-head scoring of 1+F texts, PGD on the
    image toward the text projection, attacked text ids from host
    (repaired reference objectives.py:1062-1178 semantics)."""
    assert jax.device_count() >= 8
    F = 2
    cfg = _tiny({"irtr_attacked": 1}, draw_false_text=F, image_view=True,
                text_view=True, adv_steps_img=2, adv_lr_img=0.05,
                adv_max_norm_img=0.005, temperature=0.07, warmup_steps=0)
    mesh = make_mesh(jax.devices()[:8])
    model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    assert "moco_head" in ts.params
    step_fn = make_train_step(cfg, model, tx, mesh=mesh, donate=False)

    b = make_fake_batch(cfg, batch=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch = _with_false_texts(batch, 8, F, cfg)
    batch["attacked_text_ids"] = jnp.roll(batch["text_ids"], 1, axis=1)
    batch["attacked_text_masks"] = batch["text_masks"]
    batch = shard_batch(batch, mesh)

    ts1, m = step_fn(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["irtr_original_loss"]))
    assert np.isfinite(float(m["irtr_attacked_loss"]))
    # loss-key wiring: total = original + attacked
    assert float(m["total_loss"]) == pytest.approx(
        float(m["irtr_original_loss"]) + float(m["irtr_attacked_loss"]),
        rel=1e-5)


def test_irtr_fused_matches_unfused_broadcast():
    """The broadcast-visual_embed fast path scores identically to a
    per-text recompute (the reference's 16x recompute, :1198-1207)."""
    from rmcl_tpu.objectives.downstream import compute_irtr
    F = 2
    cfg = _tiny({"irtr": 1, "itm": 0.5}, draw_false_text=F)
    model, ts, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    b = make_fake_batch(cfg, batch=2)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch = _with_false_texts(batch, 2, F, cfg)

    ret = compute_irtr(model, ts.params, batch, train=False, false_len=F)
    # reference-style: run each (image, text_i) pair through model.infer
    from rmcl_tpu.models.heads import rank_output as rank_head
    cols = []
    texts = [("text_ids", "text_masks")] + [
        (f"false_text_{i}_ids", f"false_text_{i}_masks") for i in range(F)]
    for ids_k, masks_k in texts:
        one = dict(batch, text_ids=batch[ids_k], text_masks=batch[masks_k])
        inf = model.infer(ts.params, one, deterministic=True)
        cols.append(np.asarray(
            rank_head(ts.params["rank_output"], inf["cls_feats"])[:, 0]))
    expected = np.stack(cols, axis=1)
    np.testing.assert_allclose(np.asarray(ret["irtr_logits"]), expected,
                               rtol=2e-4, atol=2e-5)

@pytest.mark.parametrize("mesh_kind", ["dp8", "dp4xtp2"])
def test_attacked_train_step_one_program_8dev_mesh(tmp_path, mesh_kind):
    """The ONE-program attack+train step (while_loop + argmax + scatter
    inside pjit) compiles and runs over an 8-device data mesh — and
    over a 4x2 dp x tp Megatron mesh — with the word/candidate tables
    batch-sharded."""
    from rmcl_tpu.attacks.greedy import GreedyAttackMoco, SynonymTable
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
    from rmcl_tpu.data.tokenizer import WordPieceTokenizer, make_tiny_vocab
    from rmcl_tpu.train.step import make_attacked_train_step

    assert jax.device_count() >= 8
    words = ["dog", "puppy", "park", "garden", "runs", "sprints", "the"]
    vocab = str(tmp_path / "v.txt")
    make_tiny_vocab(vocab, words)
    tok = WordPieceTokenizer(vocab)
    rng_np = np.random.RandomState(0)
    emb = str(tmp_path / "e.txt")
    with open(emb, "w") as f:
        for group in (["dog", "puppy"], ["park", "garden"],
                      ["runs", "sprints"]):
            base = rng_np.randn(16)
            for w in group:
                v = base + 0.05 * rng_np.randn(16)
                f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
        f.write("the " + " ".join(f"{x:.5f}" for x in rng_np.randn(16))
                + "\n")

    extra = ({} if mesh_kind == "dp8"
             else dict(mesh_shape=(4, 2),
                       mesh_axis_names=("data", "model")))
    cfg = _tiny({"moco": 1}, vocab_size=tok.vocab_size, num_negative=16,
                momentum=0.99, text_view=True, image_view=True,
                adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
                warmup_steps=0, max_text_len=12, n_candidates=2,
                max_loops=2, **extra)
    if mesh_kind == "dp8":
        mesh = make_mesh(jax.devices()[:8])
        model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    else:
        mesh = make_mesh(jax.devices()[:8], shape=(4, 2),
                         axis_names=("data", "model"))
        model, ts, tx = create_train_state(jax.random.PRNGKey(0), cfg,
                                           mesh=mesh)
    syn = SynonymTable(emb, cfg.n_candidates, cfg.sim_thred)
    fused = FusedGreedyAttack(GreedyAttackMoco(cfg, model, tok, syn))
    step2 = make_attacked_train_step(cfg, model, tx, fused, mesh=mesh,
                                     donate=False)

    ids, masks = tok.batch_encode(
        ["dog runs the park"] * 4 + ["puppy sprints the garden"] * 4, 12)
    b = make_fake_batch(cfg, batch=8)
    batch = {
        "image": jnp.asarray(b["image"]),
        "text_ids": jnp.asarray(ids, jnp.int32),
        "text_masks": jnp.asarray(masks, jnp.int32),
        "text_labels": jnp.full_like(jnp.asarray(ids), -100),
    }
    batch.update({k: jnp.asarray(v)
                  for k, v in fused.prep_tables(ids).items()})
    batch = shard_batch(batch, mesh)

    ts1, metrics = step2(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["moco_loss"]))
    assert np.isfinite(float(metrics["attacked_txt_loss"]))
    assert float(metrics["num_changes"]) >= 0
    assert int(ts1.state["proj_queue_ptr"]) == 8


# ---------------------------------------------------- grad accumulation
def test_grad_accumulation_matches_big_batch():
    """N accumulated micro-steps == one Nx-batch optimizer step.

    The reference feeds `accumulate_grad_batches = batch_size //
    (per_gpu_batchsize * num_gpus * num_nodes)` to pl.Trainer
    (reference run.py:86-88,105); here optax.MultiSteps averages the
    micro-gradients.  MLM with one masked token per row makes the
    big-batch loss exactly the mean of the micro losses, so loss AND
    the post-cycle parameter update must match bit-for-nearly-bit.
    Runs on the 8-virtual-device data mesh."""
    assert jax.device_count() >= 8
    cfg = _tiny({"mlm": 1}, warmup_steps=0)
    mesh = make_mesh(jax.devices()[:8])
    model, ts_full, tx_full = create_train_state(jax.random.PRNGKey(0), cfg)
    _, ts_acc, tx_acc = create_train_state(jax.random.PRNGKey(0), cfg,
                                           accum=2)

    b = make_fake_batch(cfg, batch=16)
    labels = np.full_like(b["text_ids"], -100)
    labels[:, 2] = b["text_ids"][:, 2]
    full = {k: jnp.asarray(v) for k, v in b.items()}
    full["text_ids_mlm"] = full["text_ids"]
    full["text_labels_mlm"] = jnp.asarray(labels)
    halves = [{k: v[i * 8:(i + 1) * 8] for k, v in full.items()}
              for i in range(2)]

    step_full = make_train_step(cfg, model, tx_full, mesh=mesh, donate=False)
    step_acc = make_train_step(cfg, model, tx_acc, mesh=mesh, donate=False,
                               accum=2)

    rng = jax.random.PRNGKey(1)
    ts_f1, mf = step_full(ts_full, shard_batch(full, mesh), rng)

    w0 = np.array(
        ts_acc.params["transformer"]["blocks"]["attn"]["qkv"]["kernel"])
    ts_a1, m1 = step_acc(ts_acc, shard_batch(halves[0], mesh), rng)
    # mid-cycle: gradients buffered, params untouched
    np.testing.assert_allclose(w0, np.array(
        ts_a1.params["transformer"]["blocks"]["attn"]["qkv"]["kernel"]))
    ts_a2, m2 = step_acc(ts_a1, shard_batch(halves[1], mesh), rng)

    np.testing.assert_allclose(
        (float(m1["total_loss"]) + float(m2["total_loss"])) / 2,
        float(mf["total_loss"]), rtol=1e-5)
    # lr metric is indexed by optimizer step (micro-step // accum)
    assert float(m1["lr"]) == float(mf["lr"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.array(a), np.array(b), rtol=2e-4, atol=1e-6),
        ts_a2.params, ts_f1.params)


def test_checkpoint_rerun_same_workdir(tmp_path):
    """A fresh CheckpointManager pointed at an old workdir must not
    collide with the previous run's unique dirs (orbax refuses to
    overwrite an existing destination — seen re-running a job into the
    same log_dir: `Destination .../last.4-1 already exists`)."""
    from rmcl_tpu.train.checkpoint import CheckpointManager

    cfg = _tiny({"mlm": 1})
    _, ts, _ = create_train_state(jax.random.PRNGKey(0), cfg)

    cm1 = CheckpointManager(str(tmp_path))
    cm1.save_last(ts)
    cm1.wait()

    # Second run: same workdir, same step counter -> same (step, seq)
    # naming unless the sequence is resumed past what's on disk.
    cm2 = CheckpointManager(str(tmp_path))
    cm2.save_last(ts)
    cm2.wait()
    restored = cm2.restore(ts, "last")
    assert int(restored.step) == int(ts.step)

    # Orphan directory (crash between save and pointer swing) must be
    # skipped, not crashed into.
    import os
    orphan = os.path.join(str(tmp_path), f"last.{int(ts.step)}-{cm2._seq + 1}")
    os.makedirs(orphan)
    cm2.save_last(ts)
    cm2.wait()
    assert cm2.has("last")


def test_zero1_optimizer_sharding_matches_replicated():
    """ZeRO-1 (`cfg.zero1`: AdamW m/v sharded over the data axis,
    parallel/sharding_rules.py:zero1_shardings) is a pure layout
    change: params and MoCo state after 3 full RMCL steps match the
    replicated baseline, and the eligible optimizer leaves really are
    dim-0-sharded."""
    assert jax.device_count() >= 8
    from jax.sharding import PartitionSpec as P

    cfg = _tiny({"moco": 1}, num_negative=16, momentum=0.99,
                temperature=0.07, image_view=True, text_view=True,
                adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
                warmup_steps=0)
    mesh = make_mesh(jax.devices()[:8])
    b = make_fake_batch(cfg, batch=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["attacked_text_ids"] = jnp.roll(batch["text_ids"], 1, axis=1)
    batch["attacked_text_masks"] = batch["text_masks"]

    def run(zero1):
        c = cfg.replace(zero1=zero1)
        model, ts, tx = create_train_state(
            jax.random.PRNGKey(0), c, mesh=mesh if zero1 else None)
        step_fn = make_train_step(c, model, tx, mesh=mesh, donate=False)
        sb = shard_batch(batch, mesh)
        for i in range(3):
            ts, m = step_fn(ts, sb, jax.random.PRNGKey(10 + i))
        return ts, m

    base_ts, base_m = run(False)
    z1_ts, z1_m = run(True)

    np.testing.assert_allclose(float(z1_m["moco_loss"]),
                               float(base_m["moco_loss"]), rtol=1e-5)
    jax.tree.map(lambda a, b_: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b_), atol=1e-5),
        base_ts.params, z1_ts.params)
    jax.tree.map(lambda a, b_: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b_), atol=1e-5),
        base_ts.state, z1_ts.state)

    # every eligible leaf (dim0 divisible by 8) is data-sharded, and the
    # layout survived three donated-step round trips
    n_sharded = 0
    for leaf in jax.tree.leaves(z1_ts.opt_state):
        if leaf.ndim >= 1 and leaf.shape and leaf.shape[0] % 8 == 0 and leaf.shape[0] >= 8:
            assert leaf.sharding.spec == P("data"), (leaf.shape, leaf.sharding)
            n_sharded += 1
    assert n_sharded > 10  # m, v and every param-shaped buffer


def test_production_multichip_zero1_shardmap_attack_parity(
        tmp_path, monkeypatch):
    """The COMBINED production multi-chip configuration — ZeRO-1
    optimizer sharding + shard_map'd fused Pallas kernels + the
    ONE-program greedy-attack+train step — runs TOGETHER over an
    8-device data mesh and matches the plain-DP one-program path.

    Round-3 coverage validated each piece separately; composition bugs
    (zero1's sharded optimizer update meeting shard_map's psum
    transpose inside the attack while_loop) are exactly what piecewise
    tests miss.  Parity: per-step losses, committed substitution
    counts (token-id-sensitive), and final params/state."""
    from rmcl_tpu.attacks.greedy import GreedyAttackMoco, SynonymTable
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
    from rmcl_tpu.data.tokenizer import WordPieceTokenizer, make_tiny_vocab
    from rmcl_tpu.train.step import make_attacked_train_step
    from jax.sharding import PartitionSpec as P

    assert jax.device_count() >= 8
    monkeypatch.setenv("RMCL_PALLAS_INTERPRET", "1")

    words = ["dog", "puppy", "park", "garden", "runs", "sprints", "the"]
    vocab = str(tmp_path / "v.txt")
    make_tiny_vocab(vocab, words)
    tok = WordPieceTokenizer(vocab)
    rng_np = np.random.RandomState(0)
    emb = str(tmp_path / "e.txt")
    with open(emb, "w") as f:
        for group in (["dog", "puppy"], ["park", "garden"],
                      ["runs", "sprints"], ["the"]):
            base = rng_np.randn(16)
            for w in group:
                v = base + 0.05 * rng_np.randn(16)
                f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")

    cfg = _tiny({"moco": 1}, vocab_size=tok.vocab_size, num_negative=16,
                momentum=0.99, text_view=True, image_view=True,
                adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
                warmup_steps=0, max_text_len=12, n_candidates=2,
                max_loops=2)
    mesh = make_mesh(jax.devices()[:8])
    syn = SynonymTable(emb, cfg.n_candidates, cfg.sim_thred)

    ids, masks = tok.batch_encode(
        ["dog runs the park"] * 4 + ["puppy sprints the garden"] * 4, 12)
    b = make_fake_batch(cfg, batch=8)
    base_batch = {
        "image": jnp.asarray(b["image"]),
        "text_ids": jnp.asarray(ids, jnp.int32),
        "text_masks": jnp.asarray(masks, jnp.int32),
        "text_labels": jnp.full_like(jnp.asarray(ids), -100),
    }

    def run(production):
        c = cfg.replace(zero1=production)
        if production:
            c = c.replace(attention_impl="fused", mlp_impl="fused")
        model, ts, tx = create_train_state(
            jax.random.PRNGKey(0), c, mesh=mesh if production else None)
        if production:
            assert model.spec.shard_mesh is not None, \
                "production config must route kernels through shard_map"
        fused = FusedGreedyAttack(GreedyAttackMoco(c, model, tok, syn))
        step = make_attacked_train_step(c, model, tx, fused, mesh=mesh,
                                        donate=False)
        batch = dict(base_batch)
        batch.update({k: jnp.asarray(v) for k, v in
                      fused.prep_tables(np.asarray(ids)).items()})
        batch = shard_batch(batch, mesh)
        ms = []
        for i in range(2):
            ts, m = step(ts, batch, jax.random.PRNGKey(7 + i))
            ms.append(m)
        return ts, ms

    base_ts, base_ms = run(False)
    prod_ts, prod_ms = run(True)

    for mb, mp in zip(base_ms, prod_ms):
        # committed substitutions are token-id-sensitive: an argmax flip
        # from kernel numerics would show up here first
        assert float(mb["num_changes"]) == float(mp["num_changes"])
        np.testing.assert_allclose(float(mp["moco_loss"]),
                                   float(mb["moco_loss"]),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(float(mp["attacked_txt_loss"]),
                                   float(mb["attacked_txt_loss"]),
                                   rtol=5e-4, atol=5e-5)
    jax.tree.map(lambda a, b_: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b_), atol=5e-4),
        base_ts.params, prod_ts.params)
    jax.tree.map(lambda a, b_: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b_), atol=5e-4),
        base_ts.state, prod_ts.state)

    # zero1 actually sharded the optimizer state in the combined program
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(prod_ts.opt_state)
        if leaf.ndim >= 1 and leaf.shape and leaf.shape[0] % 8 == 0
        and leaf.shape[0] >= 8 and leaf.sharding.spec == P("data"))
    assert n_sharded > 10
