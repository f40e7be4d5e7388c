"""Objective-layer tests: losses vs torch, IPOT properties, task objectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.models.vilt import ViLTModel, init_vilt
from rmcl_tpu.objectives.contrastive import (
    compute_barlowtwins_contrastive, compute_moco_contrastive,
    dequeue_and_enqueue, infonce, momentum_update)
from rmcl_tpu.objectives.losses import bce_with_logits, cross_entropy
from rmcl_tpu.objectives.ot import cost_matrix_cosine, ipot, optimal_transport_dist
from rmcl_tpu.objectives.pretrain import compute_itm_wpa, compute_mlm, compute_mpp
from tests.conftest import make_fake_batch


def _moco_cfg():
    return build_config(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names({"moco": 1}), num_negative=16,
        momentum=0.999, temperature=0.07,
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0)


def test_cross_entropy_matches_torch():
    import torch

    logits = np.random.RandomState(0).randn(12, 7).astype(np.float32)
    labels = np.random.RandomState(1).randint(0, 7, 12)
    labels[3] = -100
    labels[9] = -100
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    theirs = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), ignore_index=-100)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_bce_matches_torch():
    import torch

    logits = np.random.RandomState(0).randn(4, 9).astype(np.float32)
    targets = np.random.RandomState(1).uniform(0, 1, (4, 9)).astype(np.float32)
    ours = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))
    theirs = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_ipot_plan_properties():
    r = np.random.RandomState(0)
    B, M, N = 2, 6, 8
    x = r.randn(B, M, 16).astype(np.float32)
    y = r.randn(B, N, 16).astype(np.float32)
    x_pad = np.zeros((B, M), bool)
    y_pad = np.zeros((B, N), bool)
    x_pad[0, 4:] = True
    y_pad[0, 6:] = True
    jp = x_pad[:, :, None] | y_pad[:, None, :]

    C = np.array(cost_matrix_cosine(jnp.asarray(x), jnp.asarray(y)))
    C[jp] = 0.0
    xl = (M - x_pad.sum(1)).astype(np.float32)
    yl = (N - y_pad.sum(1)).astype(np.float32)
    T = np.asarray(ipot(jnp.asarray(C), jnp.asarray(xl), jnp.asarray(x_pad),
                        jnp.asarray(yl), jnp.asarray(y_pad), jnp.asarray(jp),
                        0.5, 50, 1))
    assert T.shape == (B, N, M)
    # padded positions carry no mass
    assert np.all(T[0, 6:, :] == 0)
    assert np.all(T[0, :, 4:] == 0)
    assert np.all(T >= 0)
    # total mass ~ 1 for an OT plan between prob. simplexes
    mass = T.sum(axis=(1, 2))
    np.testing.assert_allclose(mass, np.ones(B), atol=0.2)

    dist = np.asarray(optimal_transport_dist(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(x_pad), jnp.asarray(y_pad)))
    assert dist.shape == (B,)
    assert np.all(np.isfinite(dist))


def test_compute_mlm(tiny_cfg):
    cfg = tiny_cfg.replace(loss_names=loss_names({"mlm": 1}))
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    b = make_fake_batch(cfg)
    labels = np.full_like(b["text_ids"], -100)
    labels[:, 2] = b["text_ids"][:, 2]
    batch = {
        **{k: jnp.asarray(v) for k, v in b.items()},
        "text_ids_mlm": jnp.asarray(b["text_ids"]),
        "text_labels_mlm": jnp.asarray(labels),
    }
    ret = jax.jit(lambda p, bb: compute_mlm(model, p, bb))(params, batch)
    assert np.isfinite(float(ret["mlm_loss"]))
    assert ret["mlm_logits"].shape == (2, cfg.max_text_len, cfg.vocab_size)


def test_compute_mpp(tiny_cfg):
    cfg = tiny_cfg.replace(loss_names=loss_names({"mpp": 1}))
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg).items()}
    ret = jax.jit(lambda p, bb, r: compute_mpp(model, p, bb, rng=r))(
        params, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(ret["mpp_loss"]))
    assert ret["mpp_logits"].shape[-2:] == (3, 256)


def test_compute_itm_wpa(tiny_cfg):
    cfg = tiny_cfg.replace(loss_names=loss_names({"itm": 1}))
    model = ViLTModel(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    b = make_fake_batch(cfg)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["false_image_0"] = jnp.asarray(
        make_fake_batch(cfg, seed=7)["image"])
    ret = jax.jit(lambda p, bb, r: compute_itm_wpa(
        model, p, bb, rng=r, ot_iterations=10))(
        params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(ret["itm_loss"]))
    assert np.isfinite(float(ret["itm_wpa_loss"]))
    assert ret["itm_logits"].shape == (2, 2)


def test_momentum_update_moves_towards_query():
    cfg = _moco_cfg()
    params, _ = init_vilt(jax.random.PRNGKey(0), cfg)
    # perturb query side
    params["moco_head"] = jax.tree.map(lambda x: x + 1.0, params["moco_head"])
    new = momentum_update(params, 0.9)
    q = params["moco_head"]["projector"]["0"]["kernel"]
    k_old = params["k_moco_head"]["projector"]["0"]["kernel"]
    k_new = new["k_moco_head"]["projector"]["0"]["kernel"]
    np.testing.assert_allclose(np.array(k_new),
                               np.array(k_old * 0.9 + q * 0.1), rtol=1e-5)


def test_queue_circular_write():
    K, C, B = 16, 4, 4
    state = {"proj_queue": jnp.zeros((C, K)),
             "proj_queue_ptr": jnp.zeros((), jnp.int32)}
    keys = jnp.ones((B, C))
    s1 = dequeue_and_enqueue(state, keys, B)
    assert int(s1["proj_queue_ptr"]) == 4
    np.testing.assert_array_equal(np.array(s1["proj_queue"][:, :4]), 1.0)
    np.testing.assert_array_equal(np.array(s1["proj_queue"][:, 4:]), 0.0)
    # wrap
    s = s1
    for _ in range(3):
        s = dequeue_and_enqueue(s, 2 * keys, B)
    assert int(s["proj_queue_ptr"]) == 0
    # partial batch skipped
    s2 = dequeue_and_enqueue(s1, keys[:2], B)
    assert s2 is s1 or int(s2["proj_queue_ptr"]) == int(s1["proj_queue_ptr"])


def test_infonce_prefers_positive():
    q = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    k = q
    queue = jnp.asarray(np.random.RandomState(0).randn(8, 16) * 0.01,
                        dtype=jnp.float32)
    loss, logits = infonce(q, k, queue, 0.07)
    assert float(loss) < 0.1
    assert logits.shape == (4, 17)


def test_moco_step_end_to_end():
    cfg = _moco_cfg()
    model = ViLTModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg).items()}

    def step(p, s, bb, r):
        return compute_moco_contrastive(
            model, p, s, bb, rng=r, train=True,
            text_view=False, image_view=False,
            temperature=cfg.temperature, momentum=cfg.momentum,
            per_step_bs=2)

    ret, new_params, new_state = jax.jit(step)(
        params, state, b, jax.random.PRNGKey(1))
    # no views configured -> moco_loss is 0/1 == 0, but queue must advance
    assert int(new_state["proj_queue_ptr"]) == 2
    # EMA moved k towards q? equal at init, so k stays equal
    np.testing.assert_allclose(
        np.array(new_params["k_moco_head"]["projector"]["0"]["kernel"]),
        np.array(params["moco_head"]["projector"]["0"]["kernel"]), atol=1e-6)


def test_barlowtwins_step():
    cfg = build_config(
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, loss_names=loss_names({"barlowtwins": 1}),
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0)
    model = ViLTModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg, batch=4).items()}
    at = {"text_ids": b["text_ids"], "text_masks": b["text_masks"]}

    ret, _, new_state = jax.jit(lambda p, s, bb, r: compute_barlowtwins_contrastive(
        model, p, s, bb, rng=r, train=True, text_view=True,
        attacked_text=at, adv_lr=0.0051, per_step_bs=4))(
        params, state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(ret["barlowtwins_loss"]))
    assert "bt_bn_stats" in new_state


def test_moco_fused_views_match_unfused():
    """The 4B fused-view fast path must produce the same losses as the
    per-view forwards (deterministic, dropout off)."""
    cfg = _moco_cfg().replace(num_negative=8)
    model = ViLTModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    b = {k: jnp.asarray(v) for k, v in make_fake_batch(cfg, batch=2).items()}
    at = {"text_ids": jnp.roll(b["text_ids"], 1, axis=1),
          "text_masks": b["text_masks"]}

    def run(fuse):
        return compute_moco_contrastive(
            model, params, state, b, rng=jax.random.PRNGKey(1),
            train=False, text_view=True, image_view=False,
            attacked_text=at, temperature=cfg.temperature,
            momentum=cfg.momentum, per_step_bs=2, fuse_views=fuse)

    r0, _, _ = jax.jit(lambda: run(False))()
    r1, _, _ = jax.jit(lambda: run(True))()
    np.testing.assert_allclose(float(r0["moco_loss"]),
                               float(r1["moco_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(r0["attacked_txt_loss"]),
                               float(r1["attacked_txt_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(r0["geom_success_rate"]),
                               float(r1["geom_success_rate"]), atol=1e-6)
    np.testing.assert_allclose(float(r0["pos_cosine_attacked_txt"]),
                               float(r1["pos_cosine_attacked_txt"]),
                               rtol=1e-5)


def test_bt_correlation_loss_gram_matches_explicit():
    """Round-5 BT loss redesign: the rank-structured (B, B)-Gram form
    must match the reference's explicit (D, D) correlation-matrix form
    (objectives.py:476-482) to fp32 summation-order tolerance, for
    B < D and B >= D and through gradients (the PGD attack
    differentiates this loss w.r.t. the image)."""
    import jax
    from rmcl_tpu.objectives.contrastive import (
        _off_diagonal_sumsq, bt_correlation_loss)

    def explicit(q, k, psb, lam):
        c = (q.astype(jnp.float32).T @ k.astype(jnp.float32)) / psb
        on = jnp.sum((jnp.diagonal(c) - 1.0) ** 2)
        off = _off_diagonal_sumsq(c)
        return on + lam * off

    r = np.random.RandomState(0)
    for B, D in ((4, 64), (64, 4)):
        q = jnp.asarray(r.randn(B, D).astype(np.float32))
        k = jnp.asarray(r.randn(B, D).astype(np.float32))
        got, on, off = bt_correlation_loss(q, k, B, 0.0051)
        want = explicit(q, k, B, 0.0051)
        np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
        np.testing.assert_allclose(float(on + off), float(got), rtol=1e-6)

        g1 = jax.grad(lambda q_: bt_correlation_loss(q_, k, B, 0.0051)[0])(q)
        g2 = jax.grad(lambda q_: explicit(q_, k, B, 0.0051))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-6)
