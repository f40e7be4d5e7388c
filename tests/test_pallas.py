"""Pallas attention kernels in interpreter mode (CPU): forward + backward
parity vs the XLA path.  Real-TPU compilation is exercised by bench.py
(see .claude/skills/verify/SKILL.md)."""

import os

os.environ["RMCL_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmcl_tpu.ops.attention import mha_xla, mha_xla_bf16
from rmcl_tpu.ops.pallas_attention import flash_masked_attention


@pytest.fixture(scope="module")
def qkvm():
    B, H, S, D = 2, 2, 37, 16
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(r.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(r.randn(B, H, S, D), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.3).astype(np.int32))
    return q, k, v, mask, 16 ** -0.5


def test_pallas_forward_matches_xla(qkvm):
    q, k, v, mask, scale = qkvm
    ours = flash_masked_attention(q, k, v, mask, scale)
    ref = mha_xla(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5)


def test_pallas_backward_matches_xla(qkvm):
    q, k, v, mask, scale = qkvm

    def lp(q, k, v):
        return jnp.sum(jnp.sin(flash_masked_attention(q, k, v, mask, scale)))

    def lx(q, k, v):
        return jnp.sum(jnp.sin(mha_xla(q, k, v, mask, scale)))

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_xla_bf16_close_to_fp32(qkvm):
    """bf16-materialised scores/probs stay within bf16 rounding of the
    fp32 path (forward and input grads)."""
    q, k, v, mask, scale = qkvm
    ours = mha_xla_bf16(q, k, v, mask, scale)
    ref = mha_xla(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    gb = jax.grad(lambda *a: jnp.sum(jnp.sin(mha_xla_bf16(*a, mask, scale))),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum(jnp.sin(mha_xla(*a, mask, scale))),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gb, gx):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 0.15, err  # bf16 S² rounding, not a wrong gradient


def test_xla_bf16_padded_positions_ignored(qkvm):
    q, k, v, mask, scale = qkvm
    out1 = mha_xla_bf16(q, k, v, mask, scale)
    v2 = jnp.where(mask[:, None, :, None] > 0, v, 123.0)
    k2 = jnp.where(mask[:, None, :, None] > 0, k, -55.0)
    out2 = mha_xla_bf16(q, k2, v2, mask, scale)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-2)


def test_pallas_padded_positions_ignored(qkvm):
    """Key positions with mask==0 must not influence any output row."""
    q, k, v, mask, scale = qkvm
    out1 = flash_masked_attention(q, k, v, mask, scale)
    v2 = jnp.where(mask[:, None, :, None] > 0, v, 123.0)  # poison pad keys
    k2 = jnp.where(mask[:, None, :, None] > 0, k, -55.0)
    out2 = flash_masked_attention(q, k2, v2, mask, scale)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-5)


# ------------------------------------------------- fused attention block
@pytest.fixture(scope="module")
def block_inputs():
    B, S, C, H = 2, 37, 32, 4
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.3).astype(np.int32))
    ln_w = jnp.asarray(1.0 + 0.1 * r.randn(C), jnp.float32)
    ln_b = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    wqkv = jnp.asarray(r.randn(C, 3 * C) * 0.05, jnp.float32)
    bqkv = jnp.asarray(r.randn(3 * C) * 0.05, jnp.float32)
    wproj = jnp.asarray(r.randn(C, C) * 0.05, jnp.float32)
    bproj = jnp.asarray(r.randn(C) * 0.05, jnp.float32)
    return x, mask, ln_w, ln_b, wqkv, bqkv, wproj, bproj, H


def test_fused_block_matches_xla(block_inputs):
    """Fused LN1+qkv+attention+proj kernel == the XLA twin (which is
    itself the block_forward math, reference vision_transformer.py:
    335-376)."""
    from rmcl_tpu.ops.pallas_block import _xla_twin, fused_attn_half
    x, mask, lw, lb, wq, bq, wp, bp, H = block_inputs
    C = x.shape[-1]
    scale = (C // H) ** -0.5
    ours = fused_attn_half(x, mask, lw, lb, wq, bq, wp, bp, H, scale,
                           1e-12)
    ref = _xla_twin(x, mask, lw, lb, wq, bq, wp, bp, H, scale, 1e-12)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5)


def test_fused_block_grads_match_xla(block_inputs):
    """custom_vjp backward (XLA-twin vjp) == direct autodiff of the
    twin, for x and every weight."""
    from rmcl_tpu.ops.pallas_block import _xla_twin, fused_attn_half
    x, mask, lw, lb, wq, bq, wp, bp, H = block_inputs
    C = x.shape[-1]
    scale = (C // H) ** -0.5

    def loss_fused(x, lw, lb, wq, bq, wp, bp):
        return jnp.sum(fused_attn_half(x, mask, lw, lb, wq, bq, wp, bp,
                                       H, scale, 1e-12) ** 2)

    def loss_ref(x, lw, lb, wq, bq, wp, bp):
        return jnp.sum(_xla_twin(x, mask, lw, lb, wq, bq, wp, bp,
                                 H, scale, 1e-12) ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(
        x, lw, lb, wq, bq, wp, bp)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(
        x, lw, lb, wq, bq, wp, bp)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_fused_block_det_grads_match_xla(block_inputs):
    """fused_attn_half_det (dx-only Pallas bwd + DCE-able XLA weight
    grads) == direct autodiff of the twin, for x and every weight."""
    from rmcl_tpu.ops.pallas_block import _xla_twin, fused_attn_half_det
    x, mask, lw, lb, wq, bq, wp, bp, H = block_inputs
    C = x.shape[-1]
    scale = (C // H) ** -0.5

    def loss_fused(x, lw, lb, wq, bq, wp, bp):
        return jnp.sum(fused_attn_half_det(x, mask, lw, lb, wq, bq, wp,
                                           bp, H, scale, 1e-12) ** 2)

    def loss_ref(x, lw, lb, wq, bq, wp, bp):
        return jnp.sum(_xla_twin(x, mask, lw, lb, wq, bq, wp, bp,
                                 H, scale, 1e-12) ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(
        x, lw, lb, wq, bq, wp, bp)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(
        x, lw, lb, wq, bq, wp, bp)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_fused_block_in_model_forward():
    """attention_impl='fused' through the full block_forward matches the
    default path (same params, same rng)."""
    from rmcl_tpu.models.vit import ViTSpec, block_forward, init_block
    C, H, B, S = 32, 4, 2, 23
    spec = ViTSpec(hidden_size=C, num_heads=H, drop_rate=0.0,
                   use_pallas=False, attn_impl="")
    spec_f = spec._replace(attn_impl="fused")
    bp = init_block(jax.random.PRNGKey(0), spec)
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.2).astype(np.int32))
    ref = block_forward(bp, x, mask, spec=spec, deterministic=True)
    out = block_forward(bp, x, mask, spec=spec_f, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


# ------------------------------------------------------ fused MLP half
@pytest.fixture(scope="module")
def mlp_inputs():
    B, S, C = 2, 37, 32
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    ln_w = jnp.asarray(1.0 + 0.1 * r.randn(C), jnp.float32)
    ln_b = jnp.asarray(0.1 * r.randn(C), jnp.float32)
    w1 = jnp.asarray(r.randn(C, 4 * C) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.randn(4 * C) * 0.05, jnp.float32)
    w2 = jnp.asarray(r.randn(4 * C, C) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.randn(C) * 0.05, jnp.float32)
    return x, ln_w, ln_b, w1, b1, w2, b2


def test_fused_mlp_matches_xla(mlp_inputs):
    """Fused LN2+fc1+gelu+fc2 kernel == the XLA twin (which is itself
    the block_forward MLP-half math with dropout a no-op)."""
    from rmcl_tpu.ops.pallas_block import _mlp_twin, fused_mlp_half
    x, lw, lb, w1, b1, w2, b2 = mlp_inputs
    ours = fused_mlp_half(x, lw, lb, w1, b1, w2, b2, 1e-12)
    ref = _mlp_twin(x, lw, lb, w1, b1, w2, b2, 1e-12)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5)


def test_fused_mlp_grads_match_xla(mlp_inputs):
    """custom_vjp backward (XLA-twin vjp) == direct autodiff of the
    twin, for x and every weight."""
    from rmcl_tpu.ops.pallas_block import _mlp_twin, fused_mlp_half
    x, lw, lb, w1, b1, w2, b2 = mlp_inputs

    def loss_fused(x, lw, lb, w1, b1, w2, b2):
        return jnp.sum(fused_mlp_half(x, lw, lb, w1, b1, w2, b2,
                                      1e-12) ** 2)

    def loss_ref(x, lw, lb, w1, b1, w2, b2):
        return jnp.sum(_mlp_twin(x, lw, lb, w1, b1, w2, b2, 1e-12) ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(
        x, lw, lb, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(
        x, lw, lb, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_fused_mlp_in_model_forward():
    """mlp_impl='fused' through block_forward matches the default path
    on a deterministic forward, and is bypassed when training dropout
    is active (gating keeps the RNG stream identical)."""
    from rmcl_tpu.models.vit import ViTSpec, block_forward, init_block
    C, H, B, S = 32, 4, 2, 23
    spec = ViTSpec(hidden_size=C, num_heads=H, drop_rate=0.1,
                   use_pallas=False, attn_impl="")
    spec_f = spec._replace(mlp_impl="fused")
    bp = init_block(jax.random.PRNGKey(0), spec)
    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.2).astype(np.int32))
    ref = block_forward(bp, x, mask, spec=spec, deterministic=True)
    out = block_forward(bp, x, mask, spec=spec_f, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)
    # training forward: fused path must be bypassed -> bit-identical
    rng = jax.random.PRNGKey(7)
    ref_t = block_forward(bp, x, mask, spec=spec, rng=rng,
                          deterministic=False)
    out_t = block_forward(bp, x, mask, spec=spec_f, rng=rng,
                          deterministic=False)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(ref_t))


def test_transformer_hoisted_pad_matches_xla():
    """transformer_apply pads the residual stream to the kernels'
    128-row alignment ONCE (models/vit.py) instead of per pallas_call;
    the first S rows must match the unfused XLA stack exactly on a
    deterministic forward at an unaligned S."""
    from rmcl_tpu.models.vit import ViTSpec, init_vit, transformer_apply
    C, H, B, S = 32, 4, 2, 23
    spec = ViTSpec(hidden_size=C, num_heads=H, num_layers=3,
                   drop_rate=0.0, use_pallas=False, attn_impl="")
    spec_f = spec._replace(attn_impl="fused", mlp_impl="fused")
    params = init_vit(jax.random.PRNGKey(0), spec)
    r = np.random.RandomState(5)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.2).astype(np.int32))
    ref = transformer_apply(params, x, mask, spec=spec,
                            deterministic=True)
    out = transformer_apply(params, x, mask, spec=spec_f,
                            deterministic=True)
    assert out.shape == ref.shape == (B, S, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5)


def test_shard_map_fused_transformer_matches_xla():
    """Pure-DP multi-chip path: spec.shard_mesh routes the fused
    kernels per-shard via jax.shard_map (models/vit.py).  On the
    8-virtual-device CPU mesh in interpret mode, the deterministic
    forward and ALL gradients (dx + psum'd replicated-param
    cotangents) must match the unsharded XLA block path."""
    from rmcl_tpu.models.vit import ViTSpec, init_vit, transformer_apply
    from rmcl_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8
    C, H, B, S = 32, 4, 8, 23
    spec = ViTSpec(hidden_size=C, num_heads=H, num_layers=2,
                   drop_rate=0.0, use_pallas=False, attn_impl="")
    spec_f = spec._replace(attn_impl="fused", mlp_impl="fused",
                           shard_mesh=mesh)
    params = init_vit(jax.random.PRNGKey(0), spec)
    r = np.random.RandomState(6)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.2).astype(np.int32))

    ref = transformer_apply(params, x, mask, spec=spec,
                            deterministic=True)
    out = transformer_apply(params, x, mask, spec=spec_f,
                            deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5)

    def make_loss(sp):
        def loss(params, x):
            o = transformer_apply(params, x, mask, spec=sp,
                                  deterministic=True)
            return jnp.sum(o ** 2)
        return loss

    gp_ref, gx_ref = jax.grad(make_loss(spec), argnums=(0, 1))(params, x)
    gp_f, gx_f = jax.grad(make_loss(spec_f), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref),
                               atol=2e-4, rtol=1e-4)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp_f),
            jax.tree_util.tree_leaves_with_path(gp_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3,
            err_msg=str(pa))


def test_shard_map_fallback_non_divisible_batch():
    """Batches not divisible by the data axis (greedy compact stages)
    fall back to the XLA block path — same deterministic numerics."""
    from rmcl_tpu.models.vit import ViTSpec, init_vit, transformer_apply
    from rmcl_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    C, H, B, S = 32, 4, 3, 23          # 3 % 8 != 0
    spec = ViTSpec(hidden_size=C, num_heads=H, num_layers=2,
                   drop_rate=0.0, use_pallas=False, attn_impl="")
    spec_f = spec._replace(attn_impl="fused", mlp_impl="fused",
                           shard_mesh=mesh)
    params = init_vit(jax.random.PRNGKey(1), spec)
    r = np.random.RandomState(7)
    x = jnp.asarray(r.randn(B, S, C), jnp.float32)
    mask = jnp.asarray((r.rand(B, S) > 0.2).astype(np.int32))
    ref = transformer_apply(params, x, mask, spec=spec,
                            deterministic=True)
    out = transformer_apply(params, x, mask, spec=spec_f,
                            deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5)
