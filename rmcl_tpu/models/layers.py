"""Pure-functional NN primitives over plain dict pytrees.

Params are nested dicts of jnp arrays.  Linear kernels are stored in JAX
layout (in_features, out_features); the torch-checkpoint converter
(rmcl_tpu/compat/torch_loader.py) transposes on load.

Initialisation matches the reference's `init_weights`
(reference vilt/modules/objectives.py:1505-1516): trunc-normal(0.02) for
linear/embedding weights, zero biases, LayerNorm weight=1 bias=0.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

INIT_STD = 0.02


def trunc_normal(key, shape, std=INIT_STD, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ----------------------------------------------------------------- linear
def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, std=INIT_STD):
    p = {"kernel": trunc_normal(key, (in_dim, out_dim), std=std)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# -------------------------------------------------------------- layernorm
def layer_norm_init(dim: int):
    return {"weight": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-12):
    """LayerNorm in fp32 regardless of activation dtype (numerics on TPU)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(dtype)


# -------------------------------------------------------------- embedding
def embedding_init(key, num: int, dim: int, std=INIT_STD):
    return {"weight": trunc_normal(key, (num, dim), std=std)}


def embedding(p, ids):
    return jnp.take(p["weight"], ids, axis=0)


# ---------------------------------------------------------------- dropout
def dropout(x, rate: float, rng: Optional[jax.Array], deterministic: bool,
            impl: str = "fp32"):
    """Inverted dropout.  `impl` picks how the keep-mask bits are drawn:

    - "fp32": jax.random.bernoulli — the straightforward path.  With
      partitionable threefry (jax default) this costs TWO threefry2x32
      words per element; at ViLT-B b16 that's ~430M words per train
      forward, replayed again under remat — measurable VPU time.
    - "pack8": draw n/4 uint32 threefry words and use each byte as an
      independent 8-bit lane (8× fewer words than fp32).  The keep
      probability quantises to t/256 (t = round(keep*256)); the
      inverse-scale uses the QUANTISED probability, so E[dropout(x)] = x
      exactly — only the rate moves (0.1 -> 0.1016), within training
      noise.  Lane independence is a threefry bit-quality guarantee.
    - "rbg": XLA RngBitGenerator (hardware RNG on TPU) via a key
      re-wrapped from the threefry key data; identical math to "fp32"
      otherwise.  Not reproducible across backends/compiler versions —
      fine for dropout, never used for data sampling.

    The reference (torch nn.Dropout, CUDA Philox) has a different RNG
    stream in every case; only the marginal rate is contract (PARITY.md).
    """
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    if impl == "pack8":
        n = int(np.prod(x.shape))
        words = jax.random.bits(rng, ((n + 3) // 4,), jnp.uint32)
        lanes = jax.lax.bitcast_convert_type(
            words, jnp.uint8).reshape(-1)[:n].reshape(x.shape)
        t = max(1, min(255, int(round(keep * 256.0))))
        return jnp.where(lanes < jnp.uint8(t), x * (256.0 / t), 0.0
                         ).astype(x.dtype)
    if impl == "rbg":
        key = jax.random.wrap_key_data(
            jnp.concatenate([rng, rng]).astype(jnp.uint32), impl="rbg")
        mask = jax.random.bernoulli(key, keep, x.shape)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# -------------------------------------------------------------- batchnorm
def batch_norm_init(dim: int, affine: bool = True):
    p = {"running_mean": jnp.zeros((dim,), jnp.float32),
         "running_var": jnp.ones((dim,), jnp.float32)}
    if affine:
        p["weight"] = jnp.ones((dim,), jnp.float32)
        p["bias"] = jnp.zeros((dim,), jnp.float32)
    return p


def batch_norm(p, x, training: bool, momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm1d over (B, C).  Returns (y, new_stats)."""
    x32 = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(x32, axis=0)
        var = jnp.var(x32, axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "running_mean": (1 - momentum) * p["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * p["running_var"] + momentum * unbiased,
        }
    else:
        mean, var = p["running_mean"], p["running_var"]
        new_stats = {"running_mean": p["running_mean"],
                     "running_var": p["running_var"]}
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if "weight" in p:
        y = y * p["weight"] + p["bias"]
    return y.astype(x.dtype), new_stats


def gelu(x):
    # torch.nn.GELU default = exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def split_keys(key, n: int) -> Sequence[jax.Array]:
    return jax.random.split(key, n)
