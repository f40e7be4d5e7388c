"""Task heads (reference vilt/modules/heads.py + vilt_module.py classifiers).

All heads are pure functions over dict params.  BarlowTwins BatchNorm
keeps running stats in the param dict and returns updated stats (the
reference trains BN in batch-stats mode; heads.py:88-106).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rmcl_tpu.models import layers as L

BERT_LN_EPS = 1e-12


# ------------------------------------------------------------ Pooler
def init_pooler(key, hidden: int):
    return {"dense": L.linear_init(key, hidden, hidden)}


def pooler(p, hidden_states):
    """tanh(dense(x[:, 0])) — reference heads.py:10-20."""
    return jnp.tanh(L.linear(p["dense"], hidden_states[:, 0]))


# ------------------------------------------------------------ ITM
def init_itm_head(key, hidden: int):
    return {"fc": L.linear_init(key, hidden, 2)}


def itm_head(p, x):
    return L.linear(p["fc"], x)


# ------------------------------------------------------------ MLM
def init_mlm_head(key, hidden: int, vocab: int):
    k1, k2 = jax.random.split(key)
    return {
        "transform": {
            "dense": L.linear_init(k1, hidden, hidden),
            "LayerNorm": L.layer_norm_init(hidden),
        },
        "decoder": L.linear_init(k2, hidden, vocab, bias=False),
        "bias": jnp.zeros((vocab,), jnp.float32),
    }


def mlm_head(p, x):
    """BertPredictionHeadTransform (dense+gelu+LN) then untied decoder
    (reference heads.py:183-195)."""
    y = L.gelu(L.linear(p["transform"]["dense"], x))
    y = L.layer_norm(p["transform"]["LayerNorm"], y, eps=BERT_LN_EPS)
    return L.linear(p["decoder"], y) + p["bias"].astype(y.dtype)


# ------------------------------------------------------------ MPP
def init_mpp_head(key, hidden: int):
    k1, k2 = jax.random.split(key)
    return {
        "transform": {
            "dense": L.linear_init(k1, hidden, hidden),
            "LayerNorm": L.layer_norm_init(hidden),
        },
        "decoder": L.linear_init(k2, hidden, 256 * 3),
    }


def mpp_head(p, x):
    y = L.gelu(L.linear(p["transform"]["dense"], x))
    y = L.layer_norm(p["transform"]["LayerNorm"], y, eps=BERT_LN_EPS)
    return L.linear(p["decoder"], y)


# ------------------------------------------------------------ MoCo
def init_moco_head(key, in_dim: int, hidden: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "projector": {
            "0": L.linear_init(k1, in_dim, hidden),
            "1": L.layer_norm_init(hidden),
            "3": L.linear_init(k2, hidden, out_dim, bias=False),
        }
    }


def moco_head(p, cls_feats):
    """Linear -> LayerNorm -> ReLU -> Linear(no bias); 768->768->128
    (reference heads.py:129-143)."""
    y = L.linear(p["projector"]["0"], cls_feats)
    y = L.layer_norm(p["projector"]["1"], y, eps=1e-5)  # nn.LayerNorm default
    y = jax.nn.relu(y)
    return L.linear(p["projector"]["3"], y)


# ------------------------------------------------------------ BarlowTwins
def init_barlowtwins_head(key, in_dim: int, inner, out_dim: int):
    dims = [in_dim] + list(inner) + [out_dim]
    ks = jax.random.split(key, 3)
    return {
        "projector": {
            "0": L.linear_init(ks[0], dims[0], dims[1], bias=False),
            "1": L.batch_norm_init(dims[1]),
            "3": L.linear_init(ks[1], dims[1], dims[2], bias=False),
            "4": L.batch_norm_init(dims[2]),
            "6": L.linear_init(ks[2], dims[2], dims[3], bias=False),
        },
        "norm": L.batch_norm_init(dims[3], affine=False),
    }


def barlowtwins_head(p, cls_feats, training: bool = True):
    """Projector MLP with BN+ReLU, affine-free output BN
    (reference heads.py:88-106).  Returns (z, new_bn_stats)."""
    y = L.linear(p["projector"]["0"], cls_feats)
    y, s1 = L.batch_norm(p["projector"]["1"], y, training)
    y = jax.nn.relu(y)
    y = L.linear(p["projector"]["3"], y)
    y, s4 = L.batch_norm(p["projector"]["4"], y, training)
    y = jax.nn.relu(y)
    y = L.linear(p["projector"]["6"], y)
    y, sn = L.batch_norm(p["norm"], y, training)
    new_stats = {"projector": {"1": s1, "4": s4}, "norm": sn}
    return y, new_stats


# ------------------------------------------------------------ classifiers
def init_vqa_classifier(key, hidden: int, label_size: int):
    k1, k2 = jax.random.split(key)
    return {
        "0": L.linear_init(k1, hidden, hidden * 2),
        "1": L.layer_norm_init(hidden * 2),
        "3": L.linear_init(k2, hidden * 2, label_size),
    }


def vqa_classifier(p, x):
    """Linear -> LN -> GELU -> Linear (reference vilt_module.py:166-171)."""
    y = L.linear(p["0"], x)
    y = L.layer_norm(p["1"], y, eps=1e-5)
    y = L.gelu(y)
    return L.linear(p["3"], y)


def init_nlvr2_classifier(key, hidden: int):
    k1, k2 = jax.random.split(key)
    return {
        "0": L.linear_init(k1, hidden * 2, hidden * 2),
        "1": L.layer_norm_init(hidden * 2),
        "3": L.linear_init(k2, hidden * 2, 2),
    }


def nlvr2_classifier(p, x):
    """Linear -> LN -> GELU -> Linear on concat cls feats
    (reference vilt_module.py:194-199)."""
    y = L.linear(p["0"], x)
    y = L.layer_norm(p["1"], y, eps=1e-5)
    y = L.gelu(y)
    return L.linear(p["3"], y)


def init_rank_output_from_itm(itm_params):
    """rank_output = row 1 of the ITM head (reference vilt_module.py:233-236)."""
    return {
        "kernel": itm_params["fc"]["kernel"][:, 1:2],
        "bias": itm_params["fc"]["bias"][1:2],
    }


def rank_output(p, x):
    return L.linear(p, x)


# ------------------------------------------------- MPPD / MPFR (dormant)
def init_mppd_head(key, hidden: int, patch_dim: int):
    """Dense masked-patch regression head.  The reference's compute_mppd
    (objectives.py:668-688) references a `mppd_score` module that is
    never constructed (SURVEY.md §2.2 C6 note) — this is the natural
    completion: hidden -> P*P*3 pixel regression."""
    k1, k2 = jax.random.split(key)
    return {
        "transform": {
            "dense": L.linear_init(k1, hidden, hidden),
            "LayerNorm": L.layer_norm_init(hidden),
        },
        "decoder": L.linear_init(k2, hidden, patch_dim),
    }


def mppd_head(p, x):
    y = L.gelu(L.linear(p["transform"]["dense"], x))
    y = L.layer_norm(p["transform"]["LayerNorm"], y, eps=BERT_LN_EPS)
    return L.linear(p["decoder"], y)


init_mpfr_head = init_mppd_head  # same shape: hidden -> patch feature dim
mpfr_head = mppd_head
