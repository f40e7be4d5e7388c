"""BERT-style text embeddings (parity with HF BertEmbeddings as used by
reference vilt/modules/vilt_module.py:26-38: vocab 30522, hidden 768,
max_position_embeddings = max_text_len, LayerNorm eps 1e-12, dropout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rmcl_tpu.models import layers as L


def init_text_embeddings(key, vocab_size: int, hidden_size: int,
                         max_position: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "word_embeddings": L.embedding_init(k1, vocab_size, hidden_size),
        "position_embeddings": L.embedding_init(k2, max_position, hidden_size),
        "token_type_embeddings": L.embedding_init(k3, 2, hidden_size),
        "LayerNorm": L.layer_norm_init(hidden_size),
    }


def text_embeddings(params, input_ids, *, drop_rate: float = 0.0,
                    rng=None, deterministic: bool = True,
                    dtype=jnp.float32, word_embeds=None,
                    dropout_impl: str = "fp32"):
    """input_ids: (B, T) int32 -> (B, T, H).

    `word_embeds` overrides the word-embedding lookup with explicit
    vectors — the differentiation point for the greedy attack's
    token-saliency gradients (replaces the reference's backward hook on
    word_embeddings, greedy_attack_vilt.py:414-424).
    """
    T = input_ids.shape[-1]
    x = (word_embeds if word_embeds is not None
         else L.embedding(params["word_embeddings"], input_ids))
    pos = params["position_embeddings"]["weight"][:T]
    tok = params["token_type_embeddings"]["weight"][0]
    x = x + pos[None, :, :] + tok[None, None, :]
    x = L.layer_norm(params["LayerNorm"], x.astype(dtype))
    x = L.dropout(x, drop_rate, rng, deterministic, impl=dropout_impl)
    return x
