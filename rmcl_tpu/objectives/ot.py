"""IPOT optimal transport for the ITM word-patch-alignment loss.

Behavioural spec from reference vilt/modules/objectives.py:24-95
(cost_matrix_cosine / ipot / optimal_transport_dist), re-expressed with
lax.fori_loop and batched einsums — no in-place masked_fill, fp32
throughout (the reference runs this under autocast(enabled=False),
objectives.py:737).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cost_matrix_cosine(x, y, eps: float = 1e-5):
    """Pairwise cosine distance: (B, Lx, D), (B, Ly, D) -> (B, Lx, Ly)."""
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    xn = x32 / jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True), eps)
    yn = y32 / jnp.maximum(jnp.linalg.norm(y32, axis=-1, keepdims=True), eps)
    return 1.0 - jnp.einsum("bld,bmd->blm", xn, yn)


def ipot(C, x_len, x_pad, y_len, y_pad, joint_pad, beta: float,
         iteration: int, k: int):
    """Inexact proximal-point OT plan.  Shapes:
    C (B,M,N); x_len (B,); x_pad (B,M) bool; y_len (B,); y_pad (B,N) bool;
    joint_pad (B,M,N) bool.  Returns transport plan T (B,N,M)."""
    C = jax.lax.stop_gradient(C.astype(jnp.float32))
    b, m, n = C.shape
    jp_t = jnp.transpose(joint_pad, (0, 2, 1))          # (B, N, M)

    sigma = jnp.where(x_pad, 0.0, 1.0 / x_len[:, None])  # (B, M)
    T = jnp.where(jp_t, 0.0, jnp.ones((b, n, m)))
    A = jnp.where(jp_t, 0.0, jnp.exp(-jnp.transpose(C, (0, 2, 1)) / beta))

    x_len_b = x_len[:, None, None].astype(jnp.float32)
    y_len_b = y_len[:, None, None].astype(jnp.float32)
    x_mask = (x_pad.astype(jnp.float32) * 1e4)[:, None, :]   # (B,1,M)
    y_mask = (y_pad.astype(jnp.float32) * 1e4)[:, None, :]   # (B,1,N)

    def outer(_, carry):
        T, sigma = carry
        Q = A * T                                             # (B,N,M)
        sigma_col = sigma.reshape(b, m, 1)

        def inner(_, sc):
            delta = 1.0 / (y_len_b * jnp.einsum("bnm,bmo->bno", Q, sc)
                           .reshape(b, 1, n) + y_mask)
            new_sigma = 1.0 / (x_len_b * jnp.einsum("bon,bnm->bom", delta, Q)
                               + x_mask)                       # (B,1,M)
            return new_sigma.reshape(b, m, 1)

        # run k-1 then one more capturing delta (k==1 in practice)
        sc = jax.lax.fori_loop(0, k - 1, inner, sigma_col) if k > 1 else sigma_col
        delta = 1.0 / (y_len_b * jnp.einsum("bnm,bmo->bno", Q, sc)
                       .reshape(b, 1, n) + y_mask)
        sigma_row = 1.0 / (x_len_b * jnp.einsum("bon,bnm->bom", delta, Q)
                           + x_mask)                           # (B,1,M)
        T = delta.reshape(b, n, 1) * Q * sigma_row
        return T, sigma_row.reshape(b, m)

    T, _ = jax.lax.fori_loop(0, iteration, outer, (T, sigma))
    return jnp.where(jp_t, 0.0, T)


def trace_bmm(cost, T):
    """trace(cost @ T) batched: cost (B,M,N), T (B,N,M) -> (B,)."""
    return jnp.einsum("bmn,bnm->b", cost, T)


def optimal_transport_dist(txt_emb, img_emb, txt_pad, img_pad,
                           beta: float = 0.5, iteration: int = 50, k: int = 1):
    """OT distance between padded token sets (reference objectives.py:79-95)."""
    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)
    txt_len = (txt_pad.shape[1] - txt_pad.sum(axis=1)).astype(jnp.float32)
    img_len = (img_pad.shape[1] - img_pad.sum(axis=1)).astype(jnp.float32)
    T = ipot(cost, txt_len, txt_pad, img_len, img_pad, joint_pad,
             beta, iteration, k)
    return trace_bmm(cost, jax.lax.stop_gradient(T))
