"""t-SNE projection of contrastive embeddings.

Behavioural spec: reference TSNE_vizualisation.py:16-46, which is broken
as committed (uses an undefined `neg_txt`, SURVEY.md §2.5).  This is the
repaired semantics: scatter the query/key projections against a sample
of the negative queue, colored by group, saved as png.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def tsne_projection(q, k, neg_queue, out_path: str = "tsne.png",
                    max_negatives: int = 1000, perplexity: float = 30.0,
                    seed: int = 0) -> Optional[str]:
    """q, k: (B, C); neg_queue: (C, K).  Returns the saved path."""
    from sklearn.manifold import TSNE

    q = np.asarray(q, np.float32)
    k = np.asarray(k, np.float32)
    negs = np.asarray(neg_queue, np.float32).T
    if len(negs) > max_negatives:
        idx = np.random.RandomState(seed).choice(
            len(negs), max_negatives, replace=False)
        negs = negs[idx]

    data = np.concatenate([q, k, negs], axis=0)
    perplexity = min(perplexity, max((len(data) - 1) / 3.0, 2.0))
    emb = TSNE(n_components=2, perplexity=perplexity,
               random_state=seed, init="pca").fit_transform(data)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        np.save(out_path + ".npy", emb)
        return out_path + ".npy"

    B = len(q)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.scatter(emb[2 * B:, 0], emb[2 * B:, 1], s=4, c="lightgray",
               label="queue negatives")
    ax.scatter(emb[:B, 0], emb[:B, 1], s=16, c="tab:blue", label="query")
    ax.scatter(emb[B:2 * B, 0], emb[B:2 * B, 1], s=16, c="tab:orange",
               label="key")
    ax.legend()
    ax.set_title("MoCo projection space (t-SNE)")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
