"""Speaker-embedding clustering for WDER search.

Parity targets:
  * the clustering grid of wder_search.py:88-154 — identity / Bayesian GMM /
    HDBSCAN / DBSCAN / Agglomerative over {euclidean, cosine, inverse-dot,
    neg-dot} metrics with optional PCA;
  * the GPU-precomputed cosine-distance matrix of wder_search_emb.py:113-121,
    here a single TPU (or any JAX backend) matmul: D = 1 - X̂ X̂ᵀ.

Engines come from scikit-learn (HDBSCAN is sklearn.cluster.HDBSCAN — the
standalone hdbscan package is not needed).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np


# --- pairwise metrics (wder.py:291-306 parity) -----------------------------

def cosine_similarity(x, y, **kw):
    return float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-8))


def cosine_distance(x, y, **kw):
    return 1.0 - cosine_similarity(x, y)


def inverse_dot_product(x, y, **kw):
    return float(1.0 / (np.dot(x, y) + 1e-8))


def neg_dot_product(x, y, **kw):
    return float(-np.dot(x, y))


METRICS = {
    "euclidean": None,  # native engine metric
    "cos_sim": cosine_similarity,
    "cos_dist": cosine_distance,
    "idp": inverse_dot_product,
    "ndp": neg_dot_product,
}


def cosine_distance_matrix(embeddings: np.ndarray, use_device: bool = True) -> np.ndarray:
    """Precomputed pairwise cosine distances, on accelerator when available
    (wder_search_emb.py:113-121 analog: one [N,D]x[D,N] matmul on the MXU)."""
    x = np.asarray(embeddings, np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True) + 1e-8
    xn = x / norms
    if use_device:
        try:
            import jax.numpy as jnp

            sim = np.asarray(jnp.matmul(jnp.asarray(xn), jnp.asarray(xn.T)))
        except Exception:
            sim = xn @ xn.T
    else:
        sim = xn @ xn.T
    d = 1.0 - sim
    np.fill_diagonal(d, 0.0)
    return np.maximum(d, 0.0)


def pairwise_matrix(embeddings: np.ndarray, metric: Callable) -> np.ndarray:
    """Generic precomputed distance matrix for callable metrics."""
    x = np.asarray(embeddings, np.float32)
    n = len(x)
    d = np.zeros((n, n), np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            v = metric(x[i], x[j])
            d[i, j] = d[j, i] = v
    return d


# --- engines (wder_search.py:88-154 analog) --------------------------------

def cluster_embeddings(
    embeddings: Sequence[np.ndarray],
    method: str = "hdbscan",
    metric: str = "euclidean",
    pca_dims: Optional[int] = None,
    use_device: bool = True,
    **kwargs,
) -> np.ndarray:
    """Cluster speaker embeddings -> integer labels (noise = -1 for density
    methods, mapped to fresh singleton ids so every utterance gets a speaker).
    """
    x = np.asarray(list(embeddings), np.float32)
    if x.ndim == 1:
        x = x[:, None]
    if len(x) < 2:
        # Every sklearn engine requires >=2 samples; a 1-utterance segment
        # is trivially one speaker (reference hits the same degenerate case
        # only via its grid's try/except in wder_search.py).
        return np.zeros(len(x), np.int64)
    if pca_dims and 0 < pca_dims < x.shape[1]:
        from sklearn.decomposition import PCA

        x = PCA(n_components=pca_dims).fit_transform(x)

    if method == "id":
        # identity: every distinct embedding row is its own cluster
        _, labels = np.unique(x, axis=0, return_inverse=True)
        return labels

    precomputed = None
    if metric == "cos_dist":
        precomputed = cosine_distance_matrix(x, use_device)
    elif metric in METRICS and METRICS[metric] is not None:
        precomputed = pairwise_matrix(x, METRICS[metric])

    if method == "hdbscan":
        from sklearn.cluster import HDBSCAN

        kw = dict(kwargs)
        kw.setdefault("min_cluster_size", 2)
        if precomputed is not None:
            # sklearn requires nonnegative distances for precomputed
            pre = precomputed - precomputed.min()
            engine = HDBSCAN(metric="precomputed", **kw)
            labels = engine.fit_predict(pre)
        else:
            engine = HDBSCAN(**kw)
            labels = engine.fit_predict(x)
    elif method == "dbscan":
        from sklearn.cluster import DBSCAN

        kw = dict(kwargs)
        kw.setdefault("eps", 0.5)
        kw.setdefault("min_samples", 2)
        if precomputed is not None:
            pre = precomputed - precomputed.min()
            labels = DBSCAN(metric="precomputed", **kw).fit_predict(pre)
        else:
            labels = DBSCAN(**kw).fit_predict(x)
    elif method == "agglomerative":
        from sklearn.cluster import AgglomerativeClustering

        kw = dict(kwargs)
        if precomputed is not None:
            kw.setdefault("linkage", "average")
            labels = AgglomerativeClustering(
                metric="precomputed", **kw
            ).fit_predict(precomputed - precomputed.min())
        else:
            labels = AgglomerativeClustering(**kw).fit_predict(x)
    elif method == "gmm":
        from sklearn.mixture import BayesianGaussianMixture

        kw = dict(kwargs)
        kw.setdefault("n_components", min(8, len(x)))
        labels = BayesianGaussianMixture(**kw).fit_predict(x)
    else:
        raise ValueError(f"Unknown clustering method {method!r}")

    labels = np.asarray(labels)
    # Density methods emit -1 noise: give each noise point its own label so
    # downstream relative-speaker mapping still works.
    if (labels == -1).any():
        nxt = labels.max() + 1
        for i in np.where(labels == -1)[0]:
            labels[i] = nxt
            nxt += 1
    return labels


def make_cluster_fn(method: str, metric: str = "euclidean",
                    pca_dims: Optional[int] = None, **kwargs):
    def fn(embeddings, **extra):
        return cluster_embeddings(
            embeddings, method=method, metric=metric, pca_dims=pca_dims,
            **{**kwargs, **extra},
        )

    return fn
