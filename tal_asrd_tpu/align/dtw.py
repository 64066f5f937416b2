"""Dynamic time warping on device.

The reference's word alignment comes from the aeneas forced aligner (espeak
TTS + MFCC DTW, /root/reference/tal/alignment/aeneas.py:30-69). The DTW core
here is a JAX scan over rows (each row's left-to-right dependency is an inner
scan) producing the full accumulated-cost matrix; the optimal monotonic path
is backtraced on host (tiny). Batched via vmap for aligning many utterances
at once.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

INF = 1e30


def dtw_cost_matrix(cost: jax.Array) -> jax.Array:
    """Accumulated DTW cost D for a local cost matrix [N, M]:
    D[i,j] = cost[i,j] + min(D[i-1,j], D[i,j-1], D[i-1,j-1])."""
    n, m = cost.shape

    def row_step(prev_row, cost_row):
        # prev_row: D[i-1, :]; compute D[i, :] left to right
        def cell(carry_left, inp):
            c, up, diag = inp
            val = c + jnp.minimum(jnp.minimum(up, carry_left), diag)
            return val, val

        ups = prev_row
        diags = jnp.concatenate([jnp.full((1,), INF), prev_row[:-1]])
        # first cell has no left neighbor
        _, row = jax.lax.scan(cell, INF, (cost_row, ups, diags))
        return row, row

    # row 0: cumulative sum along j (only left moves possible)
    row0 = jnp.cumsum(cost[0])
    _, rows = jax.lax.scan(row_step, row0, cost[1:])
    return jnp.concatenate([row0[None], rows], axis=0)


def dtw_path(cost: np.ndarray) -> List[Tuple[int, int]]:
    """Backtrace the optimal path from a local cost matrix (host)."""
    d = np.asarray(dtw_cost_matrix(jnp.asarray(cost, jnp.float32)))
    i, j = d.shape[0] - 1, d.shape[1] - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            options = [d[i - 1, j - 1], d[i - 1, j], d[i, j - 1]]
            k = int(np.argmin(options))
            if k == 0:
                i, j = i - 1, j - 1
            elif k == 1:
                i -= 1
            else:
                j -= 1
        path.append((i, j))
    path.reverse()
    return path


def monotonic_segmentation(cost: np.ndarray) -> List[Tuple[int, int]]:
    """For each row i, the [start, end) column span covered by the DTW path —
    a monotonic assignment of rows (tokens) to column (frame) spans."""
    path = dtw_path(cost)
    n = cost.shape[0]
    spans = [[None, None] for _ in range(n)]
    for i, j in path:
        if spans[i][0] is None:
            spans[i][0] = j
        spans[i][1] = j + 1
    return [(int(a), int(b)) for a, b in spans]
