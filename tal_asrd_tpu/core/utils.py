"""Core utilities: seeding, parameter counting, tensor-introspecting debug logger.

TPU-native analog of /root/reference/tal/__init__.py:11-155. Instead of CUDA
device selection (`get_device`), device placement here is governed by meshes and
shardings (see tal_asrd_tpu.parallel.mesh); instead of torch RNG seeding,
JAX PRNG keys are threaded explicitly (set_seed seeds only the host-side RNGs
used by data pipelines).
"""
from __future__ import annotations

import os
import random
import sys
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs (python/numpy) and return a root JAX PRNG key.

    The reference seeds torch/cuda globally (tal/__init__.py:34-40). JAX has no
    global device RNG: all device randomness flows from the returned key.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_parameters(tree: Any) -> int:
    """Number of elements in a parameter pytree.

    Analog of tal/__init__.py:30-31 (which counts trainable torch params).
    """
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(x.size for x in leaves if hasattr(x, "size")))


class SuppressPrint:
    """Context manager that silences stdout (tal/__init__.py:43-50 analog)."""

    def __enter__(self):
        self._original_stdout = sys.stdout
        sys.stdout = open(os.devnull, "w")
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        sys.stdout.close()
        sys.stdout = self._original_stdout
        return False


def _describe(x: Any) -> str:
    if isinstance(x, (jax.Array, np.ndarray)):
        arr = np.asarray(x) if not isinstance(x, np.ndarray) else x
        pieces = [f"shape={tuple(arr.shape)}", f"dtype={arr.dtype}"]
        if arr.size and np.issubdtype(arr.dtype, np.floating):
            with np.errstate(all="ignore"):
                pieces.append(f"min={np.nanmin(arr):.4g}")
                pieces.append(f"max={np.nanmax(arr):.4g}")
                pieces.append(f"mean={np.nanmean(arr):.4g}")
            n_nan = int(np.isnan(arr).sum())
            n_inf = int(np.isinf(arr).sum())
            if n_nan:
                pieces.append(f"NANS={n_nan}")
            if n_inf:
                pieces.append(f"INFS={n_inf}")
        return " ".join(pieces)
    return repr(x)


def debug_log(x: Any, msg: str = "", debug: bool = True) -> None:
    """Tensor-introspecting debug logger (tal/__init__.py:53-155 analog).

    Prints shape/dtype/min/max/mean and NaN/Inf census for arrays (or pytrees
    of arrays). No-op when debug=False so call sites can stay in place.
    """
    if not debug:
        return
    if isinstance(x, (dict, list, tuple)):
        print(f"[debug] {msg}:")
        for path, leaf in jax.tree_util.tree_flatten_with_path(x)[0]:
            pathstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            print(f"  {pathstr}: {_describe(leaf)}")
    else:
        print(f"[debug] {msg}: {_describe(x)}")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
