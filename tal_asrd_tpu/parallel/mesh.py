"""Device mesh + sharding layout.

The reference's entire distribution story is NCCL data-parallel via Lightning
DDP + DistributedSampler (/root/reference/tal/asr/train.py:101,
tal/asr/system.py:810). On TPU the sharding annotations ARE the communication
spec: we lay out a ('data', 'model') mesh, annotate batch arrays with
P('data', ...) and large matmul weights with P(..., 'model'), and let XLA emit
the all-reduce / all-gather collectives over ICI.

  * data axis  — batch sharding; gradient all-reduce happens automatically when
    jit partitions the backward pass (DDP parity).
  * model axis — tensor parallelism for the decoder FFN/attention projections
    and the output embedding; the reference has none (model is ~6e7 params) but
    the layout gives headroom for larger variants and exercises real TP in the
    multi-chip dry run.
"""
from __future__ import annotations

import logging
import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def make_mesh(data: int = -1, model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def make_multislice_mesh(
    dcn: int,
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('dcn', 'data', 'model') mesh for multi-slice pods.

    The outermost 'dcn' axis maps across slices (inter-slice DCN links); the
    inner axes stay within a slice so TP collectives and the first stage of
    the gradient reduction ride ICI, and only the final cross-slice
    all-reduce crosses DCN — the standard hierarchical-DP layout. Batch
    arrays shard over ('dcn', 'data') jointly (see batch_sharding); params
    shard over 'model' exactly as on a single slice.

    When real multi-slice hardware is present, devices are ordered
    slice-major (jax device order already groups by slice via
    `device.slice_index`); on CPU/virtual meshes the grouping is positional,
    which exercises identical collective patterns.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    # Order slice-major when the platform exposes slice indices.
    if devices and getattr(devices[0], "slice_index", None) is not None:
        devices.sort(key=lambda d: (d.slice_index, d.id))
    n = len(devices)
    assert n % dcn == 0, (n, dcn)
    per_slice = n // dcn
    if data == -1:
        assert per_slice % model == 0, (per_slice, model)
        data = per_slice // model
    assert dcn * data * model == n, f"mesh {dcn}x{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(dcn, data, model)
    return Mesh(arr, axis_names=("dcn", "data", "model"))


def _data_axes(mesh: Mesh):
    """The batch-sharding axis spec for either mesh flavor."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else "data"


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axes ('data', plus 'dcn'
    jointly on a multi-slice mesh); replicate the rest."""
    return NamedSharding(mesh, P(_data_axes(mesh), *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis over 'data'."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x) if np.ndim(x) else 1))

    return jax.tree_util.tree_map(put, batch)


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------
# Rules are (regex over 'path/to/param', PartitionSpec). First match wins.
# Paths are '/'-joined flax param paths, e.g.
#   'decoder/layers_0/cross_attn/out_proj/kernel'.
# Megatron-style layout: column-parallel first FF / QKV projections (shard the
# output features over 'model'), row-parallel second FF / attention output
# (shard the input features) so each transformer block needs a single
# all-reduce per pass, emitted by XLA from these specs.
_PARAM_RULES = [
    # Decoder / LM feed-forward: linear1 column-parallel, linear2 row-parallel.
    (r".*linear1/kernel$", P(None, "model")),
    (r".*linear1/bias$", P("model")),
    (r".*linear2/kernel$", P("model", None)),
    (r".*linear2/bias$", P()),
    # Attention: fused qkv column-parallel (heads over 'model'), out row-parallel.
    (r".*(self_attn|cross_attn|attn)/qkv/kernel$", P(None, "model")),
    (r".*(self_attn|cross_attn|attn)/qkv/bias$", P("model")),
    (r".*(self_attn|cross_attn|attn)/(kv|q)/kernel$", P(None, "model")),
    (r".*(self_attn|cross_attn|attn)/(kv|q)/bias$", P("model")),
    (r".*(self_attn|cross_attn|attn)/out_proj/kernel$", P("model", None)),
    (r".*(self_attn|cross_attn|attn)/out_proj/bias$", P()),
    # Token embedding: shard the vocab row axis (gathered per step; cheap).
    (r".*embedding/embedding$", P("model", None)),
    # TDS pointwise FF convs ([width=1, in, out]): alternate col/row parallel.
    (r".*fc1/kernel$", P(None, None, "model")),
    (r".*fc1/bias$", P("model")),
    (r".*fc2/kernel$", P(None, "model", None)),
    (r".*fc2/bias$", P()),
]


def _spec_for_path(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            return spec
    return P()  # replicate


def param_shardings(mesh: Mesh, params) -> dict:
    """PartitionSpec pytree (as NamedShardings) for a param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        return "/".join(parts)

    specs = {}
    for path, leaf in flat:
        ps = path_str(path)
        spec = _spec_for_path(ps)
        # Only apply if divisible; otherwise replicate. The fallback is LOUD:
        # at real scale a typo'd rule silently degrading to replication wastes
        # HBM proportional to the TP degree, so every fallback is logged.
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if not isinstance(axis, tuple) else int(
                np.prod([mesh.shape[a] for a in axis]))
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                ok = False
                break
        if not ok and spec != P():
            logger.warning(
                "param_shardings: %s shape=%s indivisible by %s on mesh %s — "
                "falling back to full replication",
                ps, tuple(leaf.shape), spec, dict(mesh.shape),
            )
        specs[ps] = spec if ok else P()

    def build(path, leaf):
        return NamedSharding(mesh, specs[path_str(path)])

    return jax.tree_util.tree_map_with_path(build, params)


def opt_state_shardings(mesh: Mesh, opt_state, params, p_shardings):
    """Sharding pytree for an optax opt_state: any subtree that mirrors the
    param pytree (LAMB/Adam mu & nu, Lookahead slow weights, …) follows the
    param shardings; everything else (step counts, scalars) is replicated.

    The reference's DDP keeps optimizer state fully replicated per GPU
    (implicit in torch DDP); under a real 'model' axis that layout wastes HBM
    proportional to the TP degree and forces a reshard of mu/nu against the
    sharded params every step — so here moments follow the params exactly.
    """
    p_treedef = jax.tree_util.tree_structure(params)
    rep = replicated_sharding(mesh)

    def place(node):
        try:
            if jax.tree_util.tree_structure(node) == p_treedef:
                return jax.tree_util.tree_map(lambda _, s: s, node, p_shardings)
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(place(c) for c in node))
        if isinstance(node, (tuple, list)):
            return type(node)(place(c) for c in node)
        if isinstance(node, dict):
            return {k: place(v) for k, v in node.items()}
        return rep

    return place(opt_state)
