"""Checkpointing: full/partial/averaged, with the reference's surgical loads.

Parity targets:
  * per-epoch keep-all checkpoints (Lightning ModelCheckpoint(save_top_k=-1),
    tal/asr/train.py:88-92) -> CheckpointManager;
  * encoder-only partial load (train.py:53-59 filters `.encoder` keys);
  * decoder load with embedding-row expansion for newly added speaker tokens
    (train.py:69-79, tal/utils/expand_speakers.py:14-27);
  * checkpoint weight averaging of the last k epochs
    (tal/utils/average_weights.py:13-29 -> `avg_last_5.pt` used by the
    transcriber, transcribe.py:217).

Format: flax msgpack bytes per file + a tiny JSON manifest; pure pytrees, no
framework-pickled objects, so files are portable across model code changes.
"""
from __future__ import annotations

import json
import math
import os
import re
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_pytree(path: str, tree: Any) -> None:
    """Atomic write (tmp + rename): checkpoints are the resume point for
    crash/kill recovery, so a writer killed mid-save must never leave a
    truncated msgpack at the final path (a corrupt 'latest' checkpoint turns
    every retry into a load crash)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host))
    os.replace(tmp, path)


def load_pytree(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


# ---------------------------------------------------------------------------
# Surgical loads
# ---------------------------------------------------------------------------

def filter_subtree(params: dict, prefix: str) -> dict:
    """Extract the subtree under `prefix` (e.g. 'encoder'): the analog of
    filtering '.encoder.'-prefixed state-dict keys (train.py:53-59)."""
    node = params
    for part in prefix.split("/"):
        node = node[part]
    return node


def merge_subtree(params: dict, prefix: str, subtree: dict) -> dict:
    """Return params with the subtree at `prefix` replaced (non-destructive)."""
    def rec(node, parts):
        node = dict(node)
        if len(parts) == 1:
            node[parts[0]] = subtree
        else:
            node[parts[0]] = rec(node[parts[0]], parts[1:])
        return node

    return rec(params, prefix.split("/"))


def expand_speaker_embeddings(
    embedding: np.ndarray,
    new_num_tokens: int,
    seed: int = 0,
) -> np.ndarray:
    """Grow an embedding table for newly appended speaker tokens.

    New rows are initialized uniform(-1/sqrt(d), 1/sqrt(d)) like the original
    init (tal/modules.py:18-20; expansion semantics of expand_speakers.py:18-25
    and train.py:69-79)."""
    old_n, d = embedding.shape
    if new_num_tokens <= old_n:
        return embedding[:new_num_tokens]
    bound = 1.0 / math.sqrt(d)
    rng = np.random.RandomState(seed)
    extra = rng.uniform(-bound, bound, size=(new_num_tokens - old_n, d))
    return np.concatenate([np.asarray(embedding), extra.astype(embedding.dtype)], 0)


def load_params_partial(
    target_params: dict,
    ckpt_params: dict,
    strict: bool = True,
    expand_embeddings_to: Optional[int] = None,
) -> dict:
    """Load ckpt params into target structure.

    - strict=False skips missing/mismatched leaves (--no-strict flag parity);
    - expand_embeddings_to grows `embedding/embedding` rows for added
      speaker tokens before shape checking.
    """
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])

    def path_str(p):
        return "/".join(str(getattr(x, "key", x)) for x in p)

    flat_c = {
        path_str(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(ckpt_params)[0]
    }

    out = {}
    for p, tv in flat_t.items():
        ps = path_str(p)
        cv = flat_c.get(ps)
        if cv is not None and expand_embeddings_to and ps.endswith("embedding/embedding"):
            cv = expand_speaker_embeddings(np.asarray(cv), expand_embeddings_to)
        if cv is None and ps.endswith("mem_pos_alpha"):
            # enc_posenc gate absent from a posenc-free checkpoint: keep the
            # zero init — the gated model is then bit-identical to the donor
            # (the backward-compat contract of core/config.py enc_posenc).
            out[p] = tv
            continue
        if cv is None or tuple(np.shape(cv)) != tuple(np.shape(tv)):
            if strict and cv is None:
                raise KeyError(f"Missing checkpoint param {ps}")
            if strict and cv is not None:
                raise ValueError(
                    f"Shape mismatch at {ps}: ckpt {np.shape(cv)} vs target {np.shape(tv)}"
                )
            out[p] = tv
        else:
            # Stay on host: loaded leaves become numpy (tv.dtype is metadata —
            # never np.asarray(tv), which would FETCH every target leaf from
            # the device; on a tunneled accelerator the leaf-by-leaf download
            # + re-upload took minutes for a 180 MB checkpoint). The next
            # shard_state/jit call transfers the whole tree in one batch.
            out[p] = np.asarray(cv, dtype=tv.dtype)
    treedef = jax.tree_util.tree_structure(target_params)
    return jax.tree_util.tree_unflatten(
        treedef, [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(target_params)[0]]
    )


def average_params(param_trees: Sequence[Any]) -> Any:
    """Mean of k parameter pytrees (average_weights.py:13-29 parity)."""
    assert param_trees
    return jax.tree_util.tree_map(
        lambda *xs: sum(np.asarray(x, np.float64) for x in xs).astype(
            np.asarray(xs[0]).dtype
        ) / len(xs)
        if not np.issubdtype(np.asarray(xs[0]).dtype, np.floating)
        else (sum(np.asarray(x, np.float64) for x in xs) / len(xs)).astype(
            np.asarray(xs[0]).dtype
        ),
        *param_trees,
    )


# ---------------------------------------------------------------------------
# Manager
# ---------------------------------------------------------------------------

class CheckpointManager:
    """Keep-all epoch checkpoints + latest pointer + averaging."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"ckpt_{step:08d}.msgpack")

    def save(self, step: int, params: Any, extra: Optional[dict] = None) -> str:
        path = self._path(step)
        save_pytree(path, params)
        manifest = {"step": step, "path": os.path.basename(path)}
        if extra:
            manifest.update(extra)
        with open(os.path.join(self.dir, "latest.json"), "w") as f:
            json.dump(manifest, f)
        return path

    def steps(self) -> List[int]:
        out = []
        for f in os.listdir(self.dir):
            m = re.match(r"ckpt_(\d+)\.msgpack$", f)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def load(self, step: Optional[int] = None) -> Any:
        if step is None:
            steps = self.steps()
            assert steps, f"No checkpoints in {self.dir}"
            step = steps[-1]
        return load_pytree(self._path(step))

    def average_last(self, k: int) -> Any:
        steps = self.steps()[-k:]
        assert steps, "No checkpoints to average"
        return average_params([self.load(s) for s in steps])

    # -- full training-state checkpoints (params + optimizer + step) -----
    def _state_path(self, step: int) -> str:
        return os.path.join(self.dir, f"state_{step:08d}.msgpack")

    def save_state(self, step: int, state_tree: Any) -> str:
        """Save a full TrainState pytree for exact resume (the reference can
        only resume params via Lightning checkpoints; optimizer moments are
        first-class here)."""
        path = self._state_path(step)
        save_pytree(path, state_tree)
        return path

    def state_steps(self) -> List[int]:
        out = []
        for f in os.listdir(self.dir):
            m = re.match(r"state_(\d+)\.msgpack$", f)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def load_state(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into a template TrainState pytree (shapes/dtypes source)."""
        steps = self.state_steps()
        assert steps, f"No state checkpoints in {self.dir}"
        step = steps[-1] if step is None else step
        return load_pytree(self._state_path(step), target=target)

    def latest_state_step(self) -> Optional[int]:
        steps = self.state_steps()
        return steps[-1] if steps else None


# ---------------------------------------------------------------------------
# Sharded / async checkpointing (pod scale)
# ---------------------------------------------------------------------------
class ShardedCheckpointManager:
    """Orbax-backed sharded checkpointing for multi-host/multi-slice training.

    The msgpack CheckpointManager above gathers the full state onto one host
    — fine for the reference-size model (~45M params), unusable at pod scale
    where params are sharded over a ('dcn','data','model') mesh. This manager

      * saves each array shard-parallel via orbax (every host writes only the
        shards it owns — no full gather, no HBM spike);
      * saves ASYNCHRONOUSLY: `save_state` kicks off the write and returns,
        overlapping checkpoint I/O with the next training steps
        (`wait_until_finished` barriers before the next save/exit);
      * restores WITH shardings: `load_state(template)` places every leaf
        directly onto the template's devices/sharding, so restore never
        materializes the full state on one host either.
    """

    def __init__(self, directory: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = (ocp.AsyncCheckpointer if async_save
                       else ocp.Checkpointer)(ocp.StandardCheckpointHandler())

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"state_{step:08d}")

    def save_state(self, step: int, state_tree: Any) -> str:
        path = self._path(step)
        self._ckptr.save(path, args=self._ocp.args.StandardSave(state_tree),
                         force=True)
        return path

    def wait_until_finished(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def state_steps(self) -> List[int]:
        out = []
        for f in os.listdir(self.dir):
            m = re.match(r"state_(\d+)$", f)
            if m and os.path.isdir(os.path.join(self.dir, f)):
                out.append(int(m.group(1)))
        return sorted(out)

    def load_state(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into a (possibly sharded) template: every leaf lands with
        the template's sharding — no host-side full materialization."""
        steps = self.state_steps()
        assert steps, f"No sharded checkpoints in {self.dir}"
        step = steps[-1] if step is None else step
        self.wait_until_finished()
        return self._ckptr.restore(
            self._path(step), args=self._ocp.args.StandardRestore(target),
        )

    def latest_state_step(self) -> Optional[int]:
        steps = self.state_steps()
        return steps[-1] if steps else None

    def close(self) -> None:
        self.wait_until_finished()
