"""wav2vec-style convolutional speaker-feature extractor.

The reference downloads fairseq's pretrained wav2vec_large and runs its
`feature_extractor` + `feature_aggregator` to produce d-vector-like features
for UIS-RNN (/root/reference/tal/diarization/features/wav2vec/__init__.py:
41-66, extract_features_tal.py:28-249). fairseq is CUDA-bound and not
available here; this module re-implements the same architecture in JAX
(frozen, inference-only):

  * feature extractor: stack of 1-D convs with (dim, kernel, stride) plan
    [(512,10,5), (512,8,4), (512,4,2), (512,4,2), (512,4,2)] over raw 16 kHz
    audio, group-norm + ReLU (wav2vec "large" uses log-compression too);
  * aggregator: stack of kernel-3 stride-1 convs with residual skips.

`convert_fairseq_weights` maps a fairseq state-dict (if one is provided
offline) onto these modules; with no weights the randomly initialized network
still defines the feature geometry for pipeline tests.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

EXTRACTOR_PLAN = [(512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2)]
AGGREGATOR_PLAN = [(512, 3, 1)] * 9


class ConvFeatureExtractor(nn.Module):
    plan: Sequence[Tuple[int, int, int]] = tuple(EXTRACTOR_PLAN)
    log_compression: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T] raw audio -> [B, frames, 512]."""
        h = x[:, :, None]
        for i, (dim, k, s) in enumerate(self.plan):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID", name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name=f"norm_{i}")(h)  # torch eps
            h = nn.relu(h)
        if self.log_compression:
            h = jnp.log(jnp.abs(h) + 1.0)
        return h


class ConvAggregator(nn.Module):
    plan: Sequence[Tuple[int, int, int]] = tuple(AGGREGATOR_PLAN)

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        for i, (dim, k, s) in enumerate(self.plan):
            inp = h
            h = nn.Conv(dim, (k,), strides=(s,), padding="SAME", name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name=f"norm_{i}")(h)  # torch eps
            h = nn.relu(h)
            if inp.shape == h.shape:
                h = h + inp  # residual skip
        return h


class Wav2VecFeatures(nn.Module):
    def setup(self):
        self.feature_extractor = ConvFeatureExtractor()
        self.feature_aggregator = ConvAggregator()

    def __call__(self, audio: jax.Array) -> jax.Array:
        return self.feature_aggregator(self.feature_extractor(audio))


def init_wav2vec(seed: int = 0):
    model = Wav2VecFeatures()
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16000)))
    return model, variables


def convert_fairseq_weights(state_dict: Dict[str, np.ndarray],
                            variables=None) -> Dict:
    """Map a fairseq wav2vec state dict onto this module's param tree.

    fairseq's wav2vec (v1) lays blocks out as
    ``{feature_extractor,feature_aggregator}.conv_layers.{i}.{j}.*`` where the
    Sequential index ``j`` of the conv/norm submodules varies with config
    (dropout / padding modules shift it), so tensors are classified by SHAPE
    within each block instead of by index:

      * 3-D ``weight`` [out, in, k]  -> conv kernel, transposed to [k, in, out]
      * 1-D ``weight`` / ``bias``    -> Fp32GroupNorm(1, dim) affine scale/bias

    fairseq convs are bias-free; when `variables` (an `init_wav2vec` tree) is
    given, conv biases absent from the state dict are zero-filled against it
    and the mapped tree is validated leaf-by-leaf (shape match) so a layout
    drift fails loudly instead of silently training from random weights.
    """
    params: Dict = {"feature_extractor": {}, "feature_aggregator": {}}
    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] not in params or "conv_layers" not in key:
            continue
        val = np.asarray(val)
        idx = int(parts[2])
        mod = params[parts[0]]
        if val.ndim == 3 and parts[-1] == "weight":
            mod.setdefault(f"conv_{idx}", {})["kernel"] = val.transpose(2, 1, 0)
        elif val.ndim == 1 and parts[-1] == "weight":
            mod.setdefault(f"norm_{idx}", {})["scale"] = val
        elif val.ndim == 1 and parts[-1] == "bias":
            mod.setdefault(f"norm_{idx}", {})["bias"] = val

    if variables is not None:
        ref = variables["params"]
        for group, blocks in ref.items():
            for bname, leaves in blocks.items():
                got = params.setdefault(group, {}).setdefault(bname, {})
                for lname, leaf in leaves.items():
                    if lname not in got:
                        assert lname == "bias" and bname.startswith("conv_"), (
                            f"missing converted leaf {group}/{bname}/{lname}"
                        )
                        got[lname] = np.zeros(leaf.shape, np.float32)
                    assert got[lname].shape == leaf.shape, (
                        group, bname, lname, got[lname].shape, leaf.shape
                    )
    return params


def plan_from_state_dict(state_dict: Dict[str, np.ndarray], prefix: str,
                         strides: Optional[Sequence[int]] = None
                         ) -> List[Tuple[int, int, int]]:
    """Derive a (dim, kernel, stride) conv plan from fairseq conv weight
    shapes (so e.g. wav2vec_large's 12-layer kernel-2..13 aggregator maps
    without hardcoding). Strides are not recoverable from weights: defaults
    to the known wav2vec extractor strides / all-1 aggregator."""
    kernels = {}
    for key, val in state_dict.items():
        val = np.asarray(val)
        if key.startswith(prefix + ".conv_layers.") and val.ndim == 3:
            kernels[int(key.split(".")[2])] = (val.shape[0], val.shape[2])
    plan = []
    default_strides = ([s for _, _, s in EXTRACTOR_PLAN]
                       if prefix == "feature_extractor" else None)
    for i in sorted(kernels):
        dim, k = kernels[i]
        if strides is not None:
            s = strides[i]
        elif default_strides is not None and i < len(default_strides):
            s = default_strides[i]
        else:
            s = 1
        plan.append((dim, k, s))
    return plan


def extract_utterance_features(
    model, variables, audio: np.ndarray,
    window_s: Optional[float] = 0.4, sample_rate: int = 16000,
) -> np.ndarray:
    """Features for one utterance; optional non-overlapping window averaging
    (extract_features_tal.py's 400 ms averaging option)."""
    feats = np.asarray(model.apply(variables, jnp.asarray(audio)[None])[0])
    if window_s is None:
        return feats
    # extractor hop: product of strides = 160 samples = 10 ms
    hop_s = np.prod([s for _, _, s in EXTRACTOR_PLAN]) / sample_rate
    per_win = max(int(round(window_s / hop_s)), 1)
    n_win = len(feats) // per_win
    if n_win == 0:
        return feats.mean(axis=0, keepdims=True)
    return feats[: n_win * per_win].reshape(n_win, per_win, -1).mean(axis=1)


def extract_corpus_features(
    model, variables, dataset, out_path: str,
    checkpoint_every: int = 10, window_s: Optional[float] = 0.4,
):
    """Corpus-wide extraction with incremental checkpoint/resume
    (extract_features_tal.py:95-117,236-240 parity: completed items are
    skipped on re-run; errors recorded, not fatal)."""
    import os
    import pickle

    ckpt = out_path + ".CHECKPOINT.pkl"
    errors_path = out_path + ".ERRORS.pkl"
    done: Dict = {}
    errors: Dict = {}
    if os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            done = pickle.load(f)
    for i in range(len(dataset)):
        key = str(i)
        if key in done:
            continue
        try:
            item = dataset[i]
            audio = item[0] if isinstance(item, tuple) else item
            done[key] = extract_utterance_features(model, variables, audio, window_s)
        except Exception as e:  # quarantine, keep going
            errors[key] = repr(e)
        if len(done) % checkpoint_every == 0:
            with open(ckpt, "wb") as f:
                pickle.dump(done, f)
    with open(ckpt, "wb") as f:
        pickle.dump(done, f)
    if errors:
        with open(errors_path, "wb") as f:
            pickle.dump(errors, f)
    with open(out_path, "wb") as f:
        pickle.dump(done, f)
    return done, errors
