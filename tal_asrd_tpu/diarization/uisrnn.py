"""UIS-RNN: unbounded interleaved-state RNN speaker diarization.

TPU-native re-implementation of the vendored Google UIS-RNN
(/root/reference/tal/diarization/uisrnn/uisrnn.py, loss_func.py, utils.py):

  * CoreRNN = stacked GRU (lax.scan, torch-gate-compatible) + 2-layer head
    predicting the observation mean (uisrnn.py:20-39);
  * fit: per-cluster subsequence resizing with optional permutation sampling
    (utils.py:185-214), zero-prefixed padded batches (utils.py:217-266 —
    masks instead of PackedSequence), cumulative-mean prediction, and the
    three-part loss: masked weighted MSE (loss_func.py:10-32), inverse-gamma
    sigma^2 prior (:35-51), L2-norm regularization (:54-67); Adam + global
    grad clip + sigma^2 clamp (uisrnn.py:243-286). The whole training step is
    one jitted function;
  * predict: CRP beam search over cluster assignments
    (uisrnn.py:378-554). The search tree is host-side (dynamic cluster
    counts), but all candidate (beam x cluster) GRU steps of an iteration are
    batched through one jitted step — replacing the reference's per-candidate
    Python calls;
  * transition-bias estimation across sequences with smoothing
    (utils.py:304-329).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from tal_asrd_tpu.core.checkpoint import load_pytree, save_pytree
from tal_asrd_tpu.diarization.gru import GRU

_INITIAL_SIGMA2_VALUE = 0.1


@dataclass
class UISRNNConfig:
    observation_dim: int = 256
    rnn_hidden_size: int = 512
    rnn_depth: int = 1
    rnn_dropout: float = 0.0
    transition_bias: Optional[float] = None   # None = estimate from data
    crp_alpha: float = 1.0
    sigma2: Optional[float] = None            # None = learn


@dataclass
class UISRNNTrainConfig:
    learning_rate: float = 1e-3
    train_iteration: int = 20000
    batch_size: Optional[int] = 10
    num_permutations: Optional[int] = 10
    sigma_alpha: float = 1.0
    sigma_beta: float = 1.0
    regularization_weight: float = 1e-5
    grad_max_norm: float = 5.0
    quick_test: bool = False
    log_iter: int = 1000


@dataclass
class UISRNNInferenceConfig:
    beam_size: int = 10
    look_ahead: int = 1
    test_iteration: int = 2


class CoreRNN(nn.Module):
    """GRU core + mean head (uisrnn.py:20-39 parity)."""

    hidden_size: int
    depth: int
    observation_dim: int

    def setup(self):
        self.gru = GRU(self.hidden_size, self.depth)
        self.linear_mean1 = nn.Dense(self.hidden_size)
        self.linear_mean2 = nn.Dense(self.observation_dim)

    def __call__(self, x, h0=None, mask=None):
        out, h = self.gru(x, h0, mask)
        mean = self.linear_mean2(nn.relu(self.linear_mean1(out)))
        return mean, h


# ---------------------------------------------------------------------------
# Data shaping (utils.py parity)
# ---------------------------------------------------------------------------

def sample_permuted_segments(index_sequence, number_samples, rng):
    """Block-permutation augmentation (utils.py:150-182 semantics): split the
    index set at discontinuities, then emit permutations of the blocks."""
    segments = []
    current = [index_sequence[0]]
    for prev, nxt in zip(index_sequence[:-1], index_sequence[1:]):
        if nxt == prev + 1:
            current.append(nxt)
        else:
            segments.append(current)
            current = [nxt]
    segments.append(current)
    out = []
    for _ in range(number_samples):
        perm = rng.permutation(len(segments))
        out.append(np.concatenate([np.asarray(segments[p]) for p in perm]))
    return out


def resize_sequence(sequence, cluster_id, num_permutations=None, seed=0):
    """Group observations by cluster into subsequences (utils.py:185-214)."""
    rng = np.random.RandomState(seed)
    unique_id = np.unique(cluster_id)
    sub_sequences, seq_lengths = [], []
    for uid in unique_id:
        idx = np.where(cluster_id == uid)[0]
        if num_permutations and num_permutations > 1:
            for perm in sample_permuted_segments(idx, num_permutations, rng):
                sub_sequences.append(sequence[perm, :])
                seq_lengths.append(len(idx) + 1)
        else:
            sub_sequences.append(sequence[idx, :])
            seq_lengths.append(len(idx) + 1)
    return sub_sequences, seq_lengths


def pack_batch(sub_sequences, seq_lengths, batch_indices, observation_dim):
    """Zero-prefixed padded batch [B, T, D] + per-step mask (utils.py:217-266
    without PackedSequence: masks carry the lengths)."""
    lens = [seq_lengths[i] for i in batch_indices]
    t_max = max(lens)
    b = len(batch_indices)
    x = np.zeros((b, t_max, observation_dim), np.float32)
    mask = np.zeros((b, t_max), bool)
    for bi, si in enumerate(batch_indices):
        seq = sub_sequences[si]
        x[bi, 1 : len(seq) + 1] = seq      # input row 0 stays zero
        mask[bi, : len(seq) + 1] = True
    truth = x[:, 1:, :]
    return x, truth, mask


def estimate_transition_bias(cluster_ids, smooth=1):
    """Speaker-change probability with smoothing (utils.py:304-329)."""
    transit_num = smooth
    denom = 2 * smooth
    for seq in cluster_ids:
        for a, b in zip(seq[:-1], seq[1:]):
            transit_num += int(a != b)
            denom += 1
    return transit_num / denom, denom


def concatenate_training_data(sequences, cluster_ids, enforce_uniqueness=True):
    """Concatenate utterances, optionally uniquifying cluster ids per
    utterance (utils.py concatenate_training_data semantics)."""
    all_seq = []
    all_ids = []
    for k, (seq, ids) in enumerate(zip(sequences, cluster_ids)):
        all_seq.append(np.asarray(seq, float))
        prefix = f"seq{k}_" if enforce_uniqueness else ""
        all_ids.extend(prefix + str(i) for i in ids)
    return np.concatenate(all_seq, axis=0), np.asarray(all_ids)


# ---------------------------------------------------------------------------
# Losses (loss_func.py parity)
# ---------------------------------------------------------------------------

def weighted_mse_loss(input_tensor, target_tensor, weight):
    """Masked weighted MSE with the reference's normalization
    (loss_func.py:10-32): sum over entries of diff^2 * w / #nonzero-rows."""
    d = input_tensor.shape[-1]
    diff2 = ((input_tensor - target_tensor) ** 2).reshape(-1, d)
    non_zero = jnp.maximum(jnp.sum(diff2[:, 0] != 0), 1)
    return jnp.sum(diff2 * weight.reshape(1, -1)) / non_zero


def sigma2_prior_loss(num_non_zero, sigma_alpha, sigma_beta, sigma2):
    nnz = jnp.maximum(num_non_zero, 1.0)
    return jnp.sum(
        (2 * sigma_alpha + nnz + 2) / (2 * nnz) * jnp.log(sigma2)
    ) + jnp.sum(sigma_beta / (sigma2 * nnz))


def regularization_loss(params, weight):
    # safe norm: d/dp sqrt(sum p^2) is NaN at p == 0 (zero-init biases)
    return weight * sum(
        jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2) + 1e-12)
        for p in jax.tree_util.tree_leaves(params)
    )


# ---------------------------------------------------------------------------
# Beam state (host side)
# ---------------------------------------------------------------------------

class BeamState:
    """CRP beam search bookkeeping (uisrnn.py:42-64 parity)."""

    def __init__(self, source: Optional["BeamState"] = None):
        if source is None:
            self.mean_set: List[np.ndarray] = []
            self.hidden_set: List[np.ndarray] = []
            self.neg_likelihood = 0.0
            self.trace: List[int] = []
            self.block_counts: List[int] = []
        else:
            self.mean_set = list(source.mean_set)
            self.hidden_set = list(source.hidden_set)
            self.trace = list(source.trace)
            self.block_counts = list(source.block_counts)
            self.neg_likelihood = source.neg_likelihood

    def append(self, mean, hidden, cluster):
        self.mean_set.append(np.array(mean))
        self.hidden_set.append(np.array(hidden))
        self.block_counts.append(1)
        self.trace.append(cluster)


class UISRNN:
    def __init__(self, cfg: UISRNNConfig, seed: int = 0):
        self.cfg = cfg
        self.model = CoreRNN(cfg.rnn_hidden_size, cfg.rnn_depth, cfg.observation_dim)
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 2, cfg.observation_dim))
        self.params = self.model.init(rng, dummy)["params"]
        self.init_hidden = jnp.zeros((cfg.rnn_depth, 1, cfg.rnn_hidden_size))
        self.estimate_sigma2 = cfg.sigma2 is None
        self.estimate_transition_bias = cfg.transition_bias is None
        sigma2 = _INITIAL_SIGMA2_VALUE if self.estimate_sigma2 else cfg.sigma2
        self.sigma2 = jnp.full((cfg.observation_dim,), sigma2)
        self.transition_bias = cfg.transition_bias
        self.transition_bias_denominator = 0.0
        self.crp_alpha = cfg.crp_alpha

        # jitted single-step rnn for beam search: x [B, 1, D], h [depth, B, H]
        @jax.jit
        def rnn_step(params, x, h):
            mean, h_out = self.model.apply({"params": params}, x, h)
            return mean[:, -1, :], h_out

        self._rnn_step = rnn_step

    # -- persistence ----------------------------------------------------
    def save(self, path: str):
        save_pytree(path, {
            "params": self.params,
            "init_hidden": self.init_hidden,
            "sigma2": self.sigma2,
            "transition_bias": np.float64(self.transition_bias or 0.0),
            "transition_bias_denominator": np.float64(self.transition_bias_denominator),
            "crp_alpha": np.float64(self.crp_alpha),
        })

    def load(self, path: str):
        d = load_pytree(path)
        self.params = d["params"]
        self.init_hidden = jnp.asarray(d["init_hidden"])
        self.sigma2 = jnp.asarray(d["sigma2"])
        self.transition_bias = float(d["transition_bias"])
        self.transition_bias_denominator = float(d["transition_bias_denominator"])
        self.crp_alpha = float(d["crp_alpha"])

    # -- training -------------------------------------------------------
    def fit_concatenated(self, train_sequence, train_cluster_id,
                         args: UISRNNTrainConfig, seed: int = 0):
        train_sequence = np.asarray(train_sequence, np.float64)
        train_cluster_id = np.asarray(train_cluster_id)
        assert train_sequence.ndim == 2
        assert train_sequence.shape[0] == len(train_cluster_id)
        assert train_sequence.shape[1] == self.cfg.observation_dim

        sub_sequences, seq_lengths = resize_sequence(
            train_sequence, train_cluster_id, args.num_permutations, seed
        )
        n_clusters = len(sub_sequences)
        rng = np.random.RandomState(seed)

        tx = optax.chain(
            optax.clip_by_global_norm(args.grad_max_norm),
            optax.adam(args.learning_rate),
        )
        trainable = {"params": self.params, "init_hidden": self.init_hidden}
        if self.estimate_sigma2:
            trainable["sigma2"] = self.sigma2
        opt_state = tx.init(trainable)

        model = self.model
        est_sigma2 = self.estimate_sigma2
        fixed_sigma2 = self.sigma2

        def loss_fn(tr, x, truth, mask):
            sigma2 = tr.get("sigma2", fixed_sigma2)
            sigma2 = jnp.maximum(sigma2, 1e-6)
            b = x.shape[0]
            h0 = jnp.tile(tr["init_hidden"], (1, b, 1))
            mean, _ = model.apply({"params": tr["params"]}, x, h0, mask)
            # cumulative-mean prediction (uisrnn.py:256-262)
            csum = jnp.cumsum(mean, axis=1)
            denom = jnp.arange(1, mean.shape[1] + 1, dtype=jnp.float32)
            mean = csum / denom[None, :, None]

            truth_nonzero = (truth != 0).astype(jnp.float32)
            pred = truth_nonzero * mean[:, :-1, :]
            weight = 1.0 / (2.0 * sigma2)
            loss1 = weighted_mse_loss(pred, truth, weight)

            w2 = ((pred - truth) ** 2).reshape(-1, truth.shape[-1])
            num_non_zero = jnp.sum((w2 != 0).astype(jnp.float32), axis=0)
            loss2 = sigma2_prior_loss(
                num_non_zero, args.sigma_alpha, args.sigma_beta, sigma2
            )
            loss3 = regularization_loss(tr["params"], args.regularization_weight)
            return loss1 + loss2 + loss3, (loss1, loss2, loss3)

        @jax.jit
        def train_step(tr, opt_state, x, truth, mask):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                tr, x, truth, mask
            )
            updates, opt_state = tx.update(grads, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            if "sigma2" in tr:
                tr["sigma2"] = jnp.maximum(tr["sigma2"], 1e-6)  # clamp
            return tr, opt_state, loss, aux

        n_iter = 5 if args.quick_test else args.train_iteration
        batch_size = args.batch_size or n_clusters
        batch_size = min(batch_size, n_clusters)
        losses = []
        for it in range(n_iter):
            batch_idx = np.sort(rng.choice(n_clusters, batch_size, replace=False))
            x, truth, mask = pack_batch(
                sub_sequences, seq_lengths, batch_idx, self.cfg.observation_dim
            )
            trainable, opt_state, loss, aux = train_step(
                trainable, opt_state, jnp.asarray(x), jnp.asarray(truth),
                jnp.asarray(mask),
            )
            losses.append(float(aux[0]))
            if it % args.log_iter == 0 or it == n_iter - 1:
                print(f"[uisrnn] iter {it} loss {float(loss):.4f} nll {losses[-1]:.4f}")

        self.params = trainable["params"]
        self.init_hidden = trainable["init_hidden"]
        if est_sigma2:
            self.sigma2 = trainable["sigma2"]
        return losses

    def fit(self, train_sequences, train_cluster_ids, args: UISRNNTrainConfig):
        """uisrnn.py:305-376 parity: estimate transition bias across
        sequences, concatenate, fit."""
        if isinstance(train_sequences, np.ndarray):
            train_sequences = [train_sequences]
            train_cluster_ids = [train_cluster_ids]
        if self.estimate_transition_bias:
            bias, denom = estimate_transition_bias(train_cluster_ids)
            if self.transition_bias is None:
                self.transition_bias = bias
                self.transition_bias_denominator = denom
            else:
                self.transition_bias = (
                    self.transition_bias * self.transition_bias_denominator
                    + bias * denom
                ) / (self.transition_bias_denominator + denom)
                self.transition_bias_denominator += denom
        seq, ids = concatenate_training_data(train_sequences, train_cluster_ids)
        return self.fit_concatenated(seq, ids, args)

    # -- inference ------------------------------------------------------
    def _step(self, x_rows: np.ndarray, hiddens: np.ndarray):
        """Batched single GRU step: x_rows [B, D], hiddens [B, depth, 1, H]
        -> (means [B, D], new hiddens)."""
        b = x_rows.shape[0]
        h = jnp.asarray(hiddens).transpose(1, 0, 2, 3).reshape(
            self.cfg.rnn_depth, b, self.cfg.rnn_hidden_size
        )
        mean, h_out = self._rnn_step(self.params, jnp.asarray(x_rows)[:, None, :], h)
        h_np = np.asarray(h_out).reshape(
            self.cfg.rnn_depth, b, 1, self.cfg.rnn_hidden_size
        ).transpose(1, 0, 2, 3)
        return np.asarray(mean), h_np

    def _update_beam_state(self, beam_state: BeamState, look_ahead_seq,
                           cluster_seq) -> BeamState:
        """uisrnn.py:378-443 parity (per-candidate path)."""
        sigma2 = np.asarray(self.sigma2)
        weight = 1.0 / (2.0 * sigma2)
        new = BeamState(beam_state)
        loss = 0.0
        for sub_idx, cluster in enumerate(cluster_seq):
            obs = np.asarray(look_ahead_seq[sub_idx])
            k = len(new.mean_set)
            if cluster > k:
                new.neg_likelihood = float("inf")
                break
            if cluster < k:  # existing cluster
                last = new.trace[-1]
                diff2 = (np.asarray(new.mean_set[cluster]).reshape(-1) - obs) ** 2
                loss = float(np.sum(diff2 * weight))
                if cluster == last:
                    loss -= math.log(1 - self.transition_bias)
                else:
                    loss -= (
                        math.log(self.transition_bias)
                        + math.log(new.block_counts[cluster])
                        - math.log(sum(new.block_counts) + self.crp_alpha)
                    )
                mean, hidden = self._step(obs[None], new.hidden_set[cluster][None])
                count = sum(1 for t in new.trace if t == cluster)
                new.mean_set[cluster] = (
                    np.asarray(new.mean_set[cluster]) * (count - 1) + mean[0]
                ) / count
                new.hidden_set[cluster] = hidden[0]
                if cluster != last:
                    new.block_counts[cluster] += 1
                new.trace.append(cluster)
            else:  # new cluster
                init_h = np.asarray(self.init_hidden).reshape(
                    self.cfg.rnn_depth, 1, self.cfg.rnn_hidden_size
                )[:, None]
                init_h = init_h.transpose(1, 0, 2, 3)  # [1, depth, 1, H]
                mean0, h0 = self._step(
                    np.zeros((1, self.cfg.observation_dim), np.float32), init_h
                )
                diff2 = (mean0[0] - obs) ** 2
                loss = float(np.sum(diff2 * weight))
                loss -= (
                    math.log(self.transition_bias)
                    + math.log(self.crp_alpha)
                    - math.log(sum(new.block_counts) + self.crp_alpha)
                )
                mean, hidden = self._step(obs[None], h0)
                new.append(mean[0], hidden[0], cluster)
            new.neg_likelihood += loss
        return new

    def _calculate_score(self, beam_state: BeamState, look_ahead_seq):
        look_ahead = look_ahead_seq.shape[0]
        k = len(beam_state.mean_set)
        shape = tuple(k + 1 + np.arange(look_ahead))
        scores = np.full(shape, np.inf)
        for cluster_seq in np.ndindex(*shape):
            updated = self._update_beam_state(beam_state, look_ahead_seq, cluster_seq)
            scores[cluster_seq] = updated.neg_likelihood
        return scores

    def predict_single(self, test_sequence, args: UISRNNInferenceConfig):
        """uisrnn.py:470-554 parity."""
        test_sequence = np.asarray(test_sequence, float)
        assert test_sequence.ndim == 2
        n, d = test_sequence.shape
        assert d == self.cfg.observation_dim
        assert self.transition_bias is not None, "fit or set transition_bias first"

        seq = np.tile(test_sequence, (args.test_iteration, 1)).astype(np.float32)
        beam_set = [BeamState()]
        for start in range(0, args.test_iteration * n, args.look_ahead):
            look = seq[start : start + args.look_ahead]
            max_clusters = max(len(b.mean_set) for b in beam_set)
            shape = (args.beam_size,) + tuple(
                max_clusters + 1 + np.arange(look.shape[0])
            )
            score_set = np.full(shape, np.inf)
            for rank, bs in enumerate(beam_set):
                s = self._calculate_score(bs, look)
                pad = [(0, shape[1 + ax] - s.shape[ax]) for ax in range(s.ndim)]
                score_set[rank] = np.pad(s, pad, constant_values=np.inf)
            flat_order = np.argsort(score_set, axis=None)
            n_finite = int(np.isfinite(np.sort(score_set, axis=None)).sum())
            new_set = []
            for r in range(min(n_finite, args.beam_size)):
                idx = np.unravel_index(flat_order[r], score_set.shape)
                new_set.append(
                    self._update_beam_state(beam_set[idx[0]], look, idx[1:])
                )
            beam_set = new_set
        return beam_set[0].trace[-n:]

    def predict(self, test_sequences, args: UISRNNInferenceConfig):
        if isinstance(test_sequences, np.ndarray):
            return self.predict_single(test_sequences, args)
        return [self.predict_single(s, args) for s in test_sequences]


def output_result(model_cfg: UISRNNConfig, train_cfg: UISRNNTrainConfig,
                  test_record) -> str:
    """Experiment summary string (utils.py:269-301 parity)."""
    accuracies = [acc for acc, _ in test_record]
    lines = [
        f"sigma_alpha: {train_cfg.sigma_alpha}",
        f"sigma_beta: {train_cfg.sigma_beta}",
        f"crp_alpha: {model_cfg.crp_alpha}",
        f"learning rate: {train_cfg.learning_rate}",
        f"regularization: {train_cfg.regularization_weight}",
        f"batch size: {train_cfg.batch_size}",
        f"averaged accuracy: {np.mean(accuracies):.6f}",
    ] + [f"  {a:.6f}" for a in accuracies]
    return "\n".join(lines)
