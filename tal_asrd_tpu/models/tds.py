"""Time-Depth-Separable (TDS) convolutional acoustic encoder.

Re-design of the reference TDS encoder (/root/reference/tal/asr/models.py:298-397)
for TPU:
  * NTC layout ([batch, time, channels]) so the grouped convolutions lower to
    MXU-friendly contractions;
  * bfloat16 compute / float32 params;
  * ReZero-gated residuals exactly as upstream: one scalar `resweight`
    (init 0) shared by both the depthwise-conv and pointwise-FF residual of a
    block (models.py:321,329-331).

Structure (models.py:349-372): 3 groups; each group opens with a stride-2
grouped conv (kernel 21, VALID padding, groups = n_mels) that changes the
channel count along the plan [80, 800, 1120, 1440], followed by `depth`
TDSBlocks (kernel 21, SAME padding). Total time reduction 8x; receptive field
~141 input frames (~1.41 s).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tal_asrd_tpu.ops.grouped_conv import GroupedConv1D


class TDSBlock(nn.Module):
    """Grouped depthwise conv + pointwise feed-forward, both ReZero-gated.

    Parity: TDSBlock at models.py:298-331 (conv path: grouped conv k=21 SAME,
    ReLU, dropout; FF path: 1x1 conv, ReLU, dropout, 1x1 conv, dropout)."""

    hidden: int
    kernel: int
    groups: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "auto"   # grouped-conv lowering (ops/grouped_conv.py)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        resweight = self.param("resweight", nn.initializers.zeros, (), jnp.float32)
        rw = resweight.astype(self.dtype)

        h = GroupedConv1D(
            self.hidden,
            self.kernel,
            self.groups,
            padding="SAME",
            dtype=self.dtype,
            impl=self.conv_impl,
            name="conv",
        )(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + rw * h

        h = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.hidden, (1,), dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + rw * h
        return x


class TDS(nn.Module):
    """Full TDS acoustic encoder.

    Exposes `extract` (first group, RF 21 frames) and `aggregate` (remaining
    groups) mirroring models.py:374-390, used by downstream feature-extraction
    tooling (e.g. the separate-diarization baseline).
    """

    input_size: int                      # = n_mels = conv group count
    sizes: Sequence[int]                 # channel plan incl. input, e.g. (80, 800, 1120, 1440)
    depths: Sequence[int]                # blocks per group, e.g. (2, 3, 6)
    kernel: int = 21
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    extract_groups: int = 1              # groups in the `extract` stage
    remat: bool = False                  # rematerialize blocks (memory<->FLOPs)
    conv_impl: str = "auto"              # grouped-conv lowering (ops/grouped_conv.py)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, stage: str = "all") -> jax.Array:
        """x: [B, T, n_mels] -> [B, T//8, sizes[-1]].

        stage: 'all' | 'extract' | 'aggregate' (for the feature-extraction
        split used by the diarization baseline)."""
        n_groups = len(self.sizes) - 1
        if stage == "extract":
            groups = range(0, self.extract_groups)
        elif stage == "aggregate":
            groups = range(self.extract_groups, n_groups)
        else:
            groups = range(n_groups)

        # Activation rematerialization: the encoder dominates training memory
        # (e.g. [B, 1000, 1440] bf16 per block for 20 s clips); remat trades
        # it for recompute in the backward pass (jax.checkpoint).
        Block = (
            nn.remat(TDSBlock, static_argnums=(2,)) if self.remat else TDSBlock
        )
        for gi in groups:
            x = GroupedConv1D(
                self.sizes[gi + 1],
                self.kernel,
                self.input_size,
                stride=2,
                padding="VALID",
                dtype=self.dtype,
                impl=self.conv_impl,
                name=f"down_{gi}",
            )(x)
            for bi in range(self.depths[gi]):
                x = Block(
                    hidden=self.sizes[gi + 1],
                    kernel=self.kernel,
                    groups=self.input_size,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    conv_impl=self.conv_impl,
                    name=f"group_{gi}_block_{bi}",
                )(x, train)  # positional: remat static_argnums=(2,)
        return x


def tds_output_length(t: int, n_groups: int = 3, kernel: int = 21) -> int:
    """Output frame count of the encoder for input length t.

    Each group applies one VALID stride-2 conv: t -> (t - kernel) // 2 + 1.
    """
    for _ in range(n_groups):
        t = (t - kernel) // 2 + 1
    return t
