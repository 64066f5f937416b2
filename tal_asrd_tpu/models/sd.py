"""Separate-diarization baseline: frame-level speaker classifier.

Equivalent of SDModel (/root/reference/tal/asr/models.py:400-485): log-mel ->
TDS encoder -> 128-dim speaker embedding projection -> speaker logits over the
full speaker inventory (6008 for TAL). Each output frame covers ~0.08 s of
audio with a ~1.41 s receptive field; used by the reconciliation pipeline
(tal/baseline/reconcile.py) as the "separate SD" system.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tal_asrd_tpu.core.config import FrontendConfig, SDModelConfig, SpecAugmentConfig
from tal_asrd_tpu.models.asr import encoder_padding_mask
from tal_asrd_tpu.models.tds import TDS
from tal_asrd_tpu.ops.logmel import log_mel_spectrogram
from tal_asrd_tpu.ops.specaug import spec_augment


class SDModel(nn.Module):
    cfg: SDModelConfig = SDModelConfig()
    frontend: FrontendConfig = FrontendConfig()
    specaug: SpecAugmentConfig = SpecAugmentConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TDS(
            input_size=self.cfg.n_mels,
            sizes=self.cfg.tds_channels,
            depths=self.cfg.tds_depths,
            kernel=self.cfg.tds_kernel,
            dropout=self.cfg.dropout,
            dtype=self.dtype,
        )
        self.drop = nn.Dropout(self.cfg.dropout)
        self.spk_embed_proj = nn.Dense(self.cfg.embed_size, dtype=self.dtype)
        self.spk_logit_proj = nn.Dense(self.cfg.num_speakers, dtype=self.dtype)

    def extract_features(self, audio: jax.Array, train: bool = False,
                         use_specaug: bool = True,
                         audio_lens: Optional[jax.Array] = None) -> jax.Array:
        mel = log_mel_spectrogram(audio.astype(jnp.float32), self.frontend,
                                  audio_lens=audio_lens)
        if train and use_specaug:
            mel = spec_augment(self.make_rng("specaug"), mel, self.specaug)
        return mel.astype(self.dtype)

    def encode(self, audio: jax.Array, audio_lens: Optional[jax.Array] = None,
               train: bool = False) -> Dict[str, Any]:
        feats = self.extract_features(audio, train=train, audio_lens=audio_lens)
        h = self.encoder(feats, train=train)
        mask = None
        if audio_lens is not None:
            mask = encoder_padding_mask(audio_lens, audio.shape[-1], h.shape[1])
        return {"encoder_out": h, "encoder_padding_mask": mask}

    def embed(self, encoder_out: Dict[str, Any], train: bool = False) -> jax.Array:
        """Frame-level 128-dim speaker embeddings (pre-logit layer)."""
        h = self.drop(encoder_out["encoder_out"], deterministic=not train)
        return self.spk_embed_proj(h)

    def decode(self, encoder_out: Dict[str, Any], train: bool = False) -> jax.Array:
        """[B, S, num_speakers] frame-level speaker logits (models.py:473-481)."""
        return self.spk_logit_proj(self.embed(encoder_out, train=train))

    def __call__(self, audio: jax.Array, audio_lens: Optional[jax.Array] = None,
                 train: bool = False):
        encoder_out = self.encode(audio, audio_lens, train=train)
        return self.decode(encoder_out, train=train), encoder_out
