"""Joint ASR + speaker-diarization encoder-decoder model.

TPU-native re-design of ASRModel (/root/reference/tal/asr/models.py:56-295):
log-mel frontend -> TDS conv encoder (8x time reduction) -> linear projection
to decoder width -> ReZero transformer decoder with cross-attention, factorized
tied token embeddings (embed_size=64), vocabulary = text BPE + appended
speaker tokens, and an optional speaker head (a second half-depth decoder over
a separate encoder projection producing per-token speaker logits,
models.py:130-146,249-289).

Differences by design:
  * the frontend + SpecAugment are fused XLA ops (tal_asrd_tpu.ops), not
    torchaudio + Python loops;
  * decode() returns (logits, per-layer cross-attention weights) explicitly;
  * decode_step()/init_decode_state() provide KV-cached single-token decoding
    for the beam/unaligned decoders (the reference re-decodes the full prefix
    per generated token);
  * compute dtype is bfloat16 (configurable), params float32.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig, SpecAugmentConfig
from tal_asrd_tpu.models.decoder import (
    PositionalEncoding,
    RZDecoder,
    sinusoidal_positions,
)
from tal_asrd_tpu.models.tds import TDS
from tal_asrd_tpu.ops.logmel import log_mel_spectrogram
from tal_asrd_tpu.ops.specaug import spec_augment


def _embed_init(dim: int):
    """Uniform(-1/sqrt(dim), 1/sqrt(dim)) — weight_init at tal/modules.py:6-21."""
    bound = 1.0 / math.sqrt(dim)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def encoder_padding_mask(audio_lens: jax.Array, max_audio_len: int, enc_t: int,
                         mode: str = "buffer") -> jax.Array:
    """[B] sample lengths -> [B, enc_t] bool mask, True = padding.

    mode='buffer' (default): the reference's integer-division scaling
    `scaled_lens = audio_lens // (audio_lens.max() // enc_T)`
    (models.py:177-187) with the batch max replaced by the padded buffer
    length — identical whenever the longest sample fills the buffer, and
    well-defined under bucketed static shapes.

    mode='batch_max': exact reference parity — the divisor is derived from
    the BATCH max length, so when the longest sample underfills the bucket
    every sample's scaled length grows by max_audio_len/batch_max (the
    reference always collates to the batch max, so there the two coincide;
    under bucketed collation they differ — quantified in
    tests/test_deviations.py and ARCHITECTURE.md)."""
    if mode == "batch_max":
        factor = jnp.maximum(jnp.max(audio_lens) // max(enc_t, 1), 1)
    else:
        factor = max(max_audio_len // max(enc_t, 1), 1)
    scaled = audio_lens // factor
    pos = jnp.arange(enc_t)
    return pos[None, :] >= scaled[:, None]


class ASRModel(nn.Module):
    cfg: ModelConfig
    frontend: FrontendConfig = FrontendConfig()
    specaug: SpecAugmentConfig = SpecAugmentConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.d_decoder
        self.encoder = TDS(
            input_size=c.n_mels,
            sizes=c.tds_channels,
            depths=c.tds_depths,
            kernel=c.tds_kernel,
            dropout=c.tds_dropout,
            dtype=self.dtype,
            remat=c.remat,
            conv_impl=c.conv_impl,
        )
        self.decoder_proj = nn.Dense(d, dtype=self.dtype)
        self.enc_drop = nn.Dropout(c.dropout)

        embed_dim = c.embed_size if c.embed_size else d
        self.embedding = nn.Embed(
            c.num_tokens, embed_dim, embedding_init=_embed_init(embed_dim),
            dtype=self.dtype,
        )
        if c.embed_size:
            # Factorized-embedding projection, used forward (embed -> d) and
            # transposed on the output head (models.py:220-221,243-244). An
            # explicit kernel (not a Dense) because both directions share it.
            self.embedding_proj_kernel = self.param(
                "embedding_proj", nn.initializers.lecun_normal(), (embed_dim, d),
                jnp.float32,
            )
        self.pos_dec = PositionalEncoding(d, c.max_positions, c.dropout, self.dtype)
        if c.enc_posenc:
            # Gate for the memory positional code (core/config.py enc_posenc).
            self.mem_pos_alpha = self.param(
                "mem_pos_alpha", nn.initializers.zeros, (), jnp.float32)
        self.decoder = RZDecoder(
            n_layers=c.n_decoder_layers,
            d_model=d,
            n_head=c.n_head,
            dim_feedforward=4 * d,
            dropout=c.dropout,
            dtype=self.dtype,
        )
        if c.use_speaker_head:
            self.spk_enc_proj = nn.Dense(d, dtype=self.dtype)
            self.spk_decoder = RZDecoder(
                n_layers=c.n_decoder_layers // 2,
                d_model=d,
                n_head=c.n_head,
                dim_feedforward=4 * d,
                dropout=c.dropout,
                dtype=self.dtype,
            )
            self.speaker_head_1 = nn.Dense(c.spk_embed, dtype=self.dtype)
            self.speaker_head_2 = nn.Dense(c.num_speakers, dtype=self.dtype)

    # ------------------------------------------------------------------
    # Encoder side
    # ------------------------------------------------------------------
    def extract_features(self, audio: jax.Array, train: bool = False,
                         use_specaug: bool = True,
                         audio_lens: Optional[jax.Array] = None):
        """Raw audio [B, T] -> log-mel [B, F, n_mels] (models.py:154-162).

        int16 input is accepted and scaled on-device (halves host->device
        transfer; wavs are 16-bit PCM at the source, so it is lossless).
        audio_lens enables the bucket-safe masked mean (ops/logmel.py)."""
        if audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) / 32768.0
        mel = log_mel_spectrogram(audio.astype(jnp.float32), self.frontend,
                                  audio_lens=audio_lens)
        if train and use_specaug:
            mel = spec_augment(self.make_rng("specaug"), mel, self.specaug)
        return mel.astype(self.dtype)

    def encode_features(
        self, feats: jax.Array, audio_lens: Optional[jax.Array] = None,
        max_audio_len: Optional[int] = None, train: bool = False,
    ) -> Dict[str, Any]:
        """Log-mel -> encoder memory dict (models.py:164-193)."""
        h = self.encoder(feats, train=train)  # [B, S, C_enc]
        spk_h = self.spk_enc_proj(h) if self.cfg.use_speaker_head else None
        x = self.decoder_proj(h)

        mask = None
        if audio_lens is not None:
            assert max_audio_len is not None
            mask = encoder_padding_mask(audio_lens, max_audio_len, x.shape[1],
                                        mode=self.cfg.pad_mask_mode)
        return {"encoder_out": x, "speaker_out": spk_h, "encoder_padding_mask": mask}

    def encode(self, audio: jax.Array, audio_lens: Optional[jax.Array] = None,
               train: bool = False) -> Dict[str, Any]:
        feats = self.extract_features(audio, train=train, audio_lens=audio_lens)
        return self.encode_features(feats, audio_lens, audio.shape[-1], train=train)

    # ------------------------------------------------------------------
    # Decoder side
    # ------------------------------------------------------------------
    def add_mem_posenc(self, mem: jax.Array) -> jax.Array:
        """Gated positional code on decode-side memory (enc_posenc).

        Applied at every point where memory enters cross-attention K/V —
        decode(), decode_spk(), init_decode_state(), precompute_mem_kvs() —
        AFTER any window slicing, so positions are window-relative. The table
        is sized to the actual memory length (constant-folded under jit)."""
        if not self.cfg.enc_posenc:
            return mem
        pe = jnp.asarray(
            sinusoidal_positions(mem.shape[1], mem.shape[-1]), self.dtype)
        return mem + self.mem_pos_alpha.astype(self.dtype) * pe[None]

    def embed_tokens(self, y: jax.Array) -> jax.Array:
        e = self.embedding(y)
        if self.cfg.embed_size:
            e = e @ self.embedding_proj_kernel.astype(self.dtype)
        return e

    def output_logits(self, h: jax.Array) -> jax.Array:
        """Tied factorized head: h -> embed space -> vocab (models.py:243-246)."""
        if self.cfg.embed_size:
            h = h @ self.embedding_proj_kernel.astype(self.dtype).T
        return self.embedding.attend(h)

    def decode(
        self,
        y_prev: jax.Array,                # [B, L] token ids
        encoder_out: Dict[str, Any],
        causal: bool = True,
        train: bool = False,
        tgt_key_padding_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Teacher-forced / full-prefix decode.

        Returns (logits [B, L, num_tokens], cross-attn weights [layers, B, L, S]).
        The reference decodes with causal_mask=True in training and =False in
        generation (system.py:113); `causal` selects between the two.
        tgt_key_padding_mask (True = ignore) lets non-causal fixed-buffer
        decoding exclude padded future positions (decode/reference_mode.py).
        """
        mem = self.enc_drop(encoder_out["encoder_out"], deterministic=not train)
        mem = self.add_mem_posenc(mem)
        y = self.embed_tokens(y_prev)
        y = self.pos_dec(y, train=train)
        h, attn, _ = self.decoder(
            y,
            mem,
            causal=causal,
            memory_key_padding_mask=encoder_out["encoder_padding_mask"],
            train=train,
            tgt_key_padding_mask=tgt_key_padding_mask,
        )
        return self.output_logits(h), attn

    def decode_spk(
        self,
        y_prev: jax.Array,
        encoder_out: Dict[str, Any],
        causal: bool = True,
        train: bool = False,
    ) -> jax.Array:
        """Speaker head decode -> per-token speaker logits (models.py:249-289)."""
        mem = self.enc_drop(encoder_out["speaker_out"], deterministic=not train)
        mem = self.add_mem_posenc(mem)
        y = self.embed_tokens(y_prev)
        y = self.pos_dec(y, train=train)
        h, _, _ = self.spk_decoder(
            y,
            mem,
            causal=causal,
            memory_key_padding_mask=encoder_out["encoder_padding_mask"],
            train=train,
        )
        return self.speaker_head_2(self.speaker_head_1(h))

    def __call__(self, audio: jax.Array, y_prev: jax.Array, audio_lens: jax.Array,
                 train: bool = False):
        """Full forward (models.py:291-295). Returns ((lm_logits, spk_logits),
        encoder_out); lm path also returns attention in decode() for callers
        that need it."""
        encoder_out = self.encode(audio, audio_lens, train=train)
        lm_logits, _ = self.decode(y_prev, encoder_out, causal=True, train=train)
        spk_logits = (
            self.decode_spk(y_prev, encoder_out, causal=True, train=train)
            if self.cfg.use_speaker_head
            else None
        )
        return (lm_logits, spk_logits), encoder_out

    # ------------------------------------------------------------------
    # KV-cached incremental decoding
    # ------------------------------------------------------------------
    def init_decode_state(self, encoder_out: Dict[str, Any], batch: int, max_len: int):
        """Build decode state: per-layer cross-attn K/V (one-time) + empty
        self-attn caches + step index."""
        state = {
            "mem_kvs": self.decoder.precompute_mem_kvs(
                self.add_mem_posenc(encoder_out["encoder_out"])),
            "caches": self.decoder.init_cache(batch, max_len),
            "index": jnp.zeros((), jnp.int32),
            "mask": encoder_out["encoder_padding_mask"],
        }
        if self.cfg.use_speaker_head:
            state["spk_mem_kvs"] = self.spk_decoder.precompute_mem_kvs(
                self.add_mem_posenc(encoder_out["speaker_out"])
            )
            state["spk_caches"] = self.spk_decoder.init_cache(batch, max_len)
        return state

    def decode_step(self, y_tok: jax.Array, state: Dict[str, Any]):
        """One decode step with KV caches.

        y_tok: [B, 1] current input token. Returns (logits [B, num_tokens],
        mean-layer cross-attn [B, S], new_state).
        """
        idx = state["index"]
        y = self.embed_tokens(y_tok)
        y = self.pos_dec(y, train=False, offset=idx)
        h, attn, new_caches = self.decoder(
            y,
            None,
            memory_key_padding_mask=state["mask"],
            train=False,
            caches=state["caches"],
            cache_index=idx,
            mem_kvs=state["mem_kvs"],
        )
        logits = self.output_logits(h)[:, -1]
        new_state = dict(state, caches=new_caches, index=idx + 1)

        spk_logits = None
        if self.cfg.use_speaker_head and "spk_caches" in state:
            hs, _, new_spk_caches = self.spk_decoder(
                y,
                None,
                memory_key_padding_mask=state["mask"],
                train=False,
                caches=state["spk_caches"],
                cache_index=idx,
                mem_kvs=state["spk_mem_kvs"],
            )
            spk_logits = self.speaker_head_2(self.speaker_head_1(hs))[:, -1]
            new_state["spk_caches"] = new_spk_caches

        # attn: [layers, B, 1, S] -> mean over layers -> [B, S]
        attn_mean = jnp.mean(attn[:, :, 0, :], axis=0)
        return logits, spk_logits, attn_mean, new_state

    # ------------------------------------------------------------------
    # Window-based decoding helpers (unaligned long-form decoder)
    # ------------------------------------------------------------------
    def precompute_mem_kvs(self, memory: jax.Array):
        """Cross-attention K/V for an encoder window (one-time per window).

        Callers pass the ALREADY-SLICED window memory, so the enc_posenc
        positional code lands window-relative here (matching training)."""
        return self.decoder.precompute_mem_kvs(self.add_mem_posenc(memory))

    def decode_prefill(
        self,
        y: jax.Array,                     # [B, P] history token buffer
        mem_kvs,
        mem_mask: Optional[jax.Array],    # [B, S] True = pad
        cache_len: int,
    ):
        """Causal full decode of a history buffer that also fills the
        self-attention KV caches (positions restart at 0 for the slice,
        matching the reference's re-sliced model_input, system.py:338).

        Returns (logits [B, P, V], mean-layer cross-attn [B, P, S], caches).
        """
        caches = self.decoder.init_cache(y.shape[0], cache_len)
        e = self.embed_tokens(y)
        e = self.pos_dec(e, train=False)
        h, attn, caches = self.decoder(
            e,
            None,
            memory_key_padding_mask=mem_mask,
            train=False,
            caches=caches,
            cache_index=jnp.zeros((), jnp.int32),
            mem_kvs=mem_kvs,
        )
        return self.output_logits(h), jnp.mean(attn, axis=0), caches
