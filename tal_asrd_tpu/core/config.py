"""Typed configuration for models, data, training and decoding.

The reference wires hyperparameters through argparse Namespaces
(/root/reference/tal/asr/args.py:4-62). Here configs are frozen dataclasses so
they can be hashed into jit static args, serialized next to checkpoints, and
constructed from the CLI layer (tal_asrd_tpu.cli) which preserves the reference
flag names.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class FrontendConfig:
    """Log-mel frontend. Parity target: torchaudio MelSpectrogram defaults as
    instantiated at /root/reference/tal/asr/models.py:22-53 (16 kHz, 80 mel,
    25 ms Hann window, 10 ms hop, power=2, HTK mel, log(mel+1e-6), global mean
    subtraction)."""

    sample_rate: int = 16000
    n_mels: int = 80
    n_fft: int = 400          # int(25/1000 * 16000)
    win_length: int = 400
    hop_length: int = 160     # int(10/1000 * 16000)
    f_min: float = 0.0
    f_max: Optional[float] = None  # defaults to sample_rate / 2
    log_eps: float = 1e-6
    center: bool = True       # torch.stft default: reflect-pad n_fft//2
    mean_subtract: bool = True  # models.py:52 `mel -= mel.mean()`
    use_pallas: bool = False  # fused mel-projection Pallas kernel (TPU only)
    spectrum_impl: str = "auto"  # "fft" | "dft" (windowed DFT as two MXU
                                 # matmuls; see ops/logmel.py AUTO_SPECTRUM)

    @property
    def effective_f_max(self) -> float:
        return self.f_max if self.f_max is not None else self.sample_rate / 2.0


@dataclass(frozen=True)
class SpecAugmentConfig:
    """SpecAugment (freq_mask/time_mask, models.py:531-566): F=27 x2, T=100 x2."""

    freq_mask_param: int = 27
    num_freq_masks: int = 2
    time_mask_param: int = 100
    num_time_masks: int = 2


@dataclass(frozen=True)
class ModelConfig:
    """Joint ASR model (ASRModel, /root/reference/tal/asr/models.py:56-295).

    model_type '1x' -> d_decoder 256; '2x' -> 512; both 4 decoder layers.
    TDS channel plan [n_mels, 10n, 14n, 18n], depths [2,3,6], kernel 21,
    stride-2 between groups => 8x time downsampling.
    """

    model_type: str = "2x"
    num_speakers: int = 0
    n_mels: int = 80
    vocab_size: int = 10000
    n_head: int = 4
    max_positions: int = 512
    dropout: float = 0.2
    embed_size: int = 64       # factorized embedding dim; 0 disables
    spk_embed: int = 128
    use_speaker_head: bool = False
    tds_depths: Tuple[int, ...] = (2, 3, 6)
    tds_kernel: int = 21
    tds_dropout: float = 0.2   # reference passes model-level dropout to TDS
    remat: bool = False        # rematerialize encoder blocks in training
    conv_impl: str = "auto"    # grouped-conv lowering (ops/grouped_conv.py);
                               # "auto" resolves per backend, checkpoints are
                               # interchangeable across impls
    # Encoder padding-mask scaling: 'buffer' (bucket-safe default) or
    # 'batch_max' (exact reference parity, models.py:177-187) — see
    # encoder_padding_mask and tests/test_deviations.py.
    pad_mask_mode: str = "buffer"
    # ReZero-gated sinusoidal positional encoding on the DECODE-SIDE memory
    # (deviation from the reference, which leaves the TDS memory position-
    # free, tal/asr/models.py:195-247). The gate (`mem_pos_alpha`, init 0)
    # keeps old checkpoints bit-identical at load; training learns the scale.
    # Motivation (measured, scripts/diag_ce_by_utt.py + diag_attn.py):
    # content-only cross-attention cannot sharpen onto continuation
    # utterances in a long window — CE of utterances 2..4 pinned at the
    # unigram floor after 8k bridge steps while attention centroids wander
    # 10-30 frames. A positional channel in the memory keys makes monotonic
    # progression expressible. Positions are RELATIVE to the decode window
    # (applied after slicing), matching training windows.
    enc_posenc: bool = False
    # Debug-only architecture shrink (CPU smokes of the full CLI chain on the
    # 1-core box; see scripts/smoke_accuracy.sh). width_mult scales the TDS
    # group widths (10/14/18 per-mel channels), d_decoder_override replaces
    # the model_type-derived decoder width. Production paths never set these.
    width_mult: float = 1.0
    d_decoder_override: Optional[int] = None

    def __post_init__(self):
        if self.model_type not in ("1x", "2x"):
            raise ValueError(f"Invalid model type {self.model_type!r}")

    @property
    def tds_channels(self) -> Tuple[int, ...]:
        n = self.n_mels
        if self.width_mult != 1.0:
            # Widths stay integer multiples of n_mels (TDS grouped-conv view).
            return (n,) + tuple(max(1, round(w * self.width_mult)) * n
                                for w in (10, 14, 18))
        return (n, 10 * n, 14 * n, 18 * n)

    @property
    def d_decoder(self) -> int:
        if self.d_decoder_override is not None:
            return self.d_decoder_override
        return 256 if self.model_type == "1x" else 512

    @property
    def n_decoder_layers(self) -> int:
        return 4

    @property
    def num_tokens(self) -> int:
        """Output vocabulary: text BPE ids plus appended speaker tokens unless a
        separate speaker head is used (models.py:103)."""
        return self.vocab_size if self.use_speaker_head else self.vocab_size + self.num_speakers

    @property
    def time_reduction(self) -> int:
        """Total encoder stride (2 per TDS group)."""
        return 2 ** (len(self.tds_channels) - 1)


@dataclass(frozen=True)
class SDModelConfig:
    """Frame-level speaker classifier baseline (SDModel, models.py:400-485)."""

    num_speakers: int = 6008
    n_mels: int = 80
    dropout: float = 0.2
    embed_size: int = 128
    tds_depths: Tuple[int, ...] = (2, 3, 6)
    tds_kernel: int = 21

    @property
    def tds_channels(self) -> Tuple[int, ...]:
        n = self.n_mels
        return (n, 10 * n, 14 * n, 18 * n)


@dataclass(frozen=True)
class LMConfig:
    """Decoder-only LM used for shallow fusion. The reference instantiates
    `DecoderLMModel(vocab 10000, hidden 512, 4 heads, 6 layers, max_len 512)`
    (tal/asr/test.py:47-55) but the class itself was trimmed from the release;
    this framework provides it first-class."""

    vocab_size: int = 10000
    hidden_size: int = 512
    n_head: int = 4
    n_layers: int = 6
    max_positions: int = 512
    dropout: float = 0.1


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (tal/asr/args.py + system.py:764-781)."""

    batch_size: int = 64
    val_batch_size: Optional[int] = None
    lr: float = 1e-4          # per-sqrt(batch) base LR
    grad_acc: int = 1
    num_data_shards: int = 1  # replaces num_gpus in the LR scaling rule
    max_steps: Optional[int] = None
    max_epochs: int = 100
    smoothing: float = 0.0
    spk_weight: float = 0.0
    lm_weight: float = 0.0
    max_secs: float = 20.0
    token_replace_prob: float = 0.01  # TDS-paper input replacement aug (system.py:542-547)
    seed: int = 42

    @property
    def effective_batch_size(self) -> int:
        return self.num_data_shards * self.batch_size * self.grad_acc

    @property
    def scaled_lr(self) -> Optional[float]:
        """Linear-scaling rule: lr * sqrt(effective batch) (system.py:766-769)."""
        if self.lr is None:
            return None
        return self.lr * (self.effective_batch_size ** 0.5)


@dataclass(frozen=True)
class DecodeConfig:
    """Decoding knobs (args.py:25, system.py:254-524, transcribe.py)."""

    beam_size: int = 5
    max_length: int = 512
    # LM shallow fusion weight (test.py:47-55, system.py:127-138, :368-384);
    # applied in both the beam and the unaligned decoders when an LM is given.
    lm_weight: float = 0.0
    # Unaligned sliding-window decoder state machine:
    chunk_size: int = 357     # encoder frames per window (~28.5 s of audio)
    thresh_prct: float = 0.5
    shift_prct: float = 0.25
    stall_patience: int = 25
    rep_n: int = 5
    skip_prct: float = 0.1
    max_iters: int = 20000
    history_evict_block: int = 64
    # Opt-in extensions to the state machine (decode/unaligned.py:
    # UnalignedSpec.eos_advance / stall_rollback); defaults reproduce the
    # reference loop.
    eos_advance: bool = False
    stall_rollback: bool = False
    # Parity switch: the reference decodes with causal_mask=False (bidirectional
    # prefix re-encode per step, system.py:113-114). 'causal' enables KV-cached
    # causal decoding (matches training-time masking; much faster on TPU);
    # 'noncausal_ref' reproduces the reference behavior exactly.
    self_attn_mode: str = "causal"
    # Run per-token decode steps through the fused Pallas layer-step kernel
    # (ops/pallas_decode.py) — speaker-token models only.
    use_fused_decode: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh shape. The reference's only parallelism is DDP data-parallel
    (tal/asr/train.py:101); `model` adds tensor-parallel headroom."""

    data: int = -1   # -1: all devices on the data axis
    model: int = 1


def to_json(cfg) -> str:
    def default(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        raise TypeError(type(o))

    return json.dumps(dataclasses.asdict(cfg), indent=2, default=default)
