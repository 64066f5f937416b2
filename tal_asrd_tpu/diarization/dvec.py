"""d-vector feature source (placeholder, mirroring the reference).

The reference keeps an empty dvec module noting that d-vectors must come
from an external system — Google's d-vector model is proprietary
(/root/reference/tal/diarization/features/dvec/__init__.py:1-6). The same
applies here: any [N, D] per-utterance embedding matrix can feed UIS-RNN
(`tal_asrd_tpu.diarization.UISRNN`); in-framework sources are the
wav2vec-style extractor (diarization/wav2vec.py), the SD baseline frame
embeddings (baseline/sd_system.py `frame_features`), and the joint model's
expected speaker embeddings (eval/gen_embed.py).
"""

DVEC_SOURCES = (
    "tal_asrd_tpu.diarization.wav2vec",
    "tal_asrd_tpu.baseline.sd_system",
    "tal_asrd_tpu.eval.gen_embed",
)
