from tal_asrd_tpu.diarization.uisrnn import (
    UISRNN,
    UISRNNConfig,
    UISRNNInferenceConfig,
    UISRNNTrainConfig,
    estimate_transition_bias,
    resize_sequence,
)
from tal_asrd_tpu.diarization.evals import diarization_error_rate, evaluate_result
from tal_asrd_tpu.diarization.gru import GRU, GRUCell
from tal_asrd_tpu.diarization.wav2vec import (
    ConvAggregator,
    ConvFeatureExtractor,
    Wav2VecFeatures,
    extract_corpus_features,
    extract_utterance_features,
    init_wav2vec,
)
from tal_asrd_tpu.diarization.experiment import kfold_experiment, streaming_fit

__all__ = [
    "UISRNN",
    "UISRNNConfig",
    "UISRNNInferenceConfig",
    "UISRNNTrainConfig",
    "estimate_transition_bias",
    "resize_sequence",
    "diarization_error_rate",
    "evaluate_result",
    "GRU",
    "GRUCell",
    "ConvAggregator",
    "ConvFeatureExtractor",
    "Wav2VecFeatures",
    "extract_corpus_features",
    "extract_utterance_features",
    "init_wav2vec",
    "kfold_experiment",
    "streaming_fit",
]
