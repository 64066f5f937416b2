from tal_asrd_tpu.text.tokenizer import Tokenizer
from tal_asrd_tpu.text.bpe import BpeModel, BpeTokenizer, BpeTrainer
from tal_asrd_tpu.text.spm_import import load_sentencepiece_model

__all__ = [
    "Tokenizer",
    "BpeModel",
    "BpeTokenizer",
    "BpeTrainer",
    "load_sentencepiece_model",
]
