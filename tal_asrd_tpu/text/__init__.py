from tal_asrd_tpu.text.tokenizer import Tokenizer
from tal_asrd_tpu.text.bpe import BpeModel, BpeTokenizer, BpeTrainer

__all__ = ["Tokenizer", "BpeModel", "BpeTokenizer", "BpeTrainer"]
