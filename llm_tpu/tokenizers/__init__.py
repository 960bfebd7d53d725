"""Tokenizers: SPM / byte-level BPE, constructed from GGUF metadata
(tokenizer.ggml.model dispatch, parity with llama_vocab's tokenizer
factory in /root/reference/src/llama-vocab.cpp)."""

from .bpe import BpeTokenizer
from .spm import SpmTokenizer
from .vocab import TokenType, Vocab, vocab_from_gguf


def tokenizer_from_vocab(vocab: Vocab):
    if vocab.model in ("llama", "spm"):
        return SpmTokenizer(vocab)
    if vocab.model in ("gpt2", "bpe"):
        return BpeTokenizer(vocab)
    raise ValueError(f"unsupported tokenizer model {vocab.model!r}")


def tokenizer_from_gguf(reader):
    return tokenizer_from_vocab(vocab_from_gguf(reader))


__all__ = [
    "BpeTokenizer",
    "SpmTokenizer",
    "TokenType",
    "Vocab",
    "tokenizer_from_gguf",
    "tokenizer_from_vocab",
    "vocab_from_gguf",
]
