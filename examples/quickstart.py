"""HF -> GGUF -> quantize -> generate, end to end.

Swap `_tiny_model()` for `AutoModelForCausalLM.from_pretrained(...)` and
a real tokenizer to convert an actual checkpoint:

    model = AutoModelForCausalLM.from_pretrained(name)
    tok = AutoTokenizer.from_pretrained(name)
    convert_hf_auto(model, "model.gguf", tokenizer=tok)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import transformers

from llm_tpu.convert.hf_llama import convert_hf_auto
from llm_tpu.gguf.constants import Keys
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context
from llm_tpu.tools.quantize import quantize_model


def _tiny_vocab(n=256):
    """Minimal SPM vocab (unk/bos/eos + printable chars + filler)."""
    K = Keys.Tokenizer
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    for ch in ("▁" + "abcdefghijklmnopqrstuvwxyz"
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,!?':;-()"):
        tokens.append(ch)
        types.append(1)
    while len(tokens) < n:
        tokens.append(f"<extra_{len(tokens)}>")
        types.append(5)
    scores = [0.0] * 3 + [-float(i) for i in range(n - 3)]
    return {K.MODEL: "llama", K.LIST: tokens[:n],
            K.SCORES: np.asarray(scores[:n], np.float32),
            K.TOKEN_TYPE: np.asarray(types[:n], np.int32),
            K.BOS_ID: 1, K.EOS_ID: 2, K.UNK_ID: 0,
            K.ADD_BOS: True, K.ADD_EOS: False, K.ADD_SPACE_PREFIX: True}


def _tiny_model():
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def main():
    convert_hf_auto(_tiny_model(), "/tmp/example.gguf", vocab=_tiny_vocab())
    quantize_model("/tmp/example.gguf", "/tmp/example_q8.gguf", "Q8_0")

    ctx = Context(GGUFReader("/tmp/example_q8.gguf"), n_cells=256)
    prompt = [1, 42, 7, 99]
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    tok = int(np.argmax(ctx.get_logits()))
    out = [tok] + ctx.generate_loop(tok, 16, seq_id=0)
    print("prompt", prompt, "->", out)


if __name__ == "__main__":
    main()
