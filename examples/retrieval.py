"""Chunk a document, embed the chunks, rank them against a query
(the reference's examples/retrieval in miniature)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import transformers

from llm_tpu.convert.hf_llama import convert_hf_auto
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.bert import BertContext

DOC = """JAX traces python functions into XLA programs.
Pallas writes custom TPU kernels from python.
GGUF files hold quantized model weights.
A mesh shards arrays over many chips.
Cats are excellent at sleeping through meetings."""


def main():
    cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64)
    torch.manual_seed(0)
    m = transformers.BertModel(cfg).eval()
    convert_hf_auto(m, "/tmp/example_retr.gguf")
    ctx = BertContext(GGUFReader("/tmp/example_retr.gguf"))

    def embed(text):
        toks = [2] + [min(ord(c), 255) for c in text[:60]] + [3]
        v = ctx.encode(toks, pooling="mean")
        return v / np.linalg.norm(v)

    chunks = [c for c in DOC.splitlines() if c.strip()]
    mat = np.stack([embed(c) for c in chunks])
    query = "how do i shard arrays across devices?"
    scores = mat @ embed(query)
    print(f"query: {query}")
    for i in np.argsort(-scores):
        print(f"  {scores[i]:+.4f}  {chunks[i]}")


if __name__ == "__main__":
    main()
