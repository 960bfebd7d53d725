"""Bert-family encoder -> pooled embeddings + rerank score."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import transformers

from llm_tpu.convert.hf_llama import convert_hf_auto
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.bert import BertContext


def main():
    cfg = transformers.RobertaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130, pad_token_id=1, num_labels=1)
    torch.manual_seed(0)
    m = transformers.RobertaForSequenceClassification(cfg).eval()
    convert_hf_auto(m, "/tmp/example_emb.gguf")

    ctx = BertContext(GGUFReader("/tmp/example_emb.gguf"))
    a = ctx.encode([5, 12, 30], pooling="mean")
    b = ctx.encode([5, 12, 31], pooling="mean")
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    print("embedding dim", a.shape[0], "cosine(a,b) = %.4f" % cos)
    print("rerank score:", float(ctx.rerank_score([5, 12, 30])))


if __name__ == "__main__":
    main()
