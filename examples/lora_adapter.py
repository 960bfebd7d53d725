"""Runtime LoRA: attach an adapter GGUF to a converted base model."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llm_tpu.convert.hf_llama import convert_hf_auto
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.gguf.writer import GGUFWriter
from llm_tpu.models.lora import attach_lora, load_lora_gguf
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

from quickstart import _tiny_model


def _toy_adapter(path, n_layers=2, E=128, r=4):
    rng = np.random.default_rng(0)
    w = GGUFWriter(path, arch="llama")
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", 8.0)
    for il in range(n_layers):
        for nm in ("attn_q", "attn_output"):
            w.add_tensor(f"blk.{il}.{nm}.weight.lora_a",
                         (rng.normal(size=(r, E)) * 0.05).astype(np.float32))
            w.add_tensor(f"blk.{il}.{nm}.weight.lora_b",
                         (rng.normal(size=(E, r)) * 0.05).astype(np.float32))
    w.write()


def main():
    convert_hf_auto(_tiny_model(), "/tmp/example.gguf")
    _toy_adapter("/tmp/example_lora.gguf")

    base = Context(GGUFReader("/tmp/example.gguf"), n_cells=64)
    assert base.decode(Batch.text([1, 5, 9], seq_id=0)) == 0
    without = np.asarray(base.get_logits())

    ctx = Context(GGUFReader("/tmp/example.gguf"), n_cells=64)
    tensors, alpha = load_lora_gguf("/tmp/example_lora.gguf")
    n = attach_lora(ctx.params, tensors, alpha, scale=1.0)
    print("adapted tensors:", n)
    assert ctx.decode(Batch.text([1, 5, 9], seq_id=0)) == 0
    with_ = np.asarray(ctx.get_logits())
    print("max |delta logit| from adapter:",
          float(np.max(np.abs(with_ - without))))


if __name__ == "__main__":
    main()
