"""Write a (possibly trained) model back to GGUF.

Parity target: llama_model_save_to_file (/root/reference/include/llama.h:459,
impl src/llama-model-saver.cpp): re-emit the source model's metadata
(architecture, hparams, tokenizer) with the current tensor values — used by
the training loop to checkpoint full-weight finetunes.
"""

from __future__ import annotations

import numpy as np

from ..gguf.writer import GGUFWriter

# GGUF tensor base name -> params["layers"][il] key (inverse of the loader's
# per-layer mapping for the dense decoder families)
_LAYER_KEYS = {
    "attn_norm": "attn_norm",
    "attn_norm_2": "attn_norm_2",
    "attn_q": "attn_q",
    "attn_k": "attn_k",
    "attn_v": "attn_v",
    "attn_qkv": "attn_qkv_fused",
    "attn_output": "attn_output",
    "attn_q_norm": "attn_q_norm",
    "attn_k_norm": "attn_k_norm",
    "ffn_norm": "ffn_norm",
    "ffn_gate": "ffn_gate",
    "ffn_up": "ffn_up",
    "ffn_down": "ffn_down",
    "ffn_gate_inp": "ffn_gate_inp",
    "ffn_gate_exps": "ffn_gate_exps",
    "ffn_up_exps": "ffn_up_exps",
    "ffn_down_exps": "ffn_down_exps",
    "attn_post_norm": "attn_post_norm",
    "ffn_post_norm": "ffn_post_norm",
}

_TOP_KEYS = {
    "token_embd.weight": "tok_embd",
    "output.weight": "output",
    "output_norm.weight": "output_norm",
    "output_norm.bias": "output_norm_b",
    "output.bias": "output_b",
    "token_embd_norm.weight": "tok_norm",
    "token_embd_norm.bias": "tok_norm_b",
    "position_embd.weight": "pos_embd",
    "rope_freqs.weight": "rope_freqs",
}


def _param_for(params: dict, name: str):
    if name in _TOP_KEYS:
        return params.get(_TOP_KEYS[name])
    if name.startswith("blk."):
        parts = name.split(".")
        il = int(parts[1])
        base = ".".join(parts[2:-1])
        kind = parts[-1]
        if il >= len(params["layers"]):
            return None
        key = _LAYER_KEYS.get(base)
        if key is None:
            return None
        if kind == "bias":
            key = key + "_b"
        return params["layers"][il].get(key)
    return None


def save_model_gguf(reader, params: dict, path: str) -> int:
    """Re-emit reader's metadata with tensor data taken from `params`
    (dense arrays; f32 storage). Tensors without a mapped param keep their
    original bytes. Returns the number of tensors replaced."""
    w = GGUFWriter(path)
    for key, val in reader.metadata.items():
        w.add_kv(key, val)
    replaced = 0
    for name, ti in reader.tensors.items():
        p = _param_for(params, name)
        if p is None or not hasattr(p, "shape"):
            from ..quant.codecs import dequantize_tensor

            arr = np.asarray(
                dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape),
                np.float32)
            # restore numpy (row-major) orientation from ne ordering
            arr = arr.reshape(tuple(reversed(ti.shape)))
            w.add_tensor(name, arr)
            continue
        arr = np.asarray(p, np.float32)
        want = tuple(reversed(ti.shape))
        if arr.shape != want:
            arr = arr.reshape(want)
        w.add_tensor(name, arr)
        replaced += 1
    w.write()
    return replaced
