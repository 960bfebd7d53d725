"""HF PEFT LoRA adapter directory -> adapter GGUF.

Parity target: /root/reference/convert_lora_to_gguf.py (reads
adapter_config.json + adapter_model.safetensors/.bin, strips the PEFT
"base_model.model." prefix, maps module paths through the base model's
tensor map, and writes `<base>.lora_a` / `<base>.lora_b` pairs with
`adapter.lora.alpha`). The output loads both in llm_tpu
(models/lora.py attach_lora) and in the reference's llama_adapter_lora.

Independent design: instead of instantiating a converter class hierarchy
around the base model, the module maps PEFT module paths directly through
the same per-arch layer-name dicts the HF converters use (hf_llama.py),
so any architecture those converters cover gets LoRA import for free.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from .hf_llama import (_HF_LAYER_MAP, _HF_PHI3_MAP, PERMUTED_QK_ARCHS,
                       permute_qk)

# non-layer module paths (PEFT targets outside the decoder stack)
_TOP_LEVEL = {
    "model.embed_tokens": "token_embd",
    "embed_tokens": "token_embd",
    "lm_head": "output",
}


def _map_module(path: str, layer_maps) -> str | None:
    """PEFT module path (e.g. model.layers.3.self_attn.q_proj) ->
    GGUF base tensor name (blk.3.attn_q.weight)."""
    if path in _TOP_LEVEL:
        return _TOP_LEVEL[path] + ".weight"
    parts = path.split(".")
    if "layers" in parts:
        i = parts.index("layers")
        try:
            il = int(parts[i + 1])
        except (IndexError, ValueError):
            return None
        sub = ".".join(parts[i + 2:]) + ".weight"
        for lm in layer_maps:
            if sub in lm:
                return f"blk.{il}." + lm[sub]
    return None


def load_peft_dir(lora_dir: str) -> tuple[dict, dict]:
    """Read adapter_config.json + weights. Returns (config, state_dict)."""
    cfg_path = os.path.join(lora_dir, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    st_path = os.path.join(lora_dir, "adapter_model.safetensors")
    if os.path.exists(st_path):
        from safetensors import safe_open

        tensors = {}
        with safe_open(st_path, framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    else:
        import torch

        bin_path = os.path.join(lora_dir, "adapter_model.bin")
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        tensors = {k: v.to(torch.float32).numpy() for k, v in sd.items()}
    return cfg, tensors


def convert_peft_lora(lora_dir: str, out_path: str, arch: str = "llama",
                      out_type: GGMLType = GGMLType.F16,
                      base_config: str | dict | None = None,
                      n_head: int = 0, n_kv_head: int = 0) -> int:
    """Convert a PEFT LoRA checkpoint directory to an adapter GGUF.
    Returns the number of lora_a/lora_b tensor pairs written.

    NORM-rope archs (llama family) store q/k PERMUTED in the base GGUF
    (hf_llama.permute_qk), so their deltas' lora_b rows must ride the same
    permute — head counts come from `base_config` (a config.json path or
    dict) or explicit n_head/n_kv_head."""
    cfg, tensors = load_peft_dir(lora_dir)
    alpha = float(cfg.get("lora_alpha", cfg.get("alpha", 16.0)))
    layer_maps = (_HF_LAYER_MAP, _HF_PHI3_MAP)
    if isinstance(base_config, str):
        with open(base_config) as f:
            base_config = json.load(f)
    if base_config:
        n_head = n_head or int(base_config.get("num_attention_heads", 0))
        n_kv_head = n_kv_head or int(
            base_config.get("num_key_value_heads", n_head))
    n_kv_head = n_kv_head or n_head

    pairs: dict[str, dict] = {}
    norms: dict[str, np.ndarray] = {}
    for name, arr in tensors.items():
        path = name
        if path.startswith("base_model.model."):
            path = path[len("base_model.model."):]
        if path.endswith(".lora_A.weight") or path.endswith(".lora_embedding_A"):
            mod, part = path.rsplit(".lora_", 1)[0], "a"
        elif path.endswith(".lora_B.weight") or path.endswith(".lora_embedding_B"):
            mod, part = path.rsplit(".lora_", 1)[0], "b"
        elif ".base_layer.weight" in path:
            continue
        elif "_layernorm" in path or ".norm" in path:
            # mergekit-extract-lora ships updated norms in the adapter;
            # they are carried verbatim (reference modify_tensors norm pass)
            base = _map_module(path.rsplit(".weight", 1)[0], layer_maps)
            if base:
                norms[base] = np.asarray(arr, np.float32)
            continue
        else:
            raise ValueError(f"unexpected adapter tensor '{name}': "
                             "not a lora_A/lora_B pair")
        base = _map_module(mod, layer_maps)
        if base is None:
            raise ValueError(f"cannot map PEFT module '{mod}' to a GGUF "
                             "tensor name")
        a = np.asarray(arr, np.float32)
        if base == "token_embd.weight" and part == "a":
            # embeddings consume x one-hot row-side: A is stored transposed
            # (reference convert_lora_to_gguf token_embd special case)
            a = a.T
        if (part == "b" and arch in PERMUTED_QK_ARCHS
                and (base.endswith(".attn_q.weight")
                     or base.endswith(".attn_k.weight"))):
            nh = n_head if base.endswith(".attn_q.weight") else n_kv_head
            if nh <= 0:
                raise ValueError(
                    f"arch '{arch}' stores q/k permuted; pass base_config "
                    "or n_head/n_kv_head to permute the adapter delta")
            a = permute_qk(a, nh)
        pairs.setdefault(base, {})[part] = a

    w = GGUFWriter(out_path, arch=arch)
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", alpha)
    n = 0
    out_np = np.float16 if out_type == GGMLType.F16 else np.float32
    for base, ab in sorted(pairs.items()):
        if "a" not in ab or "b" not in ab:
            raise ValueError(f"adapter tensor '{base}' is missing its "
                             f"lora_{'b' if 'a' in ab else 'a'} half")
        w.add_tensor(base + ".lora_a", ab["a"].astype(out_np))
        w.add_tensor(base + ".lora_b", ab["b"].astype(out_np))
        n += 1
    for base, arr in sorted(norms.items()):
        w.add_tensor(base, arr.astype(np.float32))
    w.write()
    return n
