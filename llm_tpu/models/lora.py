"""LoRA adapters (runtime, unmerged).

Parity target: llama_adapter_lora (/root/reference/src/llama-adapter.h:61-63)
+ build_lora_mm (/root/reference/src/llama-graph.h:517): adapter GGUF files
carry `<base>.lora_a` / `<base>.lora_b` tensors and `adapter.lora.alpha`;
at matmul time y += scale * (alpha/rank) * (x @ A^T) @ B^T.

attach_lora() hangs (A, B, eff_scale) entries off the params pytree; the
decoder graph applies them in its projection helper. Fusion is disabled for
adapted layers (the fused QKV kernel can't see per-projection deltas).
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..quant.codecs import dequantize_tensor

_BLK_RE = re.compile(r"^blk\.(\d+)\.(.+?)\.weight$")


def load_lora_gguf(path: str) -> tuple[dict, float]:
    """Read an adapter GGUF: returns ({base_name: {"a": np, "b": np}}, alpha)."""
    r = GGUFReader(path)
    alpha = float(r.get("adapter.lora.alpha", 16.0))
    out: dict[str, dict] = {}
    for name, ti in r.tensors.items():
        if not name.endswith((".lora_a", ".lora_b")):
            continue
        base = name.rsplit(".lora_", 1)[0]
        part = name[-1]  # 'a' | 'b'
        arr = dequantize_tensor(r.data(name), ti.ggml_type, ti.shape)
        out.setdefault(base, {})[part] = np.asarray(arr, np.float32)
    return out, alpha


def attach_lora(params: dict, lora: dict, alpha: float, scale: float = 1.0,
                dtype=jnp.bfloat16) -> int:
    """Attach adapter deltas to params in place. Returns #tensors adapted."""
    n = 0
    for base, ab in lora.items():
        if "a" not in ab or "b" not in ab:
            continue
        a, b = ab["a"], ab["b"]  # a: [r, K] rows, b: [N, r] rows (GGUF layout)
        rank = a.shape[0]
        eff = scale * alpha / max(1, rank)
        entry = (jnp.asarray(a, dtype), jnp.asarray(b, dtype), float(eff))
        m = _BLK_RE.match(base)
        if m:
            il, key = int(m.group(1)), m.group(2)
            if il < len(params["layers"]):
                layer = params["layers"][il]
                layer[key + ".lora"] = entry
                # adapted projections can't ride the fused kernels
                if key in ("attn_q", "attn_k", "attn_v") and "attn_qkv_fused" in layer:
                    raise ValueError(
                        "load the model with fuse=False to attach QKV LoRA")
                if key in ("ffn_gate", "ffn_up") and "ffn_gateup_fused" in layer:
                    raise ValueError(
                        "load the model with fuse=False to attach FFN LoRA")
                n += 1
        elif base in ("output", "output.weight"):
            params["output.lora"] = entry
            n += 1
        elif base == "token_embd":
            continue  # embedding lora unsupported (rare)
    return n


# ---------------------------------------------------------------------------
# Control vectors (llama_adapter_cvec, /root/reference/src/llama-adapter.h:17
# + apply :93-133): per-layer additive steering directions, stored in GGUF
# as tensors "direction.N" (N = 1-based layer; layer 0 never present),
# added to the hidden state at the end of each layer within [start, end).
# ---------------------------------------------------------------------------

_DIR_RE = re.compile(r"^direction\.(\d+)$")


def load_control_vector_gguf(path: str) -> dict[int, np.ndarray]:
    """Read a control-vector GGUF: {1-based layer: direction vector}."""
    r = GGUFReader(path)
    out: dict[int, np.ndarray] = {}
    for name, ti in r.tensors.items():
        m = _DIR_RE.match(name)
        if not m:
            continue
        arr = dequantize_tensor(r.data(name), ti.ggml_type, ti.shape)
        out[int(m.group(1))] = np.asarray(arr, np.float32).reshape(-1)
    return out


def apply_control_vector(
    params: dict,
    directions: dict[int, np.ndarray],
    scale: float = 1.0,
    il_start: int = 1,
    il_end: int = -1,
    dtype=jnp.float32,
) -> int:
    """Attach scaled steering vectors to params (layer["cvec"]); vectors on
    layers outside [il_start, il_end] are skipped. Cumulative: calling again
    adds to existing vectors (the reference sums multiple cvec files).
    Returns #layers steered."""
    n_layers = len(params["layers"])
    if il_end < 0:
        il_end = n_layers
    n = 0
    for il_1b, vec in directions.items():
        il = il_1b - 1  # tensors are 1-based; layer 0 has no direction
        if not (0 <= il < n_layers) or not (il_start <= il_1b <= il_end):
            continue
        layer = params["layers"][il]
        add = jnp.asarray(vec * scale, dtype)
        prev = layer.get("cvec")
        layer["cvec"] = add if prev is None else prev + add
        n += 1
    return n


def clear_control_vector(params: dict) -> None:
    for layer in params["layers"]:
        layer.pop("cvec", None)
