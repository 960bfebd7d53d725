"""Model quantizer: GGUF -> GGUF at a target ftype preset.

Parity target: llama_model_quantize (/root/reference/src/llama-quant.cpp):
the per-tensor type recipe (llama_tensor_get_type :178 — e.g. Q4_K_M
upgrades attn_v and selected ffn_down layers to Q6_K via use_more_bits),
imatrix weighting, per-tensor overrides, and block-compatibility fallbacks.
Quantization itself runs via the vectorized numpy codecs (quant/codecs.py).
"""

from __future__ import annotations

import fnmatch
import re
import time

import numpy as np

from ..gguf.constants import GGMLType, Keys, type_traits
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..quant import codecs

# ftype name -> default per-weight type
FTYPES = {
    "Q4_0": GGMLType.Q4_0,
    "Q4_1": GGMLType.Q4_1,
    "Q5_0": GGMLType.Q5_0,
    "Q5_1": GGMLType.Q5_1,
    "Q8_0": GGMLType.Q8_0,
    "Q2_K": GGMLType.Q2_K,
    "Q3_K_S": GGMLType.Q3_K,
    "Q3_K_M": GGMLType.Q3_K,
    "Q3_K_L": GGMLType.Q3_K,
    "Q4_K_S": GGMLType.Q4_K,
    "Q4_K_M": GGMLType.Q4_K,
    "Q5_K_S": GGMLType.Q5_K,
    "Q5_K_M": GGMLType.Q5_K,
    "Q6_K": GGMLType.Q6_K,
    "IQ4_NL": GGMLType.IQ4_NL,
    "IQ4_XS": GGMLType.IQ4_XS,
    "IQ3_XXS": GGMLType.IQ3_XXS,
    "IQ3_S": GGMLType.IQ3_S,
    "IQ3_M": GGMLType.IQ3_S,
    "IQ2_XXS": GGMLType.IQ2_XXS,
    "IQ2_XS": GGMLType.IQ2_XS,
    "IQ2_S": GGMLType.IQ2_S,
    "IQ2_M": GGMLType.IQ2_S,
    "IQ1_S": GGMLType.IQ1_S,
    "IQ1_M": GGMLType.IQ1_M,
    "TQ1_0": GGMLType.TQ1_0,
    "TQ2_0": GGMLType.TQ2_0,
    "F16": GGMLType.F16,
    "BF16": GGMLType.BF16,
}

# sub-4-bit ftypes whose recipes follow the reference's IQ branch
_IQ_LOW = ("IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ2_M", "IQ1_S", "IQ1_M")


def _use_more_bits(i_layer: int, n_layers: int) -> bool:
    """llama-quant.cpp use_more_bits: first/last eighth + every 3rd layer."""
    return (
        i_layer < n_layers / 8
        or i_layer >= 7 * n_layers / 8
        or (i_layer - n_layers // 8) % 3 == 2
    )


_LAYER_RE = re.compile(r"blk\.(\d+)\.")


def tensor_type_for(
    name: str,
    shape: tuple[int, ...],
    ftype: str,
    n_layers: int,
    n_gqa: int = 1,
    n_expert: int = 0,
    has_output: bool = True,
) -> GGMLType:
    """Per-tensor quant type selection (llama_tensor_get_type recipe subset
    for the supported ftypes)."""
    base = FTYPES[ftype]
    new_type = base
    m = _LAYER_RE.match(name)
    i_layer = int(m.group(1)) if m else 0

    is_output = name == "output.weight" or (not has_output and name == "token_embd.weight")
    if is_output:
        if ftype in _IQ_LOW or ftype in ("IQ3_XXS",):
            new_type = GGMLType.Q5_K  # llama-quant.cpp IQ branch for output
        elif base != GGMLType.Q8_0 and type_traits(base).block_size >= 256:
            new_type = GGMLType.Q6_K
    elif name == "token_embd.weight" and ftype in _IQ_LOW:
        new_type = GGMLType.Q2_K
    elif "attn_v.weight" in name:
        if ftype in _IQ_LOW:
            new_type = GGMLType.Q4_K if n_gqa >= 4 else GGMLType.IQ3_S
        elif ftype in ("IQ3_XXS", "IQ3_S", "IQ3_M"):
            new_type = GGMLType.Q4_K if n_gqa >= 4 else GGMLType.IQ3_S
        elif ftype == "Q2_K":
            new_type = GGMLType.Q4_K if n_gqa >= 4 else GGMLType.Q3_K
        elif ftype == "Q3_K_M":
            new_type = GGMLType.Q5_K if i_layer < 2 else GGMLType.Q4_K
        elif ftype == "Q3_K_L":
            new_type = GGMLType.Q5_K
        elif ftype in ("IQ4_NL", "IQ4_XS") and n_gqa >= 4:
            new_type = GGMLType.Q5_K
        elif ftype in ("Q4_K_M", "Q5_K_M") and _use_more_bits(i_layer, n_layers):
            new_type = GGMLType.Q6_K
        elif ftype == "Q4_K_S" and i_layer < 4:
            new_type = GGMLType.Q5_K
        if n_expert == 8:
            new_type = GGMLType.Q8_0
    elif "ffn_down" in name:
        if ftype in _IQ_LOW:
            new_type = GGMLType.IQ3_XXS if i_layer < 2 else base
        elif ftype == "Q2_K":
            new_type = GGMLType.Q3_K if _use_more_bits(i_layer, n_layers) else base
        elif ftype == "Q3_K_M":
            new_type = GGMLType.Q4_K if i_layer < 2 else base
        elif ftype == "Q3_K_L":
            new_type = GGMLType.Q5_K
        elif ftype == "Q4_K_M":
            if _use_more_bits(i_layer, n_layers):
                new_type = GGMLType.Q6_K
        elif ftype == "Q5_K_M" and _use_more_bits(i_layer, n_layers):
            new_type = GGMLType.Q6_K
        elif ftype == "Q4_K_S" and i_layer < n_layers / 8:
            new_type = GGMLType.Q5_K
    elif "attn_qkv.weight" in name:
        if ftype in ("Q3_K_M", "Q3_K_L"):
            new_type = GGMLType.Q4_K
        elif ftype == "Q4_K_M":
            new_type = GGMLType.Q5_K
        elif ftype == "Q5_K_M":
            new_type = GGMLType.Q6_K
    elif name == "token_embd.weight":
        new_type = base

    # block-size compatibility fallback (llama-quant.cpp fallback chain)
    nx = shape[0]
    tt = type_traits(new_type)
    if nx % tt.block_size != 0:
        for fb in (GGMLType.Q8_0, GGMLType.F16):
            if nx % type_traits(fb).block_size == 0:
                return fb
    return new_type


# tensors that are never quantized (llama-quant.cpp exclusion rules)
_KEEP_F32 = (
    "*_norm.weight", "*ffn_gate_inp.weight", "rope_freqs.weight",
    "*.bias", "*attn_q_norm*", "*attn_k_norm*",
)


def should_quantize(name: str, shape: tuple[int, ...]) -> bool:
    if len(shape) < 2:
        return False
    for pat in _KEEP_F32:
        if fnmatch.fnmatch(name, pat):
            return False
    return name.endswith("weight")


def quantize_model(
    in_path: str,
    out_path: str,
    ftype: str,
    imatrix: dict[str, np.ndarray] | None = None,
    overrides: dict[str, GGMLType] | None = None,
    progress=None,
) -> dict:
    """Requantize a GGUF model. Returns summary stats."""
    if ftype not in FTYPES:
        raise ValueError(f"unknown ftype {ftype}; options: {sorted(FTYPES)}")
    r = GGUFReader(in_path)
    arch = r.architecture
    n_layers = int(r.akey(Keys.LLM.BLOCK_COUNT, 0) or 0)
    n_heads = int(r.akey(Keys.Attention.HEAD_COUNT, 1) or 1)
    n_kv = int(r.akey(Keys.Attention.HEAD_COUNT_KV, n_heads) or n_heads)
    n_expert = int(r.akey(Keys.LLM.EXPERT_COUNT, 0) or 0)
    n_gqa = n_heads // max(1, n_kv)
    has_output = "output.weight" in r.tensors

    w = GGUFWriter(out_path, alignment=r.alignment)
    for key, val in r.metadata.items():
        if key == Keys.General.FILE_TYPE:
            continue
        w.add_kv(key, val)
    w.add_kv(Keys.General.FILE_TYPE, np.uint32(list(FTYPES).index(ftype)))

    stats = {"in_bytes": 0, "out_bytes": 0, "tensors": 0, "t_start": time.time()}
    for name, ti in r.tensors.items():
        raw = r.data(name)
        stats["in_bytes"] += ti.nbytes
        stats["tensors"] += 1
        if not should_quantize(name, ti.shape):
            w.add_tensor(name, None, ggml_type=ti.ggml_type, raw=np.asarray(raw), shape=ti.shape)
            stats["out_bytes"] += ti.nbytes
            continue

        new_type = tensor_type_for(
            name, ti.shape, ftype, n_layers, n_gqa, n_expert, has_output
        )
        if overrides:
            for pat, t in overrides.items():
                if fnmatch.fnmatch(name, pat):
                    new_type = t
        if new_type == ti.ggml_type:
            w.add_tensor(name, None, ggml_type=ti.ggml_type, raw=np.asarray(raw), shape=ti.shape)
            stats["out_bytes"] += ti.nbytes
            continue

        data = codecs.dequantize(np.asarray(raw), ti.ggml_type, ti.shape[0])
        n_rows = data.shape[0]
        qw = None
        if imatrix and name in imatrix:
            qw = np.asarray(imatrix[name], np.float32).reshape(1, -1)
        if new_type in (GGMLType.F16, GGMLType.BF16, GGMLType.F32):
            out_raw = codecs.quantize(data, new_type)
        else:
            out_raw = codecs.quantize(data, new_type, qw=qw)
        w.add_tensor(name, None, ggml_type=new_type, raw=out_raw, shape=ti.shape)
        stats["out_bytes"] += out_raw.nbytes
        if progress:
            progress(name, ti.ggml_type, new_type)

    w.write()
    stats["t_total"] = time.time() - stats["t_start"]
    return stats


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Quantize a GGUF model")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("ftype", help=f"one of {sorted(FTYPES)}")
    ap.add_argument("--imatrix", help="imatrix .npz file", default=None)
    ap.add_argument(
        "--override", action="append", default=[],
        help="pattern=TYPE per-tensor override (e.g. '*attn_v*=Q8_0')",
    )
    args = ap.parse_args(argv)

    imatrix = None
    if args.imatrix:
        imatrix = dict(np.load(args.imatrix))
    overrides = {}
    for ov in args.override:
        pat, _, t = ov.partition("=")
        overrides[pat] = GGMLType[t]

    def progress(name, old, new):
        print(f"  {name}: {GGMLType(old).name} -> {GGMLType(new).name}")

    stats = quantize_model(args.input, args.output, args.ftype, imatrix, overrides, progress)
    print(
        f"quantized {stats['tensors']} tensors: "
        f"{stats['in_bytes']/1e9:.2f} GB -> {stats['out_bytes']/1e9:.2f} GB "
        f"in {stats['t_total']:.1f}s"
    )


if __name__ == "__main__":
    main()
