"""Merge LoRA adapters into base weights (llama-export-lora parity,
/root/reference/tools/export-lora/export-lora.cpp): W' = W + scale *
(alpha/rank) * B @ A per adapted tensor, requantized to the tensor's
original type; unchanged tensors pass through byte-identical."""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, type_traits
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..models.lora import load_lora_gguf
from ..quant import codecs


def export_lora(base_path: str, adapters: list[tuple[str, float]],
                out_path: str, progress=None) -> dict:
    r = GGUFReader(base_path)

    deltas: dict[str, np.ndarray] = {}
    for path, scale in adapters:
        tensors, alpha = load_lora_gguf(path)
        for name, ab in tensors.items():
            if "a" not in ab or "b" not in ab:
                continue
            a, b = ab["a"], ab["b"]  # a [r, K], b [N, r]
            eff = scale * alpha / max(1, a.shape[0])
            d = eff * (b.astype(np.float64) @ a.astype(np.float64))
            key = name if name.endswith(".weight") else name + ".weight"
            deltas[key] = deltas.get(key, 0.0) + d

    w = GGUFWriter(out_path, arch=r.architecture)
    for key, val in r.metadata.items():
        if key == "general.architecture":
            continue
        w.add_kv(key, val)

    n_merged = 0
    names = list(r.tensors)
    for i, name in enumerate(names):
        ti = r.tensors[name]
        raw = r.data(name)
        if name in deltas:
            t = GGMLType(ti.ggml_type)
            dense = codecs.dequantize_tensor(raw, t, ti.shape)  # [N, K]
            merged = dense.astype(np.float64) + deltas[name]
            n_per_row = int(ti.shape[0])
            if type_traits(t).block_size > 1 and n_per_row % type_traits(t).block_size:
                t = GGMLType.F16
            w.add_tensor(name, merged.astype(np.float32), ggml_type=t)
            n_merged += 1
        else:
            w.add_tensor(name, None, ggml_type=ti.ggml_type, raw=raw,
                         shape=ti.shape)
        if progress:
            progress(i + 1, len(names))
    w.write()
    return {"n_tensors": len(names), "n_merged": n_merged}


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="merge LoRA adapters into a GGUF")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--lora", action="append", default=[],
                    help="adapter GGUF (repeatable); optional :scale suffix")
    args = ap.parse_args(argv)

    adapters = []
    for spec in args.lora:
        path, _, sc = spec.partition(":")
        adapters.append((path, float(sc) if sc else 1.0))
    stats = export_lora(args.model, adapters, args.output)
    print(f"merged {stats['n_merged']} tensors -> {args.output}")


if __name__ == "__main__":
    main()
