"""Dump GGUF metadata + tensor table (the reference's examples/gguf reader
walk + gguf-py gguf_dump). Plain text or --json.

Usage: python -m llm_tpu.tools.gguf_dump model.gguf [--json] [--no-tensors]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader


def _fmt_val(v, limit=60):
    if isinstance(v, (list, tuple, np.ndarray)):
        s = ", ".join(str(x) for x in list(v)[:8])
        more = f", ... ({len(v)} items)" if len(v) > 8 else ""
        return f"[{s}{more}]"
    s = str(v)
    return s if len(s) <= limit else s[:limit] + "..."


def dump(path: str, as_json: bool = False, tensors: bool = True) -> int:
    r = GGUFReader(path)
    if as_json:
        out = {
            "kv": {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                   for k, v in r.metadata.items()},
            "tensors": [
                {"name": n, "shape": list(map(int, ti.shape)),
                 "type": GGMLType(ti.ggml_type).name,
                 "offset": int(ti.offset)}
                for n, ti in r.tensors.items()
            ] if tensors else [],
        }
        json.dump(out, sys.stdout, indent=1, default=str)
        print()
        return 0
    print(f"{path}: {len(r.metadata)} kv pairs, {len(r.tensors)} tensors")
    for k, v in r.metadata.items():
        print(f"  {k} = {_fmt_val(v)}")
    if tensors:
        print()
        total = 0
        for n, ti in r.tensors.items():
            nb = r.data(n).nbytes
            total += nb
            shape = "x".join(str(int(s)) for s in ti.shape)
            print(f"  {GGMLType(ti.ggml_type).name:>8} {shape:>20}  {n}")
        print(f"\ntensor data: {total/1e6:.1f} MB")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description="dump GGUF metadata")
    ap.add_argument("model")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--no-tensors", action="store_true")
    args = ap.parse_args(argv)
    return dump(args.model, args.json, not args.no_tensors)


if __name__ == "__main__":
    sys.exit(main())
