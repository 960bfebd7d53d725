"""Shard / merge GGUF files (parity: tools/gguf-split).

Split writes `<base>-0000i-of-0000N.gguf` shards: the first carries all
metadata + split bookkeeping KVs; every shard holds a subset of tensors.
Merge reverses it. The reader already opens split sets transparently.
"""

from __future__ import annotations

import os

import numpy as np

from ..gguf.constants import Keys
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter

KEY_SPLIT_NO = "split.no"
KEY_SPLIT_COUNT = "split.count"
KEY_SPLIT_TENSORS_COUNT = "split.tensors.count"


def split_gguf(in_path: str, out_base: str, max_tensors: int = 128,
               max_size_bytes: int | None = None) -> list[str]:
    r = GGUFReader(in_path)
    names = list(r.tensors)

    # partition tensor list into shards
    shards: list[list[str]] = [[]]
    size = 0
    for name in names:
        ti = r.tensors[name]
        full = len(shards[-1]) >= max_tensors or (
            max_size_bytes and size + ti.nbytes > max_size_bytes and shards[-1]
        )
        if full:
            shards.append([])
            size = 0
        shards[-1].append(name)
        size += ti.nbytes

    n = len(shards)
    paths = []
    for i, shard in enumerate(shards):
        path = f"{out_base}-{i + 1:05d}-of-{n:05d}.gguf"
        paths.append(path)
        w = GGUFWriter(path, alignment=r.alignment)
        if i == 0:
            for k, v in r.metadata.items():
                w.add_kv(k, v)
        else:
            w.add_kv(Keys.General.ARCHITECTURE, r.architecture)
        w.add_kv(KEY_SPLIT_NO, np.uint16(i))
        w.add_kv(KEY_SPLIT_COUNT, np.uint16(n))
        w.add_kv(KEY_SPLIT_TENSORS_COUNT, np.int32(len(r.tensors)))
        for name in shard:
            ti = r.tensors[name]
            w.add_tensor(name, None, ggml_type=ti.ggml_type,
                         raw=np.asarray(r.data(name)), shape=ti.shape)
        w.write()
    return paths


def merge_gguf(first_split: str, out_path: str) -> str:
    r = GGUFReader(first_split)  # opens all splits
    w = GGUFWriter(out_path, alignment=r.alignment)
    for k, v in r.metadata.items():
        if k.startswith("split."):
            continue
        w.add_kv(k, v)
    for name, ti in r.tensors.items():
        w.add_tensor(name, None, ggml_type=ti.ggml_type,
                     raw=np.asarray(r.data(name)), shape=ti.shape)
    w.write()
    return out_path


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="split/merge GGUF files")
    ap.add_argument("--split", action="store_true")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--split-max-tensors", type=int, default=128)
    ap.add_argument("--split-max-size", default=None, help="e.g. 2G")
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args(argv)

    if args.merge:
        out = merge_gguf(args.input, args.output)
        print(f"merged -> {out}")
        return
    max_size = None
    if args.split_max_size:
        s = args.split_max_size.upper()
        mult = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30}.get(s[-1], 1)
        max_size = int(float(s.rstrip("KMG"))) * mult
    paths = split_gguf(args.input, args.output, args.split_max_tensors, max_size)
    print("\n".join(paths))


if __name__ == "__main__":
    main()
