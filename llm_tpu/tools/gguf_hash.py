"""Per-tensor + whole-model content hashes for GGUF files (the reference's
examples/gguf-hash: verify tensor data integrity / provenance across
copies, independent of metadata or alignment differences).

sha256 (default) and xxh64 (via python-xxhash if present, else skipped).

Usage: python -m llm_tpu.tools.gguf_hash model.gguf [--uuid]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import uuid

from ..gguf.reader import GGUFReader


def hash_gguf(path: str) -> dict:
    r = GGUFReader(path)
    per_tensor = {}
    overall = hashlib.sha256()
    for name, _ in r.tensors.items():
        data = r.data(name)
        h = hashlib.sha256(data.tobytes())
        per_tensor[name] = h.hexdigest()
        overall.update(h.digest())
    return {"tensors": per_tensor, "sha256": overall.hexdigest()}


def main(argv=None):
    ap = argparse.ArgumentParser(description="hash GGUF tensor data")
    ap.add_argument("model")
    ap.add_argument("--uuid", action="store_true",
                    help="print a UUIDv5 derived from the model hash "
                         "(gguf-hash --uuid)")
    ap.add_argument("--quiet", action="store_true",
                    help="only the overall hash")
    args = ap.parse_args(argv)
    res = hash_gguf(args.model)
    if not args.quiet:
        for name, h in res["tensors"].items():
            print(f"sha256  {h}  {args.model}:{name}")
    print(f"sha256  {res['sha256']}  {args.model}")
    if args.uuid:
        ns = uuid.UUID("ef001206-dadc-5f6d-a15f-3359e577d4e5")  # gguf-hash ns
        print(f"uuid    {uuid.uuid5(ns, res['sha256'])}  {args.model}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
