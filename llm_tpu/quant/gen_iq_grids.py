"""One-time extraction of the IQ-format codebook grids into iq_grids.npz.

The importance-grid ("IQ") quant formats are defined by fixed codebook
tables (reference: ggml/src/ggml-common.h:518-1081, iq1s grid :1085). The
tables are file-format *data constants* — every decoder of these formats
must embed the identical bits. This script parses them out of the reference
header and stores them as a compact .npz committed to the repo, so the
framework stays standalone.

Run from a checkout that has the reference mounted:
    python -m llm_tpu.quant.gen_iq_grids /root/reference/ggml/src/ggml-common.h
"""

from __future__ import annotations

import re
import sys

import numpy as np

TABLES = {
    # name -> (dtype, expected length)
    "kmask_iq2xs": (np.uint8, 8),
    "ksigns_iq2xs": (np.uint8, 128),
    "iq2xxs_grid": (np.uint64, 256),
    "iq2xs_grid": (np.uint64, 512),
    "iq2s_grid": (np.uint64, 1024),
    "iq3xxs_grid": (np.uint32, 256),
    "iq3s_grid": (np.uint32, 512),
    "iq1s_grid": (np.uint64, 2048),
}


def parse_tables(header_path: str) -> dict[str, np.ndarray]:
    text = open(header_path, "r", errors="replace").read()
    out: dict[str, np.ndarray] = {}
    for name, (dtype, length) in TABLES.items():
        m = re.search(
            r"GGML_TABLE_BEGIN\(\s*\w+\s*,\s*%s\s*,\s*\w+\s*\)(.*?)GGML_TABLE_END" % re.escape(name),
            text,
            re.S,
        )
        if not m:
            raise SystemExit(f"table {name} not found in {header_path}")
        vals = [int(v, 0) for v in re.findall(r"0x[0-9a-fA-F]+|\b\d+\b", m.group(1))]
        arr = np.array(vals, dtype=np.uint64).astype(dtype)
        if arr.size != length:
            raise SystemExit(f"table {name}: expected {length} entries, got {arr.size}")
        out[name] = arr
    return out


def main() -> None:
    header = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ggml/src/ggml-common.h"
    tables = parse_tables(header)
    import os

    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)), "iq_grids.npz")
    np.savez_compressed(dest, **tables)
    print(f"wrote {dest}: " + ", ".join(f"{k}[{v.size}]" for k, v in tables.items()))


if __name__ == "__main__":
    main()
