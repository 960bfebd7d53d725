"""Convert a HF PEFT LoRA adapter directory to an adapter GGUF.

Parity target: /root/reference/convert_lora_to_gguf.py (CLI surface:
lora_path, --outfile, --outtype). The output attaches at runtime via
--lora on the CLI/server (models/lora.py) and also loads in the
reference's llama_adapter_lora.

Usage:
  python -m llm_tpu.tools.convert_lora /path/to/peft_dir \
      --outfile adapter.gguf [--outtype f16|f32] [--arch llama]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a Hugging Face PEFT LoRA adapter to GGUF")
    ap.add_argument("lora_path",
                    help="directory with adapter_config.json + "
                         "adapter_model.safetensors/.bin")
    ap.add_argument("--outfile", help="output path "
                    "(default: <lora_path>/adapter.gguf)")
    ap.add_argument("--outtype", choices=("f32", "f16"), default="f16")
    ap.add_argument("--arch", default="llama",
                    help="base model architecture tag written to the GGUF")
    ap.add_argument("--base", help="base model config.json (or its dir) — "
                    "needed for head counts on q/k-permuted archs")
    ap.add_argument("--n-head", type=int, default=0)
    ap.add_argument("--n-kv-head", type=int, default=0)
    args = ap.parse_args(argv)

    from ..convert.peft_lora import convert_peft_lora
    from ..gguf.constants import GGMLType

    base = args.base
    if base and os.path.isdir(base):
        base = os.path.join(base, "config.json")
    out = args.outfile or os.path.join(args.lora_path, "adapter.gguf")
    n = convert_peft_lora(
        args.lora_path, out, arch=args.arch,
        out_type=GGMLType.F32 if args.outtype == "f32" else GGMLType.F16,
        base_config=base, n_head=args.n_head, n_kv_head=args.n_kv_head)
    print(f"wrote {out} ({n} LoRA tensor pairs)", file=sys.stderr)


if __name__ == "__main__":
    main()
