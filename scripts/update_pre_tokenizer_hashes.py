#!/usr/bin/env python
"""Refresh llm_tpu/convert/pre_tokenizers.py PRE_REGISTRY entries.

The reference's convert_hf_to_gguf_update.py downloads each model's
tokenizer and regenerates the hash table; this environment has no network
egress, so this variant fingerprints *local* tokenizer checkouts instead:

    python scripts/update_pre_tokenizer_hashes.py NAME=PATH [NAME=PATH ...]

where NAME is the tokenizer.ggml.pre value (must exist in
llm_tpu.tokenizers.bpe.PRE_PATTERNS or be added there alongside) and PATH
is a directory transformers.AutoTokenizer can load.  Prints the registry
lines to merge into PRE_REGISTRY, and with --write rewrites the dict
in-place (append-only: existing entries are never altered, matching the
first-match-wins semantics of the reference's if-chain).
"""

import re
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv
    if not args:
        print(__doc__)
        return 1

    from transformers import AutoTokenizer

    from llm_tpu.convert import pre_tokenizers as pt
    from llm_tpu.tokenizers.bpe import PRE_PATTERNS

    new = {}
    for spec in args:
        name, _, path = spec.partition("=")
        if not path:
            print(f"error: expected NAME=PATH, got {spec!r}")
            return 1
        if name not in PRE_PATTERNS:
            print(f"warning: {name!r} has no split regexes in PRE_PATTERNS; "
                  "add them or the runtime will fall back to 'default'")
        tok = AutoTokenizer.from_pretrained(path)
        h = pt.chkhsh(tok)
        if h in pt.PRE_REGISTRY:
            print(f"# {name}: already registered as "
                  f"{pt.PRE_REGISTRY[h]!r} ({h})")
            continue
        new[h] = name
        print(f'    "{h}": "{name}",')

    if write and new:
        f = pt.__file__
        src = open(f).read()
        lines = "".join(f'    "{h}": "{n}",\n' for h, n in new.items())
        src, cnt = re.subn(r"(PRE_REGISTRY[^{]*\{\n)", r"\1" + lines, src, 1)
        if not cnt:
            print("error: PRE_REGISTRY block not found")
            return 1
        open(f, "w").write(src)
        print(f"wrote {len(new)} entries to {f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
