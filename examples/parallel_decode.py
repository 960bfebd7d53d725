"""Continuous batching: several sequences decoded in lockstep through one
Context (the server's slot engine in miniature)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llm_tpu.convert.hf_llama import convert_hf_auto
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

from quickstart import _tiny_model


def main():
    convert_hf_auto(_tiny_model(), "/tmp/example.gguf")
    ctx = Context(GGUFReader("/tmp/example.gguf"), n_cells=512)

    prompts = {0: [1, 5, 9], 1: [2, 4, 8, 16], 2: [3, 3, 3]}
    b = Batch()
    idx = {}  # seq id -> batch index of its last prompt token
    for sid, p in prompts.items():
        for i, t in enumerate(p):
            if i == len(p) - 1:
                idx[sid] = len(b)
            b.add(t, i, (sid,), logits=(i == len(p) - 1))
    assert ctx.decode(b) == 0
    # get_logits(i) uses llama_get_logits_ith semantics: i is the index
    # of the token within the decoded batch
    last = {sid: int(np.argmax(ctx.get_logits(i))) for sid, i in idx.items()}

    outs = {sid: [t] for sid, t in last.items()}
    for step in range(12):
        b = Batch()
        for sid in prompts:
            b.add(last[sid], len(prompts[sid]) + step, (sid,), logits=True)
        assert ctx.decode(b) == 0
        for i, sid in enumerate(prompts):
            last[sid] = int(np.argmax(ctx.get_logits(i)))
            outs[sid].append(last[sid])
    for sid, o in outs.items():
        print(f"seq {sid}: {o}")


if __name__ == "__main__":
    main()
