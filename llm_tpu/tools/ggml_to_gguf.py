"""Convert legacy GGML-family llama checkpoints (GGML/GGMF/GGJT) to GGUF.

Parity target: /root/reference/convert_llama_ggml_to_gguf.py — same format
detection (magics 'lmgg'/'fmgg'/'tjgg'), same version gates (quantized
tensors require GGJTv3; older formats/versions convert F32/F16 only, since
the Q4/Q8 bit layouts changed in GGJTv2/v3), same legacy->GGUF tensor name
mapping, vocab re-emission (scores, byte tokens, sentencepiece space), and
raw-byte tensor passthrough (no requantization).

Usage:
  python -m llm_tpu.tools.ggml_to_gguf -i model.bin -o model.gguf \
      [--gqa 1] [--eps 1e-5] [--context-length 2048]
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np

from ..gguf.constants import GGMLType, Keys, type_traits
from ..gguf.writer import GGUFWriter

# legacy ftype ids (llama_ftype in old llama.cpp; reference GGMLFType)
_FTYPE_NAMES = {
    0: "ALL_F32", 1: "MOSTLY_F16", 2: "MOSTLY_Q4_0", 3: "MOSTLY_Q4_1",
    4: "MOSTLY_Q4_1_SOME_F16", 7: "MOSTLY_Q8_0", 8: "MOSTLY_Q5_0",
    9: "MOSTLY_Q5_1", 10: "MOSTLY_Q2_K", 11: "MOSTLY_Q3_K_S",
    12: "MOSTLY_Q3_K_M", 13: "MOSTLY_Q3_K_L", 14: "MOSTLY_Q4_K_S",
    15: "MOSTLY_Q4_K_M", 16: "MOSTLY_Q5_K_S", 17: "MOSTLY_Q5_K_M",
    18: "MOSTLY_Q6_K",
}

# legacy llama tensor names -> GGUF names (the LLAMA rows of the
# reference's gguf-py tensor_mapping, applied to .weight/.bias suffixes)
_GLOBAL_MAP = {
    "tok_embeddings": "token_embd",
    "norm": "output_norm",
    "output": "output",
    "rope.freqs": "rope_freqs",
}
_LAYER_MAP = {
    "attention.wq": "attn_q",
    "attention.wk": "attn_k",
    "attention.wv": "attn_v",
    "attention.wo": "attn_output",
    "attention_norm": "attn_norm",
    "feed_forward.w1": "ffn_gate",
    "feed_forward.w2": "ffn_down",
    "feed_forward.w3": "ffn_up",
    "ffn_norm": "ffn_norm",
    "attention.inner_attention.rope.freqs": "rope_freqs",
    "attention.rope.freqs": "rope_freqs",
}


def map_name(name: str) -> str:
    base, dot, suffix = name.rpartition(".")
    if suffix not in ("weight", "bias"):
        base, suffix = name, ""
    if base.startswith("layers."):
        _, il, rest = base.split(".", 2)
        mapped = _LAYER_MAP.get(rest)
        if mapped is None:
            raise ValueError(f"unmapped legacy tensor {name!r}")
        out = f"blk.{il}.{mapped}"
    else:
        mapped = _GLOBAL_MAP.get(base)
        if mapped is None:
            raise ValueError(f"unmapped legacy tensor {name!r}")
        out = mapped
    return out + (("." + suffix) if suffix else ".weight")


class LegacyModel:
    """Parsed GGML/GGMF/GGJT file (header + vocab + tensor directory)."""

    def __init__(self, data: np.ndarray):
        self.data = data
        off = 0
        magic = bytes(data[:4])
        if magic == b"GGUF":
            raise ValueError("already a GGUF file")
        if magic == b"lmgg":
            self.fmt, self.version, off = "GGML", 1, 4
        elif magic == b"fmgg":
            self.fmt = "GGMF"
            self.version = struct.unpack("<I", data[4:8].tobytes())[0]
            if self.version != 1:
                raise ValueError(f"unexpected GGMF version {self.version}")
            off = 8
        elif magic == b"tjgg":
            self.fmt = "GGJT"
            self.version = struct.unpack("<I", data[4:8].tobytes())[0]
            if not 1 <= self.version <= 3:
                raise ValueError(f"unexpected GGJT version {self.version}")
            off = 8
        else:
            raise ValueError(f"unexpected magic {magic!r}")

        (self.n_vocab, self.n_embd, self.n_mult, self.n_head, self.n_layer,
         self.n_rot, self.ftype) = struct.unpack(
            "<7I", data[off:off + 28].tobytes())
        off += 28
        # quantization-format gates (reference validate_conversion)
        if self.fmt != "GGJT" or self.version < 2:
            if self.ftype not in (0, 1):
                raise ValueError(
                    "quantizations changed in GGJTv2: can only convert "
                    "unquantized (F32/F16) files this old")
        elif self.version == 2 and self.ftype in (2, 3, 4, 7):
            raise ValueError("Q4/Q8 layouts changed in GGJTv3: cannot "
                             "convert GGJTv2 Q4/Q8 files")

        # vocab: u32 len + bytes (+ f32 score for GGMF/GGJT)
        self.vocab: list[tuple[bytes, float]] = []
        has_scores = self.fmt != "GGML"
        for _ in range(self.n_vocab):
            ln = struct.unpack("<I", data[off:off + 4].tobytes())[0]
            assert ln < 4096, "absurd vocab item length"
            off += 4
            text = bytes(data[off:off + ln])
            off += ln
            score = 0.0
            if has_scores:
                score = struct.unpack("<f", data[off:off + 4].tobytes())[0]
                off += 4
            self.vocab.append((text, score))

        # tensor directory: (n_dims, name_len, dtype) + dims + name
        # (+ 32B alignment padding for GGJT)
        self.tensors: list[tuple[str, tuple[int, ...], GGMLType, int, int]] = []
        pad32 = self.fmt == "GGJT"
        n = len(data)
        while off < n:
            n_dims, name_len, dtype = struct.unpack(
                "<3I", data[off:off + 12].tobytes())
            assert 0 <= n_dims <= 4 and name_len < 4096
            off += 12
            dims = struct.unpack(f"<{n_dims}I",
                                 data[off:off + 4 * n_dims].tobytes())
            off += 4 * n_dims
            name = bytes(data[off:off + name_len]).decode("utf-8")
            off += name_len
            if pad32:
                off = (off + 31) & ~31
            t = GGMLType(dtype)
            tt = type_traits(t)
            bs, tb = tt.block_size, tt.type_size
            n_elems = int(np.prod(dims)) if dims else 1
            nbytes = n_elems * tb // bs
            self.tensors.append((name, dims, t, off, nbytes))
            off += nbytes

    def n_ff(self) -> int:
        for name, dims, *_ in self.tensors:
            if name == "layers.0.feed_forward.w1.weight":
                return dims[1]
        raise ValueError("missing layer 0 FF tensor")


def convert(inp: str, out: str, gqa: int = 1, eps: float = 5e-6,
            context_length: int = 2048, name: str | None = None) -> dict:
    data = np.memmap(inp, mode="r", dtype=np.uint8)
    m = LegacyModel(data)
    n_ff = m.n_ff()
    # GQA: the legacy header has no n_kv_head; recover it like the
    # reference does, from the user-supplied q/kv ratio
    if gqa == 1:
        n_kv_head = m.n_head
    else:
        n_kv_head = next((x for x in range(1, 256)
                          if m.n_head / x == float(gqa)), None)
        if n_kv_head is None:
            raise ValueError(f"cannot determine n_kv_head from gqa={gqa}")

    K = Keys.Tokenizer
    a = "llama"
    w = GGUFWriter(out, arch=a)
    w.add_kv("general.name", name or inp.rsplit("/", 1)[-1])
    w.add_kv("general.description",
             f"converted from legacy {m.fmt}v{m.version} "
             f"{_FTYPE_NAMES.get(m.ftype, m.ftype)} format")
    w.add_kv("general.file_type", m.ftype)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), context_length)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), m.n_embd)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), m.n_layer)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), n_ff)
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a),
             m.n_embd // m.n_head)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), m.n_head)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), n_kv_head)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), float(eps))

    # vocab: legacy sentencepiece items; ids 0-2 are unk/bos/eos, single
    # bytes in 3..258 become <0xXX> byte tokens, spaces become U+2581
    tokens, scores, types = [], [], []
    for tokid, (text, score) in enumerate(m.vocab):
        tt = 1  # NORMAL
        if tokid == 0:
            text, tt = b"<unk>", 2
        elif tokid == 1:
            text, tt = b"<s>", 3
        elif tokid == 2:
            text, tt = b"</s>", 3
        elif len(text) == 0:
            tt = 3  # CONTROL
        elif 3 <= tokid <= 258 and len(text) == 1:
            text, tt = f"<0x{text[0]:02X}>".encode(), 6  # BYTE
        else:
            text = text.replace(b" ", b"\xe2\x96\x81")
        tokens.append(text.decode("utf-8", errors="replace"))
        scores.append(float(score))
        types.append(tt)
    w.add_kv(K.MODEL, "llama")
    w.add_kv(K.PRE, "default")
    w.add_kv(K.LIST, tokens)
    w.add_kv(K.SCORES, np.asarray(scores, np.float32))
    w.add_kv(K.TOKEN_TYPE, np.asarray(types, np.int32))
    w.add_kv(K.UNK_ID, 0)
    w.add_kv(K.BOS_ID, 1)
    w.add_kv(K.EOS_ID, 2)

    for lname, dims, t, off, nbytes in m.tensors:
        # legacy dims are already ne order (fastest first) — exactly what
        # our writer's `shape` takes; tensor bytes pass through unchanged
        w.add_tensor(map_name(lname), None, ggml_type=t,
                     raw=np.asarray(data[off:off + nbytes]),
                     shape=tuple(int(d) for d in dims))
    w.write()
    return {"format": f"{m.fmt}v{m.version}", "n_tensors": len(m.tensors),
            "n_vocab": m.n_vocab, "out": out}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--gqa", type=int, default=1,
                    help="grouped-query ratio (for 70B models: 8)")
    ap.add_argument("--eps", type=float, default=5e-6,
                    help="RMS norm eps (1e-5 for most models)")
    ap.add_argument("--context-length", type=int, default=2048)
    ap.add_argument("--name", default=None)
    args = ap.parse_args(argv)
    info = convert(args.input, args.output, gqa=args.gqa, eps=args.eps,
                   context_length=args.context_length, name=args.name)
    print(info, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
