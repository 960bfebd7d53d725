"""Unified KV cache: device arrays + host-side cell table.

Parity target: the reference's unified cache
(/root/reference/src/llama-kv-cache-unified.cpp/h and llama-kv-cells.h):
sequence-addressed cells with pos / seq-membership metadata, seq_rm / seq_cp
/ seq_keep / seq_add / seq_div, slot finding, and state serialization.

TPU-first redesign:
  * cell metadata lives on the host (numpy); the device only sees two small
    int vectors per step (cell positions + seq bit-sets) from which the
    attention mask is computed in-jit — there is no defrag graph and no
    K-shift graph (K is cached unroped; see ops/attention.py).
  * cells need not be contiguous: the decode step scatters K/V rows via
    indexed writes (the analogue of ggml_set_rows,
    llama-kv-cache-unified.h:129-158), so find_slot is just a free-list pop.
  * seq_add / seq_div (context shift, self-extend group attention,
    main.cpp:372-400,481-489) are pure metadata edits.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_SEQS = 256  # seq bit-set width, matching the reference server's 256
# parallel slots. Per-cell membership is a [SEQ_WORDS] uint32 word-plane
# bitset host-side — the SAME layout the device mask consumes ([S, W]
# uint32; TPUs have no 64-bit integer lanes, so 32-bit words are native
# on both sides and the host table ships without conversion).
SEQ_WORDS = MAX_SEQS // 32


def seq_bit_row(seq_id: int) -> np.ndarray:
    """[SEQ_WORDS] uint32 bitset with only `seq_id` set."""
    row = np.zeros(SEQ_WORDS, np.uint32)
    row[seq_id >> 5] = np.uint32(1) << np.uint32(seq_id & 31)
    return row


def pack_seq_sets(seq_sets) -> np.ndarray:
    """list of seq-id iterables -> [n, SEQ_WORDS] uint32 bitsets."""
    bits = np.zeros((len(seq_sets), SEQ_WORDS), np.uint32)
    for i, ss in enumerate(seq_sets):
        for s in ss:
            bits[i, s >> 5] |= np.uint32(1) << np.uint32(s & 31)
    return bits


def planes_from_u64(bits64: np.ndarray) -> np.ndarray:
    """Legacy uint64 [n] bitsets -> [n, SEQ_WORDS] uint32 planes (old
    state files stored the 64-seq single-word form)."""
    out = np.zeros((len(bits64), SEQ_WORDS), np.uint32)
    out[:, 0] = (bits64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 1] = (bits64 >> np.uint64(32)).astype(np.uint32)
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v"],
    meta_fields=[],
)
@dataclass
class KVArrays:
    """Per-layer lists of HEAD-MAJOR cache planes: k[il]: [Hkv, S, Dk],
    v[il]: [Hkv, S, Dv] (round-5 layout: each KV head's cells are one
    contiguous (S, D) plane, so the flash kernels stream whole planes from
    HBM instead of per-head sublane slices — measured ~2x decode-attention
    bandwidth, scripts/kbench7.py).

    K is stored pre-RoPE; V post-projection. dtype is the cache type
    (bf16 by default; int8-quantized caches are (int8, scales) pairs)."""

    k: list[jax.Array]
    v: list[jax.Array]

    @property
    def n_cells(self) -> int:
        a = self.k[0] if isinstance(self.k, (list, tuple)) and not isinstance(self.k, jax.Array) else self.k
        if isinstance(a, tuple):
            a = a[0]
        return a.shape[-2]


KV_QUANT_GROUP = 32


def new_kv_arrays(n_layers, n_cells, n_kv_heads, head_dim_k, head_dim_v,
                  dtype=jnp.bfloat16, row_counts=None):
    """dtype: a jnp dtype for dense caches, or the string "q8_0" for an
    int8-quantized cache (per-32-group scales along the head dim) — the
    analogue of the reference's type_k/type_v cache quantization
    (llama-kv-cache-unified.h:64-75).

    row_counts: optional per-layer cell counts (the ISWA dual cache gives
    SWA layers a small ring, llama-kv-cache-unified-iswa.*); defaults to
    n_cells everywhere. n_kv_heads may be a per-layer sequence (openelm's
    layer-varying GQA, llama-hparams n_head_kv_arr)."""
    rows = row_counts if row_counts is not None else [n_cells] * n_layers
    if isinstance(n_kv_heads, (list, tuple)):
        heads = list(n_kv_heads)
    else:
        heads = [n_kv_heads] * n_layers
    if dtype == "q8_0":

        def mk(d):
            # flash-capable head dims (multiples of 128) use ONE scale per
            # head row — the fused attention kernel dequantizes in-register
            # with a lane-broadcast; other dims use the reference's 32-group
            if d % 128 == 0:
                g = d
            else:
                g = KV_QUANT_GROUP if d % KV_QUANT_GROUP == 0 else d
            return [
                (
                    jnp.zeros((heads[il], rows[il], d), jnp.int8),
                    jnp.zeros((heads[il], rows[il], d // g), jnp.bfloat16),
                )
                for il in range(n_layers)
            ]

        return KVArrays(k=mk(head_dim_k), v=mk(head_dim_v))
    k = [jnp.zeros((heads[il], rows[il], head_dim_k), dtype) for il in range(n_layers)]
    v = [jnp.zeros((heads[il], rows[il], head_dim_v), dtype) for il in range(n_layers)]
    return KVArrays(k=k, v=v)


class CellTable:
    """Host-side metadata for each cache cell (analogue of
    llama_kv_cells_unified, /root/reference/src/llama-kv-cells.h)."""

    def __init__(self, n_cells: int):
        self.n_cells = n_cells
        self.pos = np.full(n_cells, -1, np.int32)
        self.seq_bits = np.zeros((n_cells, SEQ_WORDS), np.uint32)

    # -- queries ------------------------------------------------------------

    def used_mask(self) -> np.ndarray:
        return self.seq_bits.any(axis=1)

    @property
    def n_used(self) -> int:
        return int(np.count_nonzero(self.used_mask()))

    def seq_mask(self, seq_id: int) -> np.ndarray:
        bit = np.uint32(1) << np.uint32(seq_id & 31)
        return (self.seq_bits[:, seq_id >> 5] & bit) != 0

    def bit_planes(self, n_rows: int | None = None) -> np.ndarray:
        """[n_rows, SEQ_WORDS] uint32 device planes (zero-padded past
        n_cells; padding rows have no members so they mask out)."""
        if n_rows is None or n_rows == self.n_cells:
            return self.seq_bits.copy()
        out = np.zeros((n_rows, SEQ_WORDS), np.uint32)
        out[: self.n_cells] = self.seq_bits
        return out

    def seq_pos_min(self, seq_id: int) -> int:
        m = self.seq_mask(seq_id)
        return int(self.pos[m].min()) if m.any() else -1

    def seq_pos_max(self, seq_id: int) -> int:
        m = self.seq_mask(seq_id)
        return int(self.pos[m].max()) if m.any() else -1

    def n_seq_cells(self, seq_id: int) -> int:
        return int(np.count_nonzero(self.seq_mask(seq_id)))

    # -- allocation ---------------------------------------------------------

    def find_slots(self, n: int) -> np.ndarray | None:
        """Indices of n free cells, or None if the cache is full."""
        free = np.flatnonzero(~self.used_mask())
        if len(free) < n:
            return None
        return free[:n].astype(np.int32)

    def occupy(self, idx: np.ndarray, pos: np.ndarray, seq_ids: np.ndarray) -> None:
        self.pos[idx] = pos
        seq_ids = np.asarray(seq_ids, np.int64)
        self.seq_bits[idx] = 0
        self.seq_bits[idx, seq_ids >> 5] = \
            np.uint32(1) << (seq_ids & 31).astype(np.uint32)

    def release(self, idx: np.ndarray) -> None:
        self.pos[idx] = -1
        self.seq_bits[idx] = 0

    # -- sequence ops (llama_memory_i seq_* API, llama-memory.h:66-110) ------

    def _range_mask(self, seq_id: int, p0: int, p1: int) -> np.ndarray:
        if p0 < 0:
            p0 = 0
        if p1 < 0:
            p1 = np.iinfo(np.int32).max
        return self.seq_mask(seq_id) & (self.pos >= p0) & (self.pos < p1)

    def seq_rm(self, seq_id: int, p0: int = -1, p1: int = -1) -> None:
        m = self._range_mask(seq_id, p0, p1)
        self.seq_bits[m, seq_id >> 5] &= \
            ~(np.uint32(1) << np.uint32(seq_id & 31))
        empty = m & ~self.used_mask()
        self.pos[empty] = -1

    def seq_cp(self, src: int, dst: int, p0: int = -1, p1: int = -1) -> None:
        m = self._range_mask(src, p0, p1)
        self.seq_bits[m, dst >> 5] |= np.uint32(1) << np.uint32(dst & 31)

    def seq_keep(self, seq_id: int) -> None:
        keep = self.seq_mask(seq_id)
        self.seq_bits[:] = 0
        self.seq_bits[keep, seq_id >> 5] = \
            np.uint32(1) << np.uint32(seq_id & 31)
        self.pos[~keep] = -1

    def seq_add(self, seq_id: int, p0: int, p1: int, delta: int) -> None:
        """Shift positions (context-shift). Cells pushed below 0 are removed."""
        m = self._range_mask(seq_id, p0, p1)
        self.pos[m] += delta
        dead = m & (self.pos < 0)
        self.seq_bits[dead] = 0
        self.pos[dead] = -1

    def seq_div(self, seq_id: int, p0: int, p1: int, d: int) -> None:
        """Divide positions (self-extend group attention)."""
        m = self._range_mask(seq_id, p0, p1)
        self.pos[m] = self.pos[m] // d

    def clear(self) -> None:
        self.pos[:] = -1
        self.seq_bits[:] = 0

    # -- state io -----------------------------------------------------------

    def state_dict(self) -> dict:
        return {"pos": self.pos.copy(), "seq_bits": self.seq_bits.copy()}

    def load_state_dict(self, d: dict) -> None:
        self.pos[:] = d["pos"]
        self.seq_bits[:] = d["seq_bits"]


class SWACellTable(CellTable):
    """Ring cell table for sliding-window layers (the small half of the
    reference's ISWA dual cache, llama-kv-cache-unified-iswa.*): cells whose
    position has slid out of every member sequence's window are pruned when
    space is needed — exactly the cells is_masked_swa would mask anyway
    (llama-kv-cache-unified.h:218), so pruning never changes outputs."""

    def __init__(self, n_cells: int, window: int):
        super().__init__(n_cells)
        self.window = window

    def prune(self) -> None:
        occupied = self.used_mask()
        if not occupied.any():
            return
        live = np.zeros(self.n_cells, bool)
        all_bits = np.bitwise_or.reduce(self.seq_bits, axis=0)
        for s in range(MAX_SEQS):
            if not (int(all_bits[s >> 5]) >> (s & 31)) & 1:
                continue
            m = self.seq_mask(s)
            pmax = int(self.pos[m].max())
            # visible to some future query of seq s: qp - pos < window with
            # qp >= pmax + 1  =>  pos > pmax + 1 - window
            live |= m & (self.pos > pmax + 1 - self.window)
        dead = occupied & ~live
        self.seq_bits[dead] = 0
        self.pos[dead] = -1

    def find_slots(self, n: int):
        r = super().find_slots(n)
        if r is None:
            self.prune()
            r = super().find_slots(n)
        return r
