"""Batch structures and splitting.

Parity target: llama_batch / llama_ubatch and the batch splitter
(/root/reference/src/llama-batch.cpp/h): user batches are validated,
positions auto-filled from the cache, and split into ubatches of at most
n_ubatch tokens. Tokens may carry multiple sequence ids (coupled seqs)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Batch:
    """A user-visible batch of tokens to decode (llama_batch analogue)."""

    tokens: list[int] = field(default_factory=list)
    pos: list[int | None] = field(default_factory=list)
    seq_ids: list[list[int]] = field(default_factory=list)
    logits: list[bool] = field(default_factory=list)
    # qwen2vl M-RoPE position 4-vectors (t, h, w, e) per token; None entries
    # default to (pos, pos, pos, 0) — the text-only stream (llama_batch
    # n_pos_per_embd semantics)
    mpos: list[tuple | None] = field(default_factory=list)

    def add(self, token: int, pos: int | None = None, seq_ids=(0,),
            logits=False, mpos=None):
        self.tokens.append(int(token))
        self.pos.append(pos)
        self.seq_ids.append(list(seq_ids))
        self.logits.append(bool(logits))
        self.mpos.append(tuple(mpos) if mpos is not None else None)

    def __len__(self):
        return len(self.tokens)

    @staticmethod
    def one(token: int, pos: int | None = None, seq_id: int = 0) -> "Batch":
        b = Batch()
        b.add(token, pos, (seq_id,), logits=True)
        return b

    @staticmethod
    def text(tokens, seq_id: int = 0, logits_last_only: bool = True,
             pos_start: int | None = None) -> "Batch":
        b = Batch()
        n = len(tokens)
        for i, t in enumerate(tokens):
            pos = None if pos_start is None else pos_start + i
            b.add(t, pos, (seq_id,), logits=(not logits_last_only) or i == n - 1)
        return b


@dataclass
class UBatch:
    tokens: np.ndarray  # [T] int32
    pos: np.ndarray  # [T] int32
    seq_primary: np.ndarray  # [T] int32 (first seq id, used for masking)
    seq_sets: list[list[int]]  # full seq-id sets per token (cell membership)
    out_mask: np.ndarray  # [T] bool
    orig_index: np.ndarray  # [T] index into the parent Batch
    mpos: np.ndarray | None = None  # [T, 4] int32 M-RoPE positions


def _mpos_rows(batch: "Batch", idx) -> np.ndarray:
    # rows of -1 mark DEFAULTED positions: the engine fills them from the
    # per-seq text-stream delta (post-image continuation tracking)
    rows = np.full((len(idx), 4), -1, np.int32)
    for j, i in enumerate(idx):
        m = batch.mpos[i] if i < len(batch.mpos) else None
        if m is not None:
            rows[j] = 0
            rows[j, : len(m)] = m
    return rows


def sanitize(batch: Batch, cells) -> Batch:
    """Fill missing positions from the cache (pos = seq_pos_max + 1 onwards),
    mirroring llama_batch_allocr's auto pos/seq completion."""
    next_pos: dict[int, int] = {}
    out = Batch()
    for i, tok in enumerate(batch.tokens):
        seqs = batch.seq_ids[i] if i < len(batch.seq_ids) and batch.seq_ids[i] else [0]
        pos = batch.pos[i] if i < len(batch.pos) else None
        if pos is None:
            s0 = seqs[0]
            if s0 not in next_pos:
                next_pos[s0] = cells.seq_pos_max(s0) + 1
            pos = next_pos[s0]
            next_pos[s0] = pos + 1
        else:
            next_pos[seqs[0]] = pos + 1
        out.add(tok, pos, seqs, batch.logits[i] if i < len(batch.logits) else False,
                mpos=batch.mpos[i] if i < len(batch.mpos) else None)
    return out


def split_simple(batch: Batch, n_ubatch: int) -> list[UBatch]:
    """Contiguous splitting into ubatches (llama-batch.h split_simple)."""
    ubatches = []
    n = len(batch)
    for start in range(0, n, n_ubatch):
        end = min(start + n_ubatch, n)
        idx = np.arange(start, end)
        ubatches.append(
            UBatch(
                tokens=np.asarray(batch.tokens[start:end], np.int32),
                pos=np.asarray([p for p in batch.pos[start:end]], np.int32),
                seq_primary=np.asarray(
                    [s[0] for s in batch.seq_ids[start:end]], np.int32
                ),
                seq_sets=[list(s) for s in batch.seq_ids[start:end]],
                out_mask=np.asarray(batch.logits[start:end], bool),
                orig_index=idx,
                mpos=_mpos_rows(batch, list(range(start, end))),
            )
        )
    return ubatches


def _gather(batch: Batch, idx) -> UBatch:
    idx = np.asarray(idx, np.int64)
    return UBatch(
        tokens=np.asarray([batch.tokens[i] for i in idx], np.int32),
        pos=np.asarray([batch.pos[i] for i in idx], np.int32),
        seq_primary=np.asarray([batch.seq_ids[i][0] for i in idx], np.int32),
        seq_sets=[list(batch.seq_ids[i]) for i in idx],
        out_mask=np.asarray([batch.logits[i] for i in idx], bool),
        orig_index=idx,
        mpos=_mpos_rows(batch, list(idx)),
    )


def split_equal(batch: Batch, n_ubatch: int) -> list[UBatch]:
    """Equal-length splitting (llama-batch.h:69-77 split_equal): each ubatch
    holds the same number of tokens from every participating sequence —
    the invariant recurrent models need (their state update consumes one
    fixed-shape [n_seqs, n_tokens] block per step). Tokens of each sequence
    keep their order; sequences are aligned from their first pending token."""
    per_seq: dict[int, list[int]] = {}
    for i, seqs in enumerate(batch.seq_ids):
        per_seq.setdefault(seqs[0], []).append(i)

    out: list[UBatch] = []
    offs = {s: 0 for s in per_seq}
    while any(offs[s] < len(ix) for s, ix in per_seq.items()):
        live = [s for s, ix in per_seq.items() if offs[s] < len(ix)]
        n_take = min(len(per_seq[s]) - offs[s] for s in live)
        n_take = max(1, min(n_take, max(1, n_ubatch // len(live))))
        idx: list[int] = []
        for s in live:
            idx.extend(per_seq[s][offs[s]:offs[s] + n_take])
            offs[s] += n_take
        out.append(_gather(batch, idx))
    return out


def split_seq(batch: Batch, n_ubatch: int) -> list[UBatch]:
    """One sequence per ubatch (llama-batch.h split_seq), further chopped
    to n_ubatch tokens."""
    per_seq: dict[int, list[int]] = {}
    for i, seqs in enumerate(batch.seq_ids):
        per_seq.setdefault(seqs[0], []).append(i)
    out: list[UBatch] = []
    for s in sorted(per_seq):
        ix = per_seq[s]
        for start in range(0, len(ix), n_ubatch):
            out.append(_gather(batch, ix[start:start + n_ubatch]))
    return out
