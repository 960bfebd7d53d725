"""Recurrent memory: fixed per-sequence state slots for SSM/RWKV models.

Parity target: llama_memory_recurrent
(/root/reference/src/llama-memory-recurrent.cpp/h): one state slot per
sequence (conv shift state + ssm state per layer), seq_cp copies whole
states, partial-range seq_rm is rejected (recurrent states cannot be
rewound below pos_max; llama_memory_recurrent::seq_rm returns false).

Device states live in per-layer arrays [n_slots+1, ...]; the last slot is
a trash slot for padding rows. The host tracks seq->slot and pos_max.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class RecurrentSlots:
    def __init__(self, cfg, n_slots: int = 32, dtype=jnp.float32):
        self.cfg = cfg
        self.n_slots = n_slots
        self.seq_slot: dict[int, int] = {}
        self.pos_max: dict[int, int] = {}
        if cfg.wkv_head_size > 0:  # rwkv6: token-shift rows + wkv state
            E, D = cfg.n_embd, cfg.wkv_head_size
            H = E // D
            self.conv = [jnp.zeros((n_slots + 1, 2, E), dtype)
                         for _ in range(cfg.n_layers)]
            self.ssm = [jnp.zeros((n_slots + 1, H, D, D), dtype)
                        for _ in range(cfg.n_layers)]
        else:  # mamba: conv shift state + ssm state (mamba2's conv also
            # carries the B/C channels: d_inner + 2*G*d_state)
            di, dc, ds = cfg.ssm_d_inner, cfg.ssm_d_conv, cfg.ssm_d_state
            conv_ch = di + 2 * cfg.ssm_n_group * ds
            self.conv = [
                jnp.zeros((n_slots + 1, max(dc - 1, 1), conv_ch), dtype)
                for _ in range(cfg.n_layers)
            ]
            self.ssm = [
                jnp.zeros((n_slots + 1, di, ds), dtype) for _ in range(cfg.n_layers)
            ]

    @property
    def trash_slot(self) -> int:
        return self.n_slots

    def slot_of(self, seq_id: int, create: bool = False) -> int | None:
        s = self.seq_slot.get(seq_id)
        if s is None and create:
            used = set(self.seq_slot.values())
            for i in range(self.n_slots):
                if i not in used:
                    self.seq_slot[seq_id] = i
                    self.pos_max[seq_id] = -1
                    self._zero_slot(i)
                    return i
            return None
        return s

    def _zero_slot(self, slot: int) -> None:
        for il in range(len(self.conv)):
            self.conv[il] = self.conv[il].at[slot].set(0.0)
            self.ssm[il] = self.ssm[il].at[slot].set(0.0)

    # -- sequence ops (llama_memory_recurrent seq_* semantics) ---------------

    def seq_rm(self, seq_id: int, p0: int = -1, p1: int = -1) -> bool:
        """Whole-sequence removal only (partial rewind unsupported on
        recurrent state — reference returns false)."""
        if seq_id not in self.seq_slot:
            return True
        if p0 > 0 or (0 <= p1 <= self.pos_max.get(seq_id, -1)):
            return False
        del self.seq_slot[seq_id]
        self.pos_max.pop(seq_id, None)
        return True

    def seq_cp(self, src: int, dst: int, p0: int = -1, p1: int = -1) -> None:
        ss = self.seq_slot.get(src)
        if ss is None or src == dst:
            return
        ds_ = self.slot_of(dst, create=True)
        if ds_ is None:
            raise RuntimeError("no free recurrent slot for seq_cp")
        for il in range(len(self.conv)):
            self.conv[il] = self.conv[il].at[ds_].set(self.conv[il][ss])
            self.ssm[il] = self.ssm[il].at[ds_].set(self.ssm[il][ss])
        self.pos_max[dst] = self.pos_max.get(src, -1)

    def seq_keep(self, seq_id: int) -> None:
        for s in list(self.seq_slot):
            if s != seq_id:
                del self.seq_slot[s]
                self.pos_max.pop(s, None)

    def seq_pos_max(self, seq_id: int) -> int:
        return self.pos_max.get(seq_id, -1)

    def clear(self) -> None:
        self.seq_slot.clear()
        self.pos_max.clear()

    # -- state io -------------------------------------------------------------

    def state_get(self, seq_id: int) -> dict | None:
        slot = self.seq_slot.get(seq_id)
        if slot is None:
            return None
        return {
            "pos_max": self.pos_max.get(seq_id, -1),
            "conv": [np.asarray(c[slot]) for c in self.conv],
            "ssm": [np.asarray(s[slot]) for s in self.ssm],
        }

    def state_set(self, seq_id: int, state: dict) -> None:
        slot = self.slot_of(seq_id, create=True)
        if slot is None:
            raise RuntimeError("no free recurrent slot")
        for il in range(len(self.conv)):
            self.conv[il] = self.conv[il].at[slot].set(jnp.asarray(state["conv"][il]))
            self.ssm[il] = self.ssm[il].at[slot].set(jnp.asarray(state["ssm"][il]))
        self.pos_max[seq_id] = int(state["pos_max"])
