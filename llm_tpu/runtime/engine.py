"""Context: the execution engine.

Parity target: llama_context (/root/reference/src/llama-context.cpp) —
decode(batch) with ubatch splitting, KV slot allocation, logits output
mapping, perf counters, state save/load — rebuilt around ONE jit-compiled
step per (n_tokens, n_outputs) bucket instead of a per-ubatch graph rebuild
+ backend scheduler (SURVEY.md §3.1). The KV cache arrays are donated to
the step, so XLA updates them in place on device.

Return codes follow llama_decode (llama.h): 0 ok, 1 no KV slot, -1 invalid.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import load_params
from ..models.transformer import forward
from .batch import Batch, sanitize, split_simple
from .kv_cache import (MAX_SEQS, CellTable, SWACellTable, new_kv_arrays,
                       pack_seq_sets, seq_bit_row)

TOKEN_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int, buckets=TOKEN_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@dataclass
class PerfCounters:
    """llama_perf_context analogue (llama.h:1440-1447)."""

    t_load_ms: float = 0.0
    t_prefill_ms: float = 0.0
    t_decode_ms: float = 0.0
    n_prefill: int = 0
    n_decode: int = 0

    def summary(self) -> str:
        pp = self.n_prefill / self.t_prefill_ms * 1e3 if self.t_prefill_ms else 0.0
        tg = self.n_decode / self.t_decode_ms * 1e3 if self.t_decode_ms else 0.0
        return (
            f"load {self.t_load_ms:.0f} ms | "
            f"prefill {self.n_prefill} tok @ {pp:.2f} t/s | "
            f"decode {self.n_decode} tok @ {tg:.2f} t/s"
        )


class Context:
    def __init__(
        self,
        reader,
        n_cells: int = 4096,
        n_ubatch: int = 512,
        dtype=jnp.bfloat16,
        kv_dtype=None,
        use_planes: bool = True,
        params_cfg=None,
        mesh=None,
        swa_full: bool = False,
        n_seq_hint: int = 1,
        scan_layers: bool = False,
    ):
        """mesh: an optional jax.sharding.Mesh (axes dp/sp/tp, see
        parallel/sharding.make_mesh). When given, weights are TP-sharded,
        the KV cache is head- (and optionally cell-) sharded, and every jit
        step runs under the mesh with XLA inserting the collectives — the
        engine-level equivalent of the reference's --split-mode row
        (llama.h:222-227, ggml-backend.h:188).

        swa_full: give SWA layers full-size caches instead of the ISWA
        dual-cache ring (the reference's --swa-full, llama.h:374).
        n_seq_hint: expected concurrent sequences — sizes the SWA ring at
        n_seq_hint * (window + n_ubatch) cells (the iswa sizing rule).
        scan_layers: lax.scan over a stacked homogeneous decoder stack —
        compile time stops growing with depth (requires uniform layers; no
        runtime LoRA/cvec/imatrix, no ISWA dual cache)."""
        t0 = time.perf_counter()
        self.reader = reader
        if scan_layers and reader is not None \
                and getattr(reader, "architecture", "") == "gemma3n":
            scan_layers = False  # altup streams use the per-layer path
        if params_cfg is not None:
            self.params, self.cfg = params_cfg
            if scan_layers and "layers_stacked" not in self.params \
                    and not self.cfg.is_recurrent \
                    and self.cfg.arch != "gemma3n":
                from ..models.loader import stack_layers

                stacked = stack_layers(self.params["layers"])
                if stacked is not None:
                    self.params = dict(self.params)
                    self.params["layers_stacked"] = stacked
                    self.params["layers"] = []
        else:
            self.params, self.cfg = load_params(
                reader, dense_dtype=dtype, use_planes=use_planes,
                scan_layers=scan_layers)
        # longrope: pick the long/short factor set by context size
        # (llama_model::get_rope_factors, llama-model.cpp:4883 — rope_freqs
        # wins when present; n_cells stands in for n_ctx_per_seq)
        if self.params.get("rope_freqs") is None \
                and "rope_factors_long" in self.params:
            use_long = n_cells > (self.cfg.rope.n_ctx_orig or 0)
            self.params["rope_freqs"] = self.params[
                "rope_factors_long" if use_long else "rope_factors_short"]
        if self.cfg.n_expert > 0 and self.cfg.ep_cf == 0.0:
            # --ep-capacity-factor: folded into cfg HERE (host-side, at
            # construction) so the capacity is part of every compiled
            # program's identity — never an env read at trace time
            import os as _os

            _cf = float(_os.environ.get("LLM_TPU_EP_CF", "0") or 0)
            if _cf > 0:
                from dataclasses import replace as _replace

                self.cfg = _replace(self.cfg, ep_cf=_cf)
        self.dtype = dtype
        self.kv_dtype = kv_dtype if kv_dtype is not None else dtype
        self.n_ubatch = n_ubatch
        self.mesh = mesh
        self.rslots = None
        if mesh is not None:
            from dataclasses import replace

            from ..parallel.sharding import shard_params

            self.params, fused_tp = shard_params(self.params, mesh,
                                                 cfg=self.cfg)
            if fused_tp > 1:
                self.cfg = replace(self.cfg, fused_tp=fused_tp)
            if self.cfg.n_expert > 0 and mesh.shape.get("tp", 1) > 1:
                from ..parallel.moe import set_ep_mesh

                set_ep_mesh(mesh)
        if self.cfg.is_recurrent:
            from .recurrent import RecurrentSlots

            self.n_cells = n_cells
            self.n_kv_rows = 0
            self.n_swa_rows = 0
            self.cells = CellTable(0)
            self.cells_swa = None
            self.cells_mpos = None
            self.kv = None
            self.rslots = RecurrentSlots(self.cfg, n_slots=min(MAX_SEQS, n_cells))
        else:
            # Padding tokens carry write_idx == n_cells — OUT OF BOUNDS, so
            # the drop-mode K/V scatter (_kv_write) discards them. The cache
            # is exactly n_cells rows: keeping it a power-of-two-friendly
            # size matters on TPU (a +1 trash row would add a whole ragged
            # S-block to every flash-decode grid). Under a sequence-parallel
            # mesh, pad rows (never allocated, seq bits 0) round the cell
            # count up to a multiple of the sp axis so the cache shards
            # evenly.
            self.n_cells = n_cells
            n_rows = n_cells
            if mesh is not None and mesh.shape.get("sp", 1) > 1:
                sp = mesh.shape["sp"]
                n_rows = ((n_rows + sp - 1) // sp) * sp
            self.n_kv_rows = n_rows
            self.cells = CellTable(n_cells)
            # qwen2vl M-RoPE: per-cell (t, h, w, e) position 4-vectors +
            # per-seq text-stream delta (text after an image continues at
            # max(streams)+1 while the primary index keeps counting cells)
            self.cells_mpos = (np.zeros((n_cells, 4), np.int32)
                               if self.cfg.rope_sections is not None else None)
            self.mrope_delta: dict[int, int] = {}

            # ISWA dual cache: SWA layers get a small ring sized
            # n_seq_hint * (window + n_ubatch) — the memory the reference's
            # dual cache saves on gemma-class interleaved-SWA models.
            self.cells_swa = None
            self.n_swa_rows = 0
            row_counts = None
            cfg = self.cfg
            if (not swa_full and cfg.swa_window > 0 and cfg.swa_pattern > 0):
                n_swa = min(n_cells,
                            n_seq_hint * (cfg.swa_window + n_ubatch))
                if n_swa < n_cells:  # otherwise the ring saves nothing
                    swa_rows = n_swa  # pad writes drop OOB, as above
                    if mesh is not None and mesh.shape.get("sp", 1) > 1:
                        sp = mesh.shape["sp"]
                        swa_rows = ((swa_rows + sp - 1) // sp) * sp
                    self.cells_swa = SWACellTable(n_swa, cfg.swa_window)
                    self.n_swa_rows = swa_rows
                    row_counts = [
                        swa_rows if cfg.layer_is_swa(il) else n_rows
                        for il in range(cfg.n_layers)
                    ]
            if cfg.n_kv_layers and cfg.n_kv_layers < cfg.n_layers:
                # gemma3n shared-KV tail: the reuse layers read another
                # layer's cache — allocate token-sized stubs for theirs
                if row_counts is None:
                    row_counts = [n_rows] * cfg.n_layers
                for il in range(cfg.n_kv_layers, cfg.n_layers):
                    row_counts[il] = 8
            self.kv = new_kv_arrays(
                self.cfg.n_layers, n_rows,
                self.cfg.n_kv_heads_list or self.cfg.n_kv_heads,
                self.cfg.head_dim, self.cfg.head_dim_v, self.kv_dtype,
                row_counts=row_counts,
            )
            if "layers_stacked" in self.params and row_counts is None:
                # scan path: KV as stacked [L, ...] arrays (scan xs)
                stk = lambda xs: (
                    tuple(jnp.stack(p) for p in zip(*xs))
                    if isinstance(xs[0], tuple) else jnp.stack(xs)
                )
                self.kv.k = stk(self.kv.k)
                self.kv.v = stk(self.kv.v)
            if mesh is not None:
                from ..parallel.sharding import kv_shardings

                stacked = not isinstance(self.kv.k, list)
                ks, vs = kv_shardings(
                    self.cfg.n_layers, mesh,
                    n_kv_heads=self.cfg.n_kv_heads, n_rows=n_rows,
                    stacked=stacked,
                )
                put = lambda a, s: (
                    tuple(jax.device_put(x, s) for x in a)
                    if isinstance(a, tuple) else jax.device_put(a, s)
                )
                if stacked:
                    self.kv.k = put(self.kv.k, ks[0])
                    self.kv.v = put(self.kv.v, vs[0])
                else:
                    self.kv.k = [put(a, s) for a, s in zip(self.kv.k, ks)]
                    self.kv.v = [put(a, s) for a, s in zip(self.kv.v, vs)]
        self._steps: dict = {}
        self._logits: dict[int, np.ndarray] = {}  # batch index -> logits row
        self._embd: dict[int, np.ndarray] = {}  # batch index -> hidden row
        self.perf = PerfCounters()
        self.perf.t_load_ms = (time.perf_counter() - t0) * 1e3

    # -- jit step cache -------------------------------------------------------

    def _mesh_ctx(self):
        """Mesh context for step execution (required by shard_map-based EP;
        harmless otherwise)."""
        import contextlib

        return self.mesh if self.mesh is not None else contextlib.nullcontext()

    def _in(self, a, dtype=None):
        """Step-input array transfer. Single-controller: plain jnp.asarray.
        Multi-controller (a mesh spanning >1 process — the multi-host-pod
        path, tests/test_distributed.py): host inputs must become GLOBAL
        replicated arrays, put collectively on every process, or the
        processes would disagree on input shardings."""
        if dtype is not None:
            a = np.asarray(a, dtype)
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(np.asarray(a), NamedSharding(self.mesh, P()))
        return jnp.asarray(a)

    def _jit_step(self, fn, host_out=(0,)):
        """jit a step with its KV/state args donated. Multi-controller: the
        outputs the host will np.asarray (host_out indices — logits, emitted
        tokens) are constrained fully-replicated in-graph, since pulling a
        cross-process-sharded array to one host is not possible."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rs = NamedSharding(self.mesh, P())
            inner = fn

            def fn(*a, **k):
                outs = list(inner(*a, **k))
                for i in host_out:
                    outs[i] = jax.lax.with_sharding_constraint(outs[i], rs)
                return tuple(outs)

        return jax.jit(fn, donate_argnums=(1, 2))

    def _get_step(self, T: int, O: int):
        dual = self.cells_swa is not None
        key = (T, O, dual)
        if key in self._steps:
            return self._steps[key]
        cfg, dtype = self.cfg, self.dtype
        if cfg.arch == "gemma3n":
            from ..models.gemma3n import forward_gemma3n as fwd
        else:
            fwd = forward

        if dual:
            def _step(params, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                      cbits, oidx, spos, sbits, swidx):
                return fwd(
                    params, cfg, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                    cbits, oidx, dtype=dtype, swa_cell_pos=spos,
                    swa_cell_seq_bits=sbits, swa_write_idx=swidx,
                )
        elif cfg.rope_sections is not None:
            def _step(params, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                      cbits, oidx, tmpos, cmpos):
                return fwd(
                    params, cfg, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                    cbits, oidx, dtype=dtype, tok_mpos=tmpos, cell_mpos=cmpos,
                )
        else:
            def _step(params, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                      cbits, oidx):
                return fwd(
                    params, cfg, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                    cbits, oidx, dtype=dtype,
                )

        fn = self._jit_step(_step, host_out=(0, 3))
        self._steps[key] = fn
        return fn

    def _swa_step_inputs(self, T: int, n: int, slots_swa):
        """(spos, sbits, swidx) device metadata for the SWA ring."""
        widx_swa = np.full(T, self.cells_swa.n_cells, np.int32)
        widx_swa[:n] = slots_swa
        spos = np.zeros(self.n_swa_rows, np.int32)
        spos[: self.cells_swa.n_cells] = self.cells_swa.pos
        return spos, self.cells_swa.bit_planes(self.n_swa_rows), widx_swa

    def _plan_swa_slots(self, seq_id: int, pos0: int, n: int):
        """Precompute the SWA ring slot for each of n generated tokens.

        Ring allocation is deterministic given the positions pos0..pos0+n-1:
        free cells first, then reuse this sequence's oldest exclusively-
        owned cell once it falls out of the attention window (dead iff
        cell_pos <= p - window, the complement of the is_masked_swa rule in
        ops/attention.py:52 — and positions only grow, so dead stays dead).
        Returns [n] int32 (values may repeat: a cell reused across steps),
        or None when the ring cannot host the schedule."""
        import heapq

        ct = self.cells_swa
        this = ct.seq_mask(seq_id)
        bits = ct.seq_bits.copy()
        bits[:, seq_id >> 5] &= ~(np.uint32(1) << np.uint32(seq_id & 31))
        shared = bits.any(axis=1)  # member of some OTHER seq too
        free_list = [int(c) for c in np.flatnonzero(~ct.used_mask())]
        heap = [(int(ct.pos[c]), int(c))
                for c in np.flatnonzero(this & ~shared)]
        heapq.heapify(heap)
        slots = np.empty(n, np.int32)
        win = ct.window
        for i in range(n):
            p = pos0 + i
            if free_list:
                s = free_list.pop()
            elif heap and heap[0][0] <= p - win:
                s = heapq.heappop(heap)[1]
            else:
                return None
            slots[i] = s
            heapq.heappush(heap, (p, s))
        return slots

    # -- decode ---------------------------------------------------------------

    def decode(self, batch: Batch) -> int:
        if len(batch) == 0:
            return -1
        for seqs in batch.seq_ids:
            for s in seqs or (0,):
                if not (0 <= s < MAX_SEQS):
                    return -1
        if self.rslots is not None:
            return self._decode_recurrent(batch)
        batch = sanitize(batch, self.cells)
        self._logits.clear()
        self._embd.clear()

        for ub in split_simple(batch, self.n_ubatch):
            n = len(ub.tokens)
            slots = self.cells.find_slots(n)
            if slots is None:
                return 1  # no KV slot (recoverable, llama.h decode doc)
            slots_swa = None
            if self.cells_swa is not None:
                slots_swa = self.cells_swa.find_slots(n)
                if slots_swa is None:
                    return 1
            t0 = time.perf_counter()

            T = _bucket(n)
            out_rows = np.flatnonzero(ub.out_mask)
            O = _bucket(max(1, len(out_rows)))

            tokens = np.zeros(T, np.int32)
            pos = np.zeros(T, np.int32)
            seq = np.zeros(T, np.int32)
            widx = np.full(T, self.n_cells, np.int32)  # pad -> OOB (dropped)
            tokens[:n] = ub.tokens
            pos[:n] = ub.pos
            seq[:n] = ub.seq_primary
            widx[:n] = slots
            oidx = np.zeros(O, np.int32)
            oidx[: len(out_rows)] = out_rows

            # occupy cells BEFORE the step so intra-ubatch attention sees them
            bits = pack_seq_sets(ub.seq_sets)
            self.cells.pos[slots] = ub.pos
            self.cells.seq_bits[slots] = bits

            cpos = np.zeros(self.n_kv_rows, np.int32)
            cpos[: self.n_cells] = self.cells.pos
            cbits = self.cells.bit_planes(self.n_kv_rows)

            extra = ()
            if slots_swa is not None:
                self.cells_swa.pos[slots_swa] = ub.pos
                self.cells_swa.seq_bits[slots_swa] = bits
                spos, sbits, widx_swa = self._swa_step_inputs(T, n, slots_swa)
                extra = (self._in(spos), self._in(sbits),
                         self._in(widx_swa))
            elif self.cells_mpos is not None:
                mp = ub.mpos.copy()
                for i in range(n):
                    s0 = int(ub.seq_primary[i])
                    if mp[i, 0] < 0:  # defaulted: text stream = pos + delta
                        p = int(ub.pos[i]) + self.mrope_delta.get(s0, 0)
                        mp[i] = (p, p, p, 0)
                    else:  # explicit: update the seq's stream delta
                        self.mrope_delta[s0] = \
                            int(mp[i, :3].max()) - int(ub.pos[i])
                self.cells_mpos[slots] = mp
                tmpos = np.zeros((T, 4), np.int32)
                tmpos[:n] = mp
                cmpos = np.zeros((self.n_kv_rows, 4), np.int32)
                cmpos[: self.n_cells] = self.cells_mpos
                extra = (self._in(tmpos), self._in(cmpos))

            step = self._get_step(T, O)
            try:
                with self._mesh_ctx():
                    logits, new_k, new_v, hidden = step(
                        self.params, self.kv.k, self.kv.v,
                        self._in(tokens), self._in(pos), self._in(seq),
                        self._in(widx), self._in(cpos), self._in(cbits),
                        self._in(oidx), *extra,
                    )
            except Exception:
                # roll back cell occupation for this ubatch (decode() failure
                # rollback, llama-context.cpp:1015-1035)
                self.cells.release(slots)
                if slots_swa is not None:
                    self.cells_swa.release(slots_swa)
                raise
            self.kv.k, self.kv.v = new_k, new_v

            logits_np = np.asarray(logits[: len(out_rows)])
            hidden_np = np.asarray(hidden[: len(out_rows)])
            for i, bi in enumerate(ub.orig_index[out_rows]):
                self._logits[int(bi)] = logits_np[i]
                self._embd[int(bi)] = hidden_np[i]

            dt = (time.perf_counter() - t0) * 1e3
            if n > 1:
                self.perf.t_prefill_ms += dt
                self.perf.n_prefill += n
            else:
                self.perf.t_decode_ms += dt
                self.perf.n_decode += 1
        return 0

    # -- embedding-input decode (multimodal chunks) -------------------------------

    def _get_embd_step(self, T: int, O: int):
        dual = self.cells_swa is not None
        key = ("e", T, O, dual)
        if key in self._steps:
            return self._steps[key]
        cfg, dtype = self.cfg, self.dtype

        if dual:
            def _step(params, kv_k, kv_v, embd, pos, seq, widx, cpos, cbits,
                      oidx, spos, sbits, swidx):
                tokens = jnp.zeros(embd.shape[0], jnp.int32)
                return forward(
                    params, cfg, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                    cbits, oidx, dtype=dtype, input_embd=embd,
                    swa_cell_pos=spos, swa_cell_seq_bits=sbits,
                    swa_write_idx=swidx,
                )
        elif cfg.rope_sections is not None:
            def _step(params, kv_k, kv_v, embd, pos, seq, widx, cpos, cbits,
                      oidx, tmpos, cmpos):
                tokens = jnp.zeros(embd.shape[0], jnp.int32)
                return forward(
                    params, cfg, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                    cbits, oidx, dtype=dtype, input_embd=embd,
                    tok_mpos=tmpos, cell_mpos=cmpos,
                )
        else:
            def _step(params, kv_k, kv_v, embd, pos, seq, widx, cpos, cbits,
                      oidx):
                tokens = jnp.zeros(embd.shape[0], jnp.int32)
                return forward(
                    params, cfg, kv_k, kv_v, tokens, pos, seq, widx, cpos,
                    cbits, oidx, dtype=dtype, input_embd=embd,
                )

        fn = self._jit_step(_step, host_out=(0, 3))
        self._steps[key] = fn
        return fn

    def decode_embd(self, embd: np.ndarray, seq_id: int = 0,
                    pos_start: int | None = None, mpos=None) -> int:
        """Decode a run of embedding rows (multimodal image/audio chunks —
        the analogue of llama_batch.embd, llama.h batch docs). Rows occupy
        KV cells at consecutive positions; no logits are produced.
        mpos: optional [n, 4] (t, h, w, e) M-RoPE positions for the rows
        (qwen2vl image grids)."""
        n = embd.shape[0]
        if n == 0:
            return -1
        if pos_start is None:
            pos_start = self.cells.seq_pos_max(seq_id) + 1
        slots = self.cells.find_slots(n)
        if slots is None:
            return 1
        slots_swa = None
        if self.cells_swa is not None:
            slots_swa = self.cells_swa.find_slots(n)
            if slots_swa is None:
                return 1
        t0 = time.perf_counter()
        T = _bucket(n)
        pos_np = np.arange(pos_start, pos_start + n, dtype=np.int32)
        rows = np.zeros((T, embd.shape[1]), np.float32)
        rows[:n] = np.asarray(embd, np.float32)
        pos = np.zeros(T, np.int32)
        seq = np.full(T, seq_id, np.int32)
        widx = np.full(T, self.n_cells, np.int32)
        pos[:n] = pos_np
        widx[:n] = slots

        self.cells.pos[slots] = pos_np
        self.cells.seq_bits[slots] = seq_bit_row(seq_id)

        cpos = np.zeros(self.n_kv_rows, np.int32)
        cpos[: self.n_cells] = self.cells.pos
        cbits = self.cells.bit_planes(self.n_kv_rows)

        extra = ()
        if slots_swa is not None:
            self.cells_swa.pos[slots_swa] = pos_np
            self.cells_swa.seq_bits[slots_swa] = seq_bit_row(seq_id)
            spos, sbits, widx_swa = self._swa_step_inputs(T, n, slots_swa)
            extra = (self._in(spos), self._in(sbits),
                     self._in(widx_swa))
        elif self.cells_mpos is not None:
            if mpos is not None:
                mp = np.asarray(mpos, np.int32)
                self.mrope_delta[seq_id] = \
                    int(mp[-1, :3].max()) - int(pos_np[-1])
            else:
                d = self.mrope_delta.get(seq_id, 0)
                mp = np.stack([pos_np + d, pos_np + d, pos_np + d,
                               np.zeros(n, np.int32)], axis=1)
            self.cells_mpos[slots] = mp
            tmpos = np.zeros((T, 4), np.int32)
            tmpos[:n] = mp
            cmpos = np.zeros((self.n_kv_rows, 4), np.int32)
            cmpos[: self.n_cells] = self.cells_mpos
            extra = (self._in(tmpos), self._in(cmpos))

        step = self._get_embd_step(T, 1)
        try:
            with self._mesh_ctx():
                _, new_k, new_v, _ = step(
                    self.params, self.kv.k, self.kv.v,
                    self._in(rows, self.dtype), self._in(pos),
                    self._in(seq), self._in(widx), self._in(cpos),
                    self._in(cbits), self._in(np.zeros(1, np.int32)), *extra,
                )
        except Exception:
            self.cells.release(slots)
            if slots_swa is not None:
                self.cells_swa.release(slots_swa)
            raise
        self.kv.k, self.kv.v = new_k, new_v
        self.perf.t_prefill_ms += (time.perf_counter() - t0) * 1e3
        self.perf.n_prefill += n
        return 0

    # -- recurrent (SSM) decode -------------------------------------------------

    def _get_rstep(self, ns: int, nt: int, O: int):
        key = ("r", ns, nt, O)
        if key in self._steps:
            return self._steps[key]
        cfg, dtype = self.cfg, self.dtype
        if cfg.wkv_head_size > 0:
            if cfg.arch in ("rwkv7", "arwkv7"):
                from ..models.rwkv import forward_rwkv7 as fwd
            elif cfg.arch == "rwkv6qwen2":
                from ..models.rwkv import forward_rwkv6qwen2 as fwd
            else:
                from ..models.rwkv import forward_rwkv6 as fwd
        else:
            from ..models.ssm import forward_mamba as fwd

        def _step(params, conv, ssm, tokens, slots, oidx):
            return fwd(params, cfg, conv, ssm, tokens, slots, oidx,
                       dtype=dtype)

        fn = self._jit_step(_step, host_out=(0, 3))
        self._steps[key] = fn
        return fn

    def _decode_recurrent(self, batch: Batch) -> int:
        """Ubatch shape [ns, nt]: equal token counts per seq (the reference's
        split_equal invariant, llama-batch.h:69-77). Long sequences chop into
        bucket-sized chunks — exact, since state carries between chunks."""
        batch = sanitize(batch, self.rslots)
        self._logits.clear()
        self._embd.clear()

        # group token indices by primary seq, preserving order
        per_seq: dict[int, list[int]] = {}
        for i, seqs in enumerate(batch.seq_ids):
            per_seq.setdefault(seqs[0], []).append(i)

        work = []  # (seq_id, [batch indices chunk])
        for sid, idxs in per_seq.items():
            o = 0
            while o < len(idxs):
                take = 1
                for b in reversed(TOKEN_BUCKETS):
                    if b <= min(self.n_ubatch, len(idxs) - o):
                        take = b
                        break
                work.append((sid, idxs[o:o + take]))
                o += take

        # batch all single-token chunks of distinct seqs together
        singles = [(s, c) for s, c in work if len(c) == 1]
        multis = [(s, c) for s, c in work if len(c) > 1]
        groups: list[list[tuple[int, list[int]]]] = [[m] for m in multis]
        if singles:
            seen: dict[int, int] = {}
            gs: list[list] = []
            for s, c in singles:
                g = seen.get(s, -1) + 1
                seen[s] = g
                while len(gs) <= g:
                    gs.append([])
                gs[g].append((s, c))
            groups.extend(gs)

        for group in groups:
            ns_real = len(group)
            nt = len(group[0][1])
            ns = _bucket(ns_real, (1, 2, 4, 8, 16, 32))
            t0 = time.perf_counter()
            tokens = np.zeros((ns, nt), np.int32)
            slots = np.full(ns, self.rslots.trash_slot, np.int32)
            out_rows: list[tuple[int, int]] = []  # (flat row, batch index)
            for si, (sid, idxs) in enumerate(group):
                slot = self.rslots.slot_of(sid, create=True)
                if slot is None:
                    return 1  # no free state slot (recoverable)
                tokens[si] = [batch.tokens[i] for i in idxs]
                slots[si] = slot
                for ti, i in enumerate(idxs):
                    if batch.logits[i]:
                        out_rows.append((si * nt + ti, i))
                self.rslots.pos_max[sid] = max(
                    self.rslots.pos_max.get(sid, -1),
                    max(batch.pos[i] for i in idxs),
                )
            O = _bucket(max(1, len(out_rows)))
            oidx = np.zeros(O, np.int32)
            oidx[: len(out_rows)] = [r for r, _ in out_rows]

            step = self._get_rstep(ns, nt, O)
            logits, new_conv, new_ssm, hidden = step(
                self.params, self.rslots.conv, self.rslots.ssm,
                jnp.asarray(tokens), jnp.asarray(slots), jnp.asarray(oidx),
            )
            self.rslots.conv, self.rslots.ssm = list(new_conv), list(new_ssm)

            logits_np = np.asarray(logits[: len(out_rows)])
            hidden_np = np.asarray(hidden[: len(out_rows)])
            for j, (_, bi) in enumerate(out_rows):
                self._logits[int(bi)] = logits_np[j]
                self._embd[int(bi)] = hidden_np[j]

            n = ns_real * nt
            dt = (time.perf_counter() - t0) * 1e3
            if n > 1:
                self.perf.t_prefill_ms += dt
                self.perf.n_prefill += n
            else:
                self.perf.t_decode_ms += dt
                self.perf.n_decode += 1
        return 0

    # -- outputs ---------------------------------------------------------------

    def get_logits(self, i: int = -1) -> np.ndarray:
        """Logits for batch token index i (llama_get_logits_ith semantics)."""
        if i == -1:
            i = max(self._logits.keys())
        return self._logits[i]

    def all_logits(self) -> dict[int, np.ndarray]:
        return dict(self._logits)

    def get_embeddings(self, i: int = -1) -> np.ndarray:
        """Final hidden state for batch token i (llama_get_embeddings_ith)."""
        if i == -1:
            i = max(self._embd.keys())
        return self._embd[i]

    # -- on-device generation loop ---------------------------------------------

    def _get_gloop(self, n: int, temp: float, top_k: int):
        key = ("gloop", n, temp, top_k)
        if key in self._steps:
            return self._steps[key]
        cfg, dtype = self.cfg, self.dtype
        dual = self.cells_swa is not None
        if cfg.arch == "gemma3n":
            from ..models.gemma3n import forward_gemma3n as fwd
        else:
            fwd = forward

        def _loop(params, kv_k, kv_v, tok0, slots, cpos, cbits, pos0,
                  seq_id, eogs, rkey, cmpos=None, mdelta=0,
                  slots_swa=None, spos0=None, sbits0=None):
            toks0 = jnp.full((n,), -1, jnp.int32)
            word = seq_id >> 5
            mask = (jnp.uint32(1) << (seq_id & 31).astype(jnp.uint32))
            seq_arr = seq_id[None].astype(jnp.int32)

            def body(carry):
                i, tok, kk, vv, cb, sp, sb, toks, done, rk = carry
                # make the new token's pre-labeled cell visible to itself
                cb = cb.at[slots[i], word].set(cb[slots[i], word] | mask)
                kw = {}
                if cfg.rope_sections is not None:
                    p = (pos0 + i + mdelta).astype(jnp.int32)
                    kw = dict(tok_mpos=jnp.stack(
                        [p, p, p, jnp.int32(0)])[None], cell_mpos=cmpos)
                if dual:
                    # ISWA ring: the planned slot may REUSE an out-of-window
                    # cell, so its position label and seq bit are updated
                    # in-loop (device-side ring-slot arithmetic); the old
                    # contents are window-masked out by construction.
                    s = slots_swa[i]
                    sp = sp.at[s].set(pos0 + i)
                    sb = sb.at[s, word].set(sb[s, word] | mask)
                    kw.update(swa_cell_pos=sp, swa_cell_seq_bits=sb,
                              swa_write_idx=s[None])
                logits, kk, vv, _ = fwd(
                    params, cfg, kk, vv, tok[None],
                    (pos0 + i)[None].astype(jnp.int32), seq_arr,
                    slots[i][None], cpos, cb,
                    jnp.zeros(1, jnp.int32), dtype=dtype, **kw,
                )
                lg = logits[0]
                if temp <= 0.0:
                    nxt = jnp.argmax(lg)
                else:
                    lg = lg / temp
                    if top_k > 0:
                        kth = jax.lax.top_k(lg, top_k)[0][-1]
                        lg = jnp.where(lg < kth, -jnp.inf, lg)
                    rk, sub = jax.random.split(rk)
                    nxt = jax.random.categorical(sub, lg)
                nxt = nxt.astype(jnp.int32)
                toks = toks.at[i].set(nxt)
                return (i + 1, nxt, kk, vv, cb, sp, sb, toks,
                        jnp.any(nxt == eogs), rk)

            def cond(c):
                return (c[0] < n) & ~c[8]

            if spos0 is None:
                spos0 = jnp.zeros((0,), jnp.int32)
                sbits0 = jnp.zeros((0, 1), jnp.uint32)
            i, _, kk, vv, _, _, _, toks, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tok0, kv_k, kv_v, cbits,
                             spos0, sbits0, toks0,
                             jnp.asarray(False), rkey))
            return toks, i, kk, vv

        fn = self._jit_step(_loop, host_out=(0, 1))
        self._steps[key] = fn
        return fn

    def _get_gloop_batch(self, B: int, n: int):
        """Compiled multi-slot generation loop: B sequences advance together
        for up to n steps in ONE dispatch — the device-side analogue of the
        reference server batching all generating slots into one llama_decode
        per token (server.cpp update_slots), minus the per-token host trip.
        Per-slot sampling parameters are traced arrays, so one program per
        (B, n) serves every mix of slot settings."""
        key = ("gloopb", B, n)
        if key in self._steps:
            return self._steps[key]
        cfg, dtype = self.cfg, self.dtype
        from ..samplers.device import sample_rows
        if cfg.arch == "gemma3n":
            from ..models.gemma3n import forward_gemma3n as fwd
        else:
            fwd = forward

        def _loop(params, kv_k, kv_v, tok0, slots_mat, cpos, cbits, pos0,
                  seq_ids, n_lim, eogs, temps, top_ks, top_ps, min_ps, keys):
            toks0 = jnp.full((B, n), -1, jnp.int32)
            words = (seq_ids >> 5).astype(jnp.int32)
            masks = jnp.uint32(1) << (seq_ids & 31).astype(jnp.uint32)
            oidx = jnp.arange(B, dtype=jnp.int32)

            def body(carry):
                i, tok, kk, vv, cb, toks, done, ks = carry
                cells_i = slots_mat[:, i]
                # each new token's pre-labeled cell becomes visible to its
                # own sequence only (per-slot seq-bit planes)
                cb = cb.at[cells_i, words].set(cb[cells_i, words] | masks)
                logits, kk, vv, _ = fwd(
                    params, cfg, kk, vv, tok,
                    (pos0 + i).astype(jnp.int32), seq_ids, cells_i,
                    cpos, cb, oidx, dtype=dtype,
                )
                ks2 = jax.vmap(jax.random.split)(ks)
                nxt = sample_rows(logits, temps, top_ks, top_ps, min_ps,
                                  ks2[:, 1])
                # finished rows keep feeding their last token; their cells
                # stay unoccupied host-side, so in-loop garbage writes to
                # them are discarded at reconciliation
                nxt = jnp.where(done, tok, nxt)
                toks = toks.at[:, i].set(jnp.where(done, -1, nxt))
                done = (done | (nxt[:, None] == eogs[None, :]).any(axis=1)
                        | (i + 1 >= n_lim))
                return (i + 1, nxt, kk, vv, cb, toks, done, ks2[:, 0])

            def cond(c):
                return (c[0] < n) & ~jnp.all(c[6])

            i, _, kk, vv, _, toks, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tok0, kv_k, kv_v, cbits, toks0,
                             jnp.zeros((B,), bool), keys))
            return toks, i, kk, vv

        fn = self._jit_step(_loop, host_out=(0, 1))
        self._steps[key] = fn
        return fn

    def _get_gloop_recurrent(self, n: int, temp: float, top_k: int):
        key = ("gloopr", n, temp, top_k)
        if key in self._steps:
            return self._steps[key]
        cfg, dtype = self.cfg, self.dtype
        if cfg.wkv_head_size > 0:
            if cfg.arch in ("rwkv7", "arwkv7"):
                from ..models.rwkv import forward_rwkv7 as fwd
            elif cfg.arch == "rwkv6qwen2":
                from ..models.rwkv import forward_rwkv6qwen2 as fwd
            else:
                from ..models.rwkv import forward_rwkv6 as fwd
        else:
            from ..models.ssm import forward_mamba as fwd

        def _loop(params, conv, ssm, tok0, slot, eogs, rkey):
            toks0 = jnp.full((n,), -1, jnp.int32)
            oidx = jnp.zeros(1, jnp.int32)

            def body(carry):
                i, tok, cv, sm, toks, done, rk = carry
                logits, cv, sm, _ = fwd(params, cfg, cv, sm,
                                        tok[None, None], slot[None], oidx,
                                        dtype=dtype)
                lg = logits[0]
                if temp <= 0.0:
                    nxt = jnp.argmax(lg)
                else:
                    lg = lg / temp
                    if top_k > 0:
                        kth = jax.lax.top_k(lg, top_k)[0][-1]
                        lg = jnp.where(lg < kth, -jnp.inf, lg)
                    rk, sub = jax.random.split(rk)
                    nxt = jax.random.categorical(sub, lg)
                nxt = nxt.astype(jnp.int32)
                toks = toks.at[i].set(nxt)
                return (i + 1, nxt, cv, sm, toks, jnp.any(nxt == eogs), rk)

            def cond(c):
                return (c[0] < n) & ~c[5]

            i, _, cv, sm, toks, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), tok0, conv, ssm, toks0,
                             jnp.asarray(False), rkey))
            return toks, i, cv, sm

        fn = self._jit_step(_loop, host_out=(0, 1))
        self._steps[key] = fn
        return fn

    def generate_loop(self, first_token: int, n_tokens: int, *, seq_id: int = 0,
                      temp: float = 0.0, top_k: int = 0, seed: int = 0,
                      eog_ids=(), ) -> list[int]:
        """Decode up to n_tokens ON DEVICE in one dispatch: single-token
        forward + in-jit sampling (greedy / temperature / top-k) chained
        through a lax.while_loop that stops after emitting an EOG token.

        This removes the per-token host round trip of decode()+get_logits()
        — the gap between the reference's tight local decode loop
        (tools/main) and a host-driven engine grows with host<->device
        latency, so the production path keeps the loop on device. Cache
        cells are pre-allocated and pre-labeled with their positions; host
        metadata is reconciled after the loop from the emitted count. With
        the ISWA dual ring, ring slots are scheduled host-side up front
        (_plan_swa_slots) and relabeled in-loop on device."""
        if self.rslots is not None:
            # recurrent: states carry through the in-jit chain directly
            n = int(n_tokens)
            if n <= 0:
                return []
            slot = self.rslots.slot_of(seq_id, create=True)
            if slot is None:
                raise RuntimeError("generate_loop: no free state slot")
            eogs = np.asarray(list(eog_ids) or [-1], np.int32)
            t0 = time.perf_counter()
            step = self._get_gloop_recurrent(n, float(temp), int(top_k))
            toks, cnt, new_conv, new_ssm = step(
                self.params, self.rslots.conv, self.rslots.ssm,
                jnp.asarray(first_token, jnp.int32),
                jnp.asarray(slot, jnp.int32), jnp.asarray(eogs),
                jax.random.PRNGKey(seed),
            )
            self.rslots.conv, self.rslots.ssm = list(new_conv), list(new_ssm)
            cnt = int(cnt)
            self.rslots.pos_max[seq_id] = \
                self.rslots.pos_max.get(seq_id, -1) + cnt
            self._logits.clear()
            self._embd.clear()
            self.perf.t_decode_ms += (time.perf_counter() - t0) * 1e3
            self.perf.n_decode += cnt
            return [int(t) for t in np.asarray(toks)[:cnt]]
        if not (0 <= seq_id < MAX_SEQS):
            raise ValueError(f"bad seq_id {seq_id}")
        n = int(n_tokens)
        if n <= 0:
            return []
        slots = self.cells.find_slots(n)
        if slots is None:
            raise RuntimeError("generate_loop: no free KV cells")
        pos0 = self.cells.seq_pos_max(seq_id) + 1

        t0 = time.perf_counter()
        cpos = np.zeros(self.n_kv_rows, np.int32)
        cpos[: self.n_cells] = self.cells.pos
        cpos[slots] = pos0 + np.arange(n, dtype=np.int32)  # pre-labeled
        cbits = self.cells.bit_planes(self.n_kv_rows)
        eogs = np.asarray(list(eog_ids) or [-1], np.int32)

        step = self._get_gloop(n, float(temp), int(top_k))
        kw = {}
        if self.cells_mpos is not None:
            d = self.mrope_delta.get(seq_id, 0)
            cmpos = np.zeros((self.n_kv_rows, 4), np.int32)
            cmpos[: self.n_cells] = self.cells_mpos
            labels = pos0 + d + np.arange(n, dtype=np.int32)
            cmpos[slots] = np.stack(
                [labels, labels, labels, np.zeros(n, np.int32)], axis=1)
            kw = dict(cmpos=self._in(cmpos), mdelta=self._in(d, np.int32))
        plan_swa = None
        if self.cells_swa is not None:
            # ISWA ring: precompute the per-step ring slot schedule on the
            # host (allocation is deterministic: position i reuses the
            # oldest own cell once it falls out of the window)
            plan_swa = self._plan_swa_slots(seq_id, pos0, n)
            if plan_swa is None:
                raise RuntimeError("generate_loop: no SWA ring space")
            spos = np.zeros(self.n_swa_rows, np.int32)
            spos[: self.cells_swa.n_cells] = self.cells_swa.pos
            kw.update(slots_swa=self._in(plan_swa),
                      spos0=self._in(spos),
                      sbits0=self._in(
                          self.cells_swa.bit_planes(self.n_swa_rows)))
        with self._mesh_ctx():
            toks, cnt, new_k, new_v = step(
                self.params, self.kv.k, self.kv.v,
                self._in(first_token, np.int32), self._in(slots),
                self._in(cpos), self._in(cbits),
                self._in(pos0, np.int32),
                self._in(seq_id, np.int32), self._in(eogs),
                self._in(np.asarray(jax.random.PRNGKey(seed))), **kw,
            )
        toks = np.asarray(toks)
        cnt = int(cnt)
        self.kv.k, self.kv.v = new_k, new_v
        # reconcile host cell metadata with what the loop wrote
        used = slots[:cnt]
        upos = pos0 + np.arange(cnt, dtype=np.int32)
        self.cells.occupy(used, upos, np.full(cnt, seq_id, np.int64))
        if plan_swa is not None and cnt > 0:
            # final position per ring slot = its LAST write in the schedule
            final: dict[int, int] = {}
            for i, s in enumerate(plan_swa[:cnt]):
                final[int(s)] = pos0 + i
            us = np.fromiter(final.keys(), np.int32, len(final))
            up = np.fromiter(final.values(), np.int32, len(final))
            self.cells_swa.occupy(us, up, np.full(len(us), seq_id, np.int64))
            self.cells_swa.prune()
        if self.cells_mpos is not None:
            d = self.mrope_delta.get(seq_id, 0)
            self.cells_mpos[used] = np.stack(
                [upos + d, upos + d, upos + d, np.zeros(cnt, np.int32)],
                axis=1)
        self._logits.clear()
        self._embd.clear()
        self.perf.t_decode_ms += (time.perf_counter() - t0) * 1e3
        self.perf.n_decode += cnt
        return [int(t) for t in toks[:cnt]]

    def generate_loop_batch(self, first_tokens, n_tokens: int, *, seq_ids,
                            temps=None, top_ks=None, top_ps=None,
                            min_ps=None, seeds=None, n_limits=None,
                            eog_ids=()) -> list[list[int]]:
        """Decode up to n_tokens for B sequences AT ONCE in one dispatch:
        a batched single-token forward + per-slot in-jit sampling chained
        through one lax.while_loop. This is the serving hot path — with
        B generating slots it costs ONE host round trip per n_tokens-chunk
        instead of one per token per slot (the reference batches slots into
        one llama_decode per token, server.cpp:2961; on a remote-attached
        TPU the per-token host trip dominates, so the loop stays on device).

        first_tokens/seq_ids: length-B lists. temps/top_ks/top_ps/min_ps/
        seeds/n_limits: optional per-slot arrays (defaults: greedy,
        unlimited within n_tokens). Per-slot early stop on any eog_ids
        token or its n_limits budget; finished slots coast (their sampled
        garbage is never recorded and their remaining pre-allocated cells
        are returned free). Returns B token lists (<= n_tokens each).

        Not supported (callers fall back to generate_loop / decode):
        recurrent state, the ISWA dual ring, and M-RoPE cell tables."""
        if self.rslots is not None or self.cells_swa is not None \
                or self.cells_mpos is not None:
            raise ValueError("generate_loop_batch: unsupported memory kind")
        B = len(seq_ids)
        n = int(n_tokens)
        if B == 0 or n <= 0:
            return [[] for _ in seq_ids]
        if len(first_tokens) != B:
            raise ValueError("first_tokens/seq_ids length mismatch")
        for s in seq_ids:
            if not (0 <= s < MAX_SEQS):
                raise ValueError(f"bad seq_id {s}")
        # pad B to a power-of-two bucket so a server whose slot count
        # fluctuates per chunk compiles log2(n_slots) programs, not one per
        # B. Pad rows decode garbage under a scratch seq id into ONE shared
        # spare cell run (duplicate in-loop writes are harmless — nothing is
        # occupied host-side, so the next call's metadata hides them).
        scratch = MAX_SEQS - 1
        B_pad = 1 << (B - 1).bit_length()
        n_extra = n if (B_pad > B and scratch not in seq_ids) else 0
        flat = self.cells.find_slots(B * n + n_extra)
        if flat is None and n_extra:
            B_pad, n_extra = B, 0  # KV pressure: exact-B program, no spares
            flat = self.cells.find_slots(B * n)
        if flat is None:
            raise RuntimeError("generate_loop_batch: no free KV cells")
        if not n_extra:
            B_pad = B
        slots_mat = flat[: B * n].reshape(B, n)
        pos0 = np.asarray(
            [self.cells.seq_pos_max(s) + 1 for s in seq_ids], np.int32)

        t0 = time.perf_counter()
        cpos = np.zeros(self.n_kv_rows, np.int32)
        cpos[: self.n_cells] = self.cells.pos
        cpos[slots_mat] = pos0[:, None] + np.arange(n, dtype=np.int32)
        cbits = self.cells.bit_planes(self.n_kv_rows)
        eogs = np.full(8, -1, np.int32)
        for j, e in enumerate(list(eog_ids)[:8]):
            eogs[j] = e
        temps = np.zeros(B, np.float32) if temps is None \
            else np.asarray(temps, np.float32)
        top_ks = np.zeros(B, np.int32) if top_ks is None \
            else np.asarray(top_ks, np.int32)
        top_ps = np.ones(B, np.float32) if top_ps is None \
            else np.asarray(top_ps, np.float32)
        min_ps = np.zeros(B, np.float32) if min_ps is None \
            else np.asarray(min_ps, np.float32)
        n_lim = np.full(B, n, np.int32) if n_limits is None \
            else np.minimum(np.asarray(n_limits, np.int32), n)
        keys = np.stack([
            np.asarray(jax.random.PRNGKey(int(s)))
            for s in (seeds if seeds is not None else range(B))])

        first = np.asarray(first_tokens, np.int32)
        seq_arr = np.asarray(seq_ids, np.int32)
        if B_pad > B:
            pad = B_pad - B
            spare = np.broadcast_to(flat[B * n:], (pad, n))
            slots_mat = np.concatenate([slots_mat, spare])
            first = np.concatenate([first, np.zeros(pad, np.int32)])
            seq_arr = np.concatenate(
                [seq_arr, np.full(pad, scratch, np.int32)])
            pos0 = np.concatenate([pos0, np.zeros(pad, np.int32)])
            n_lim = np.concatenate([n_lim, np.ones(pad, np.int32)])
            temps = np.concatenate([temps, np.zeros(pad, np.float32)])
            top_ks = np.concatenate([top_ks, np.zeros(pad, np.int32)])
            top_ps = np.concatenate([top_ps, np.ones(pad, np.float32)])
            min_ps = np.concatenate([min_ps, np.zeros(pad, np.float32)])
            keys = np.concatenate(
                [keys, np.broadcast_to(keys[:1], (pad,) + keys.shape[1:])])

        step = self._get_gloop_batch(B_pad, n)
        with self._mesh_ctx():
            toks, _, new_k, new_v = step(
                self.params, self.kv.k, self.kv.v,
                self._in(first), self._in(slots_mat),
                self._in(cpos), self._in(cbits), self._in(pos0),
                self._in(seq_arr), self._in(n_lim),
                self._in(eogs), self._in(temps), self._in(top_ks),
                self._in(top_ps), self._in(min_ps), self._in(keys),
            )
        toks = np.asarray(toks)
        self.kv.k, self.kv.v = new_k, new_v
        out: list[list[int]] = []
        total = 0
        for b in range(B):
            row = toks[b]
            stop = np.flatnonzero(row == -1)
            cnt = int(stop[0]) if len(stop) else n
            used = slots_mat[b, :cnt]
            upos = pos0[b] + np.arange(cnt, dtype=np.int32)
            self.cells.occupy(used, upos,
                              np.full(cnt, seq_ids[b], np.int64))
            out.append([int(t) for t in row[:cnt]])
            total += cnt
        self._logits.clear()
        self._embd.clear()
        self.perf.t_decode_ms += (time.perf_counter() - t0) * 1e3
        self.perf.n_decode += total
        return out

    def encode(self, tokens: list[int], pooling: str = "mean", seq_id: int = 0):
        """Sequence embedding with pooling (llama_encode + pooling_type
        semantics: none/mean/cls/last)."""
        from .batch import Batch

        self.cells.seq_rm(seq_id)
        b = Batch()
        for i, t in enumerate(tokens):
            b.add(t, i, (seq_id,), logits=True)
        rc = self.decode(b)
        if rc != 0:
            raise RuntimeError(f"encode failed rc={rc}")
        rows = np.stack([self._embd[i] for i in range(len(tokens))])
        self.cells.seq_rm(seq_id)
        if pooling == "none":
            return rows
        if pooling == "cls":
            return rows[0]
        if pooling == "last":
            return rows[-1]
        return rows.mean(axis=0)  # mean

    # -- memory (seq) API (llama_memory_* passthrough) --------------------------

    def seq_rm(self, seq_id, p0=-1, p1=-1):
        if self.rslots is not None:
            return self.rslots.seq_rm(seq_id, p0, p1)
        self.cells.seq_rm(seq_id, p0, p1)
        if self.cells_swa is not None:
            self.cells_swa.seq_rm(seq_id, p0, p1)
        return True

    def seq_cp(self, src, dst, p0=-1, p1=-1):
        if self.rslots is not None:
            return self.rslots.seq_cp(src, dst, p0, p1)
        self.cells.seq_cp(src, dst, p0, p1)
        if self.cells_swa is not None:
            self.cells_swa.seq_cp(src, dst, p0, p1)

    def seq_keep(self, seq_id):
        if self.rslots is not None:
            return self.rslots.seq_keep(seq_id)
        self.cells.seq_keep(seq_id)
        if self.cells_swa is not None:
            self.cells_swa.seq_keep(seq_id)

    def seq_add(self, seq_id, p0, p1, delta):
        if self.cells_mpos is not None:
            m = self.cells._range_mask(seq_id, p0, p1)
            self.cells_mpos[m, :3] += delta
        self.cells.seq_add(seq_id, p0, p1, delta)
        if self.cells_swa is not None:
            self.cells_swa.seq_add(seq_id, p0, p1, delta)

    def seq_div(self, seq_id, p0, p1, d):
        self.cells.seq_div(seq_id, p0, p1, d)
        if self.cells_swa is not None:
            self.cells_swa.seq_div(seq_id, p0, p1, d)

    def seq_pos_max(self, seq_id):
        if self.rslots is not None:
            return self.rslots.seq_pos_max(seq_id)
        return self.cells.seq_pos_max(seq_id)

    def clear(self):
        if self.rslots is not None:
            self.rslots.clear()
        else:
            self.cells.clear()
            if self.cells_swa is not None:
                self.cells_swa.clear()
