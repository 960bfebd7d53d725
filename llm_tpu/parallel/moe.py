"""Expert-parallel MoE dispatch (shard_map over the expert axis).

The reference has NO expert parallelism — MoE runs as ggml_mul_mat_id on a
single device (SURVEY.md §2.5, /root/reference/ggml/include/ggml.h:1271).
This is the TPU-native design (SURVEY.md §2.5 expert-parallel row):

  * Expert stacks live sharded over the mesh's "tp" axis; activations are
    replicated (the engine's TP layout), so token "routing" is a LOCAL
    selection on each shard — every (token, k) assignment is computed on
    exactly the shard that owns its expert, and one psum merges the partial
    outputs over ICI. With replicated activations the all-to-all of a
    token-sharded dispatch degenerates to this select + psum: there is
    nothing to send because every shard already holds every token.
  * Decode (small T): per-assignment weight gather — only the chosen
    experts' quantized rows leave HBM (ggml_mul_mat_id analogue).
  * Prefill (large T): token-routed GROUPED dispatch — tokens are compacted
    into fixed-capacity per-expert buckets [e_local, C, D] (scatter with
    OOB-drop semantics, ragged-safe) and each local expert runs ONE dense
    [C, D] x [D, N] matmul over its bucket, so expert weights stream from
    HBM once per shard instead of once per assignment, and compute per
    shard is e_local*C rows instead of the T*k full-FFN rows the
    replicated-compute psum design paid. Capacity C = T is exact for
    top_k routing (each token's k experts are distinct, so an expert can
    receive at most T assignments); a capacity factor below that trades
    exactness for throughput and counts drops.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# module-level expert-parallel context: set by the engine / dryrun when
# params are mesh-sharded, consulted by models/transformer._moe_ffn
_EP_MESH: Mesh | None = None
_EP_AXIS: str = "tp"


def set_ep_mesh(mesh: Mesh | None, axis: str = "tp") -> None:
    global _EP_MESH, _EP_AXIS
    _EP_MESH = mesh
    _EP_AXIS = axis


def ep_mesh():
    return _EP_MESH, _EP_AXIS


def capacity_factor() -> float:
    """0 (default) = exact: every assignment is computed (C = T). A value
    f > 0 caps each expert's bucket at ceil(f * T * k / E) tokens; overflow
    assignments are DROPPED (contribute zero) — the standard
    capacity-factor throughput trade. Exactness tests run with 0."""
    return float(os.environ.get("LLM_TPU_EP_CF", "0") or 0)


def _n_experts(stack) -> int:
    from ..quant.qtensor import QTensor

    if isinstance(stack, QTensor):
        return stack.qs.shape[0]
    return stack.shape[0]


def _gather_local(stack, li, dtype):
    """Dequantized [T, k, N, K] from a local expert slice (dense array or
    stacked-expert QTensor)."""
    from ..ops.qmatmul import dequant_expert_rows
    from ..quant.qtensor import QTensor

    if isinstance(stack, QTensor):
        return dequant_expert_rows(stack, li, dtype=dtype)
    return stack[li].astype(dtype)


def _expert_ffn(x, w_up, w_gate, w_down, e, act, dtype):
    """Dense FFN of expert e over x [.., D] with lazily-sliced stacked
    weights (quantized planes dequantize one expert at a time)."""
    from ..ops.qmatmul import StackedWeight, qmm

    up = qmm(x, StackedWeight(w_up, e), dtype=dtype)
    if w_gate is not None:
        g = act(qmm(x, StackedWeight(w_gate, e), dtype=dtype).astype(jnp.float32))
        cur = (g * up.astype(jnp.float32)).astype(dtype)
    else:
        cur = act(up.astype(jnp.float32)).astype(dtype)
    return qmm(cur, StackedWeight(w_down, e), dtype=dtype)  # [.., D] f32


def dispatch_tables(topi, topw, e_base, e_local, cap):
    """Token-routed dispatch: compact the (token, k) assignments owned by
    experts [e_base, e_base+e_local) into per-expert buckets.

    Returns (tok_table [e_local, cap] int32 token index or -1,
             w_table [e_local, cap] f32 combine weight,
             dropped  scalar int32 — owned assignments beyond capacity).
    Ragged-safe: out-of-capacity and non-owned assignments scatter to an
    out-of-bounds slot and are dropped by the scatter, never written."""
    T, k = topi.shape
    le = topi - e_base  # local expert id; OOB when not owned
    own = (le >= 0) & (le < e_local)
    flat_e = jnp.where(own, le, e_local).reshape(-1)  # [T*k], e_local = trash
    onehot = (flat_e[:, None] == jnp.arange(e_local)[None, :]).astype(jnp.int32)
    rank = jnp.cumsum(onehot, axis=0) - onehot  # rank within expert bucket
    slot = jnp.sum(rank * onehot, axis=1)  # [T*k]
    over = own.reshape(-1) & (slot >= cap)
    dropped = jnp.sum(over.astype(jnp.int32))
    # route non-owned / overflow writes out of bounds -> mode="drop"
    slot = jnp.where(over, cap, slot)
    tok = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    tok_table = jnp.full((e_local, cap), -1, jnp.int32)
    tok_table = tok_table.at[flat_e, slot].set(tok, mode="drop")
    w_table = jnp.zeros((e_local, cap), jnp.float32)
    w_table = w_table.at[flat_e, slot].set(topw.reshape(-1), mode="drop")
    return tok_table, w_table, dropped


def _grouped_block(h, w_up, w_gate, w_down, topi, topw, act, e_base, e_local,
                   cap, dtype):
    """Grouped per-expert compute over one expert shard (or the whole stack
    when e_base=0, e_local=E). Returns partial output [T, D] f32."""
    T, D = h.shape
    tok_table, w_table, _ = dispatch_tables(topi, topw, e_base, e_local, cap)
    x = jnp.take(h, jnp.clip(tok_table, 0), axis=0)  # [e_local, cap, D]
    x = jnp.where((tok_table >= 0)[..., None], x, 0)

    def step(acc, e):
        # NB: e indexes the LOCAL stack (EP shards pass their slice);
        # e_base only offsets the ownership test in dispatch_tables
        y = _expert_ffn(x[e], w_up, w_gate, w_down, e, act, dtype)
        contrib = y.astype(jnp.float32) * w_table[e][:, None]
        acc = acc.at[jnp.clip(tok_table[e], 0)].add(
            jnp.where((tok_table[e] >= 0)[:, None], contrib, 0.0))
        return acc, None

    acc = jnp.zeros((T, D), jnp.float32)
    acc, _ = jax.lax.scan(step, acc, jnp.arange(e_local, dtype=jnp.int32))
    return acc


def _cap_from_cf(cf, T, k, E):
    """Per-expert bucket capacity from a capacity factor. cf is an explicit
    trace-time constant (part of the compiled program's identity — plumbed
    from ModelConfig.ep_cf by the engine); None falls back to the
    LLM_TPU_EP_CF env read for direct callers."""
    if cf is None:
        cf = capacity_factor()
    return T if cf <= 0 else min(T, max(8, -(-int(cf * T * k) // E)))


def moe_ffn_grouped(h, w_up, w_gate, w_down, topi, topw, act,
                    cap: int | None = None, cf: float | None = None):
    """Single-device token-routed grouped MoE for prefill batches.

    Replaces the per-assignment weight gather (which materializes
    [T, k, N, K] dequantized planes — O(T*k*N*K) bytes, intractable at real
    prefill sizes) with per-expert bucket matmuls: expert weights stream
    from HBM exactly once, buckets are [C, D] dense rows on the MXU.
    C defaults to T (exact). Returns [T, D] f32."""
    E = _n_experts(w_up)
    T = h.shape[0]
    if cap is None:
        cap = _cap_from_cf(cf, T, topi.shape[1], E)
    return _grouped_block(h, w_up, w_gate, w_down, topi, topw, act,
                          0, E, cap, h.dtype)


def moe_ffn_ep(h, w_up, w_gate, w_down, topi, topw, act, mesh: Mesh,
               axis: str, cf: float | None = None):
    """Expert-parallel top-k FFN (see module docstring for the design).

    h: [T, D] activations (replicated); w_*: [E, N, K] stacks — dense
    arrays or stacked-expert QTensors (quantized planes stay quantized in
    HBM and across the expert shard) — sharded on E over `axis` (w_gate may
    be None); topi: [T, k] expert ids; topw: [T, k] f32 routing weights.
    Returns [T, D] f32."""
    try:
        from jax import shard_map as _sm  # jax >= 0.8
        import inspect

        _kw = ("check_vma" if "check_vma" in inspect.signature(_sm).parameters
               else "check_rep")

        def shard_map(f, **kws):  # noqa: ANN001 - thin compat wrapper
            # jax 0.9 renamed check_rep -> check_vma; both mean "skip the
            # replication check" here (psum inside the body handles it)
            kws.pop("check_rep", None)
            kws[_kw] = False
            return _sm(f, **kws)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sme

        def shard_map(f, **kws):  # noqa: ANN001
            kws.setdefault("check_rep", False)
            return _sme(f, **kws)

    E = _n_experts(w_up)
    n_shards = mesh.shape[axis]
    e_local = E // n_shards
    T, k = topi.shape
    cdtype = jnp.float32 if h.dtype == jnp.float32 else jnp.bfloat16
    cap = _cap_from_cf(cf, T, k, E)

    def block_grouped(h, w_up, w_gate, w_down, topi, topw):
        shard = jax.lax.axis_index(axis)
        out = _grouped_block(h, w_up, w_gate, w_down, topi, topw, act,
                             shard * e_local, e_local, cap, h.dtype)
        return jax.lax.psum(out, axis)

    def block_gather(h, w_up, w_gate, w_down, topi, topw):
        # decode path: only the chosen experts' quantized rows leave HBM
        shard = jax.lax.axis_index(axis)
        e0 = shard * e_local
        own = (topi >= e0) & (topi < e0 + e_local)  # [T, k]
        li = jnp.clip(topi - e0, 0, e_local - 1)

        upw = _gather_local(w_up, li, cdtype)  # [T, k, N, K]
        up = jnp.einsum("td,tknd->tkn", h.astype(cdtype), upw)
        if w_gate is not None:
            g = jnp.einsum("td,tknd->tkn", h.astype(cdtype),
                           _gather_local(w_gate, li, cdtype))
            cur = act(g.astype(jnp.float32)) * up.astype(jnp.float32)
        else:
            cur = act(up.astype(jnp.float32))
        cur = cur.astype(h.dtype)
        out = jnp.einsum("tkn,tkdn->tkd", cur.astype(cdtype),
                         _gather_local(w_down, li, cdtype))
        w = jnp.where(own, topw, 0.0)  # non-owned assignments contribute 0
        out = jnp.sum(out.astype(jnp.float32) * w[..., None], axis=1)
        return jax.lax.psum(out, axis)

    block = block_gather if T <= 8 else block_grouped

    # a bare P(...) acts as a pytree prefix, so it covers both dense arrays
    # and QTensor leaves (qs/scales/mins all shard their expert dim)
    espec = P(axis)
    rep = P()
    if w_gate is None:
        def block2(h, w_up, w_down, topi, topw):
            return block(h, w_up, None, w_down, topi, topw)
        return shard_map(
            block2, mesh=mesh, in_specs=(rep, espec, espec, rep, rep),
            out_specs=rep,
        )(h, w_up, w_down, topi, topw)
    return shard_map(
        block, mesh=mesh, in_specs=(rep, espec, espec, espec, rep, rep),
        out_specs=rep,
    )(h, w_up, w_gate, w_down, topi, topw)
