"""Expert-parallel MoE dispatch (shard_map over the expert axis).

The reference has NO expert parallelism — MoE runs as ggml_mul_mat_id on a
single device (SURVEY.md §2.5, /root/reference/ggml/include/ggml.h:1271).
This is the TPU-native design: expert stacks live sharded over the mesh's
"tp" axis; every shard gathers only the (token, k) assignments it OWNS from
its local expert slice, computes their FFN contribution, and a psum merges
the partial outputs — token routing rides the same ICI collectives XLA uses
for tensor parallelism. FLOPs and expert-weight traffic are identical to
the single-device top-k path; each assignment is computed on exactly one
shard.
"""

from __future__ import annotations

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


def moe_ffn_ep(h, w_up, w_gate, w_down, topi, topw, act, mesh: Mesh, axis: str):
    """Expert-parallel top-k FFN.

    h: [T, D] activations (replicated); w_*: [E, N, K] stacks — dense
    arrays or stacked-expert QTensors (quantized planes stay quantized in
    HBM and across the expert shard) — sharded on E over `axis` (w_gate may
    be None); topi: [T, k] expert ids; topw: [T, k] f32 routing weights.
    Returns [T, D] f32."""
    from jax.experimental.shard_map import shard_map

    E = _n_experts(w_up)
    n_shards = mesh.shape[axis]
    e_local = E // n_shards
    cdtype = jnp.float32 if h.dtype == jnp.float32 else jnp.bfloat16

    def block(h, w_up, w_gate, w_down, topi, topw):
        # w_*: local slice [E/n, N, K]; h/topi/topw replicated
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

    # a bare P(...) acts as a pytree prefix, so it covers both dense arrays
    # and QTensor leaves (qs/scales/mins all shard their expert dim)
    espec = P(axis)
    rep = P()
    if w_gate is None:
        def block2(h, w_up, w_down, topi, topw):
            return block(h, w_up, None, w_down, topi, topw)
        return shard_map(
            block2, mesh=mesh, in_specs=(rep, espec, espec, rep, rep),
            out_specs=rep, check_rep=False,
        )(h, w_up, w_down, topi, topw)
    return shard_map(
        block, mesh=mesh, in_specs=(rep, espec, espec, espec, rep, rep),
        out_specs=rep, check_rep=False,
    )(h, w_up, w_gate, w_down, topi, topw)
