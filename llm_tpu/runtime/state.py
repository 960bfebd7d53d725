"""Context state serialization: full-context and per-sequence.

Parity target: llama_state_get/set_data + llama_state_{load,save}_file and
the per-sequence variants llama_state_seq_* (/root/reference/include/
llama.h:813-900, impl src/llama-context.cpp:1556-1898) used for CLI prompt
caching (--prompt-cache) and server slot save/restore (/slots/:id).

Format: npz with cell metadata + KV rows (+ token history for prefix
matching), independent of cache capacity so states move between contexts.
"""

from __future__ import annotations

import numpy as np

from .kv_cache import planes_from_u64, seq_bit_row

MAGIC = "llm_tpu_state_v1"


def _bits_planes(arr: np.ndarray) -> np.ndarray:
    """Accept both stored forms: [n, SEQ_WORDS] uint32 planes (current) or
    legacy [n] uint64 single-word bitsets."""
    if arr.ndim == 1:
        return planes_from_u64(arr)
    return np.asarray(arr, np.uint32)


def _rows_to_f32(cache, idx) -> np.ndarray:
    """Extract cache rows as f32 (dequantizing a (q8, scales) cache).

    The device cache is head-major [Hkv, S, D]; rows are returned (and
    stored in state files) token-major [n, Hkv, D] — the on-disk format is
    layout-independent so old state files keep loading."""
    if isinstance(cache, tuple):
        q8, sc = cache
        q = np.asarray(q8[:, idx], np.float32)  # (H, n, d)
        s = np.asarray(sc[:, idx], np.float32)
        srep = np.repeat(s, q.shape[-1] // s.shape[-1], axis=-1)
        return (q * srep).swapaxes(0, 1)
    return np.asarray(cache[:, idx]).swapaxes(0, 1).astype(np.float32)


def _set_rows(cache, idx, rows_f32):
    """Scatter token-major f32 rows [n, Hkv, D] into a head-major cache
    (quantizing if needed). jnp-side."""
    import jax.numpy as jnp

    rows = jnp.swapaxes(jnp.asarray(rows_f32), 0, 1)  # (H, n, d)
    if isinstance(cache, tuple):
        q8, sc = cache
        g = rows.shape[-1] // sc.shape[-1]
        h, n, d = rows.shape
        vf = rows.reshape(h, n, d // g, g)
        amax = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
        scale = amax / 127.0
        inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
        qv = jnp.clip(jnp.round(vf * inv), -127, 127).astype(jnp.int8)
        return (
            q8.at[:, idx].set(qv.reshape(h, n, d)),
            sc.at[:, idx].set(scale.reshape(h, n, d // g).astype(sc.dtype)),
        )
    return cache.at[:, idx].set(rows.astype(cache.dtype))


def _is_swa_layer(ctx, il: int) -> bool:
    return ctx.cells_swa is not None and ctx.cfg.layer_is_swa(il)


def state_save(ctx, path: str, tokens: list[int] | None = None) -> None:
    """Full context state: all occupied cells + their KV rows. With the
    ISWA dual cache, SWA layers' rows come from their own ring (saved with
    its metadata under swa_* keys)."""
    used = np.flatnonzero(ctx.cells.used_mask()).astype(np.int32)
    data = {
        "magic": np.asarray(MAGIC),
        "pos": ctx.cells.pos[used],
        "seq_bits": ctx.cells.seq_bits[used],
        "tokens": np.asarray(tokens if tokens is not None else [], np.int32),
        "n_layers": np.asarray(ctx.cfg.n_layers),
    }
    used_swa = used
    if ctx.cells_swa is not None:
        used_swa = np.flatnonzero(ctx.cells_swa.used_mask()).astype(np.int32)
        data["swa_pos"] = ctx.cells_swa.pos[used_swa]
        data["swa_seq_bits"] = ctx.cells_swa.seq_bits[used_swa]
    for il in range(ctx.cfg.n_layers):
        src = used_swa if _is_swa_layer(ctx, il) else used
        data[f"k{il}"] = _rows_to_f32(ctx.kv.k[il], src)
        data[f"v{il}"] = _rows_to_f32(ctx.kv.v[il], src)
    np.savez_compressed(path, **data)


def state_load(ctx, path: str) -> list[int]:
    """Restore a full-context state; returns the saved token history."""
    import jax.numpy as jnp

    d = np.load(path, allow_pickle=False)
    if str(d["magic"]) != MAGIC:
        raise ValueError("not a llm_tpu state file")
    if int(d["n_layers"]) != ctx.cfg.n_layers:
        raise ValueError("layer count mismatch")
    n = len(d["pos"])
    ctx.clear()
    slots = ctx.cells.find_slots(n)
    if slots is None:
        raise ValueError(f"cache too small for saved state ({n} cells)")
    ctx.cells.pos[slots] = d["pos"]
    ctx.cells.seq_bits[slots] = _bits_planes(d["seq_bits"])
    idx = jnp.asarray(slots)
    idx_swa = idx
    if ctx.cells_swa is not None:
        if "swa_pos" not in d:
            raise ValueError("state file lacks SWA ring data for this model")
        ns = len(d["swa_pos"])
        slots_swa = ctx.cells_swa.find_slots(ns)
        if slots_swa is None:
            raise ValueError("SWA ring too small for saved state")
        ctx.cells_swa.pos[slots_swa] = d["swa_pos"]
        ctx.cells_swa.seq_bits[slots_swa] = _bits_planes(d["swa_seq_bits"])
        idx_swa = jnp.asarray(slots_swa)
    for il in range(ctx.cfg.n_layers):
        dst = idx_swa if _is_swa_layer(ctx, il) else idx
        ctx.kv.k[il] = _set_rows(ctx.kv.k[il], dst, d[f"k{il}"])
        ctx.kv.v[il] = _set_rows(ctx.kv.v[il], dst, d[f"v{il}"])
    return [int(t) for t in d["tokens"]]


def state_seq_save(ctx, seq_id: int, path: str, tokens: list[int] | None = None) -> None:
    """Per-sequence state (llama_state_seq_get_data analogue)."""
    mask = ctx.cells.seq_mask(seq_id)
    used = np.flatnonzero(mask).astype(np.int32)
    order = np.argsort(ctx.cells.pos[used], kind="stable")
    used = used[order]
    data = {
        "magic": np.asarray(MAGIC + "_seq"),
        "pos": ctx.cells.pos[used],
        "tokens": np.asarray(tokens if tokens is not None else [], np.int32),
        "n_layers": np.asarray(ctx.cfg.n_layers),
    }
    used_swa = used
    if ctx.cells_swa is not None:
        m2 = ctx.cells_swa.seq_mask(seq_id)
        used_swa = np.flatnonzero(m2).astype(np.int32)
        used_swa = used_swa[np.argsort(ctx.cells_swa.pos[used_swa],
                                       kind="stable")]
        data["swa_pos"] = ctx.cells_swa.pos[used_swa]
    for il in range(ctx.cfg.n_layers):
        src = used_swa if _is_swa_layer(ctx, il) else used
        data[f"k{il}"] = _rows_to_f32(ctx.kv.k[il], src)
        data[f"v{il}"] = _rows_to_f32(ctx.kv.v[il], src)
    np.savez_compressed(path, **data)


def state_seq_load(ctx, seq_id: int, path: str) -> list[int]:
    """Restore a sequence into `seq_id` (llama_state_seq_set_data)."""
    import jax.numpy as jnp

    d = np.load(path, allow_pickle=False)
    if str(d["magic"]) != MAGIC + "_seq":
        raise ValueError("not a llm_tpu per-seq state file")
    if int(d["n_layers"]) != ctx.cfg.n_layers:
        raise ValueError("layer count mismatch")
    ctx.seq_rm(seq_id)
    n = len(d["pos"])
    slots = ctx.cells.find_slots(n)
    if slots is None:
        raise ValueError("no KV space for sequence state")
    ctx.cells.pos[slots] = d["pos"]
    ctx.cells.seq_bits[slots] = seq_bit_row(seq_id)
    idx = jnp.asarray(slots)
    idx_swa = idx
    if ctx.cells_swa is not None:
        if "swa_pos" not in d:
            raise ValueError("state file lacks SWA ring data for this model")
        ns = len(d["swa_pos"])
        slots_swa = ctx.cells_swa.find_slots(ns)
        if slots_swa is None:
            raise ValueError("no SWA ring space for sequence state")
        ctx.cells_swa.pos[slots_swa] = d["swa_pos"]
        ctx.cells_swa.seq_bits[slots_swa] = seq_bit_row(seq_id)
        idx_swa = jnp.asarray(slots_swa)
    for il in range(ctx.cfg.n_layers):
        dst = idx_swa if _is_swa_layer(ctx, il) else idx
        ctx.kv.k[il] = _set_rows(ctx.kv.k[il], dst, d[f"k{il}"])
        ctx.kv.v[il] = _set_rows(ctx.kv.v[il], dst, d[f"v{il}"])
    return [int(t) for t in d["tokens"]]
