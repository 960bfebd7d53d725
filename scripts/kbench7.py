"""Flash-decode layout experiment (round 5): [S, Hkv, D] vs [Hkv, S, D].

Round-4 profile said flash decode streams KV at 185 GB/s — but that
measurement rotated buffers with an in-loop dynamic slice, which COPIES
the 4MB cache every step (8MB extra traffic), so the kernel itself was
faster than reported. This harness indexes the stacked rotation buffer
INSIDE the kernel via scalar prefetch (zero-copy), isolating true kernel
time, and compares:

  v0   production-body decode kernel on [S, Hkv, D] (per-head sublane
       slices of an (sblk, Hkv, D) block, no head grid axis)
  v1   head-major kernel on [Hkv, S, D]: grid (Hkv, S/sblk), contiguous
       (sblk, D) per-head planes
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

sys.path.insert(0, "/root/repo")

from llm_tpu.ops.pallas_attn import (NEG, _kernel, expand_tables,  # noqa: E402
                                     flash_decode, rope_companion)
from llm_tpu.ops.rope import RopeParams, rope_angles  # noqa: E402

S, H, HKV, D = 1024, 32, 8, 128
T = 1
G = H // HKV
TG = T * G


@functools.partial(jax.jit, static_argnames=("scale", "sblk"))
def v0_stacked(q, q_rot, kst, vst, cos, sin, bias, scale, lidx, sblk=512):
    """Production decode kernel body over stacked [NB, S, Hkv, D] caches,
    buffer picked by scalar-prefetch lidx (zero-copy)."""
    kernel = functools.partial(_kernel, scale=scale, softcap=0.0,
                               s_real=S, sblk=sblk, has_alibi=False)
    base = kernel
    kernel = lambda s_ref, *refs: base(*refs)  # noqa: E731
    grid = (pl.cdiv(S, sblk),)
    qspec = pl.BlockSpec((T, H, D), lambda j, s: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, sblk, HKV, D), lambda j, s: (s[0], j, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((sblk, D), lambda j, s: (j, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((T, sblk), lambda j, s: (0, j),
                         memory_space=pltpu.VMEM)

    # squeeze the stacked dim inside a shim: production body expects
    # (sblk, Hkv, D) refs
    def shim(s_ref, q_ref, qr_ref, b_ref, k_ref, v_ref, c_ref, sn_ref,
             *refs):
        class _V:  # minimal ref view dropping the leading size-1 dim
            def __init__(self, r):
                self.r = r
                self.shape = r.shape[1:]

            def __getitem__(self, idx):
                return self.r[(0,) + (idx if isinstance(idx, tuple)
                                      else (idx,))]
        base(q_ref, qr_ref, b_ref, _V(k_ref), _V(v_ref), c_ref, sn_ref,
             *refs)

    out = pl.pallas_call(
        shim,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, qspec, bspec, kspec, kspec, tspec, tspec],
            out_specs=pl.BlockSpec((HKV, TG, D), lambda j, s: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((HKV, TG, D), jnp.float32),
                pltpu.VMEM((HKV, TG, 1), jnp.float32),
                pltpu.VMEM((HKV, TG, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, TG, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(jnp.asarray(lidx, jnp.int32).reshape(1), q, q_rot, bias, kst, vst,
      cos, sin)
    return out.reshape(HKV, T, G, D).transpose(1, 0, 2, 3).reshape(T, H, D)


def _hm_kernel(q_ref, qr_ref, b_ref, k_ref, v_ref, cos_ref, sin_ref,
               o_ref, acc_ref, m_ref, l_ref, *, scale, s_real, sblk):
    """Head-major decode: grid (Hkv, S/sblk); k/v blocks (1, sblk, D)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    _, tg, d = q_ref.shape  # (1, T*G, D)
    cos = cos_ref[...].astype(jnp.float32)
    sin = sin_ref[...].astype(jnp.float32)
    bias = jnp.maximum(b_ref[...], NEG)  # (T, sblk)
    si = j * sblk + jax.lax.broadcasted_iota(jnp.int32, bias.shape, 1)
    tail_ok = si < s_real
    row_i = j * sblk + jax.lax.broadcasted_iota(jnp.int32, (sblk, 1), 0)
    row_ok = row_i < s_real

    kh = k_ref[0].astype(jnp.float32)  # (sblk, D) contiguous plane
    vh = v_ref[0].astype(jnp.float32)
    qh = q_ref[0].astype(jnp.float32)  # (TG, D)
    qrh = qr_ref[0].astype(jnp.float32)
    s1 = jax.lax.dot_general(qh, kh * cos, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(qrh, kh * sin, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    scores = (s1 + s2) * scale  # (TG, sblk)
    scores = scores + jnp.broadcast_to(bias[:, None, :],
                                       (T, tg, scores.shape[-1])
                                       ).reshape(tg, -1)
    scores = jnp.where(jnp.broadcast_to(tail_ok[:, None, :],
                                        (T, tg, scores.shape[-1])
                                        ).reshape(tg, -1), scores, NEG)
    m_old = m_ref[...]
    l_old = l_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(scores - m_new)
    l_ref[...] = l_old * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new
    vs = jnp.where(row_ok, vh, 0.0)
    pv = jax.lax.dot_general(p, vs, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "sblk"))
def v1_stacked(q, q_rot, kst, vst, cos, sin, bias, scale, lidx, sblk=512):
    """Head-major decode over stacked [NB, Hkv, S, D] caches."""
    sblk = min(sblk, S)
    grid = (HKV, pl.cdiv(S, sblk))
    qx = q.reshape(T, HKV, G, D).transpose(1, 0, 2, 3).reshape(HKV, TG, D)
    qrx = q_rot.reshape(T, HKV, G, D).transpose(1, 0, 2, 3).reshape(
        HKV, TG, D)
    kernel = functools.partial(_hm_kernel, scale=scale, s_real=S, sblk=sblk)
    base = kernel
    kernel = lambda s_ref, *refs: base(*refs)  # noqa: E731
    qspec = pl.BlockSpec((1, TG, D), lambda h, j, s: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, sblk, D), lambda h, j, s: (s[0], h, j, 0),
                          memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((sblk, D), lambda h, j, s: (j, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((T, sblk), lambda h, j, s: (0, j),
                         memory_space=pltpu.VMEM)

    def shim(s_ref, q_ref, qr_ref, b_ref, k_ref, v_ref, c_ref, sn_ref,
             o_ref, *scratch):
        class _V:
            def __init__(self, r):
                self.r = r
                self.shape = r.shape[1:]

            def __getitem__(self, idx):
                return self.r[(0,) + (idx if isinstance(idx, tuple)
                                      else (idx,))]
        base(q_ref, qr_ref, b_ref, _V(k_ref), _V(v_ref), c_ref, sn_ref,
             o_ref, *scratch)

    out = pl.pallas_call(
        shim,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, qspec, bspec, kvspec, kvspec, tspec, tspec],
            out_specs=pl.BlockSpec((1, TG, D), lambda h, j, s: (h, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((TG, D), jnp.float32),
                pltpu.VMEM((TG, 1), jnp.float32),
                pltpu.VMEM((TG, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((HKV, TG, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(lidx, jnp.int32).reshape(1), qx, qrx, bias, kst, vst,
      cos, sin)
    return out.reshape(HKV, T, G, D).transpose(1, 0, 2, 3).reshape(T, H, D)


def marginal(make_fn, x0, reps, los=2, his=8, wargs=()):
    def loop(x, salt, n, inner, *wargs):
        x = (x + salt * 1e-9).astype(jnp.bfloat16)

        def body(it, x):
            y = x
            for i in range(inner):
                y = make_fn(y, it * inner + i, *wargs)
            return (x0 + y * 1e-6).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)

    lj = jax.jit(loop, static_argnums=(2, 3))
    ts = {}
    salt = 1.0
    for inner in (los, his):
        _ = np.asarray(lj(x0, jnp.float32(salt), reps, inner, *wargs))
        salt += 1.0
        t0 = time.perf_counter()
        r = lj(x0, jnp.float32(salt), reps, inner, *wargs)
        _ = np.asarray(r)
        salt += 1.0
        ts[inner] = (time.perf_counter() - t0) / reps
    return (ts[his] - ts[los]) / (his - los), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sblks", default="256,512,1024")
    ap.add_argument("--variants", default="v0,v1")
    ap.add_argument("--reps", type=int, default=300)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    NB = 20  # 20 * (4+4)MB = 160MB > VMEM
    kc_sm = jnp.asarray(jax.random.normal(
        ks[0], (NB, S, HKV, D), jnp.bfloat16) * 0.05)
    vc_sm = jnp.asarray(jax.random.normal(
        ks[1], (NB, S, HKV, D), jnp.bfloat16) * 0.05)
    kc_hm = jnp.asarray(np.ascontiguousarray(
        np.swapaxes(np.asarray(kc_sm), 1, 2)))
    vc_hm = jnp.asarray(np.ascontiguousarray(
        np.swapaxes(np.asarray(vc_sm), 1, 2)))
    q0 = jax.random.normal(ks[2], (T, H, D), jnp.bfloat16) * 0.1
    ch, sh = rope_angles(jnp.arange(S, dtype=jnp.int32),
                         RopeParams(n_dims=D, mode=0, freq_base=500000.0))
    cos_c, sin_c = expand_tables(ch, sh, 0, D)
    cos_c = cos_c.astype(jnp.bfloat16)
    sin_c = sin_c.astype(jnp.bfloat16)
    bias = jnp.zeros((T, S), jnp.float32)
    scale = 1.0 / float(np.sqrt(D))
    gb = (2 * S * HKV * D * 2) / 1e9  # k+v bf16 bytes per call

    qr0 = rope_companion(q0, 0, n_dims=D)
    y_ref = flash_decode(q0, qr0, kc_sm[0], vc_sm[0], cos_c, sin_c, bias,
                         scale)
    for name, fn, kc, vc in (("v0", v0_stacked, kc_sm, vc_sm),
                             ("v1", v1_stacked, kc_hm, vc_hm)):
        if name not in args.variants:
            continue
        y = fn(q0, qr0, kc, vc, cos_c, sin_c, bias, scale,
               jnp.zeros((), jnp.int32))
        rel = float(jnp.max(jnp.abs(y - y_ref))) / max(
            1e-6, float(jnp.max(jnp.abs(y_ref))))
        print(f"numerics {name}: max rel-to-peak {rel:.2e}", flush=True)

    for sblk in (int(v) for v in args.sblks.split(",")):
        for name, fn, kc, vc in (("v0", v0_stacked, kc_sm, vc_sm),
                                 ("v1", v1_stacked, kc_hm, vc_hm)):
            if name not in args.variants:
                continue

            def run(qx, it, kcs, vcs, fn=fn, sblk=sblk):
                lidx = jax.lax.rem(jnp.int32(it), NB)
                att = fn(qx, rope_companion(qx, 0, n_dims=D), kcs, vcs,
                         cos_c, sin_c, bias, scale, lidx, sblk=sblk)
                return (q0 + att.reshape(T, H, D).astype(jnp.bfloat16)
                        * 1e-3)

            try:
                m, _ = marginal(run, q0, args.reps, wargs=(kc, vc))
                print(f"{name} sblk={sblk:5d}: {m*1e6:7.1f} us  "
                      f"{gb/m:6.1f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} sblk={sblk}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
