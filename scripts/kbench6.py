"""Group-factored dequant-matmul experiment (round 5 kernel work).

Hypothesis from the round-4 per-op profile (qkv 443 / attn_out 417 /
gate_up 596 / ffn_down 507 GB/s of an 819 GB/s roofline): the p4 kernel is
VPU-bound on dequantization — per weight element it spends ~4 VPU ops
(nibble logic, int->f32 convert, scale multiply, f32->bf16 convert), which
at ~4 Tops/s caps the stream at ~1.0-1.2 T elem/s ≈ 550-650 GB/s of Q4_K.

The group-factored variant moves the scale multiply OFF the per-element
path: unpack nibbles straight to bf16 (2 VPU ops/elem), run ONE MXU dot
PER 32-GROUP against the raw integer weights, and apply the per-group
scales to the (B, TN) partials afterwards (VPU work / gs = 1/32 of the old
multiply). Numerically this is BETTER than the current kernel: q*s is no
longer rounded to bf16 before the dot; the integer dot is exact in bf16
and scales apply in f32.

Usage: python scripts/kbench6.py [--shapes qkv,out,gu,down,head] [--b 1,8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

sys.path.insert(0, "/root/repo")

from llm_tpu.gguf.constants import GGMLType  # noqa: E402
from llm_tpu.models.synthetic import device_synthetic_qtensor  # noqa: E402
from llm_tpu.ops import qmatmul  # noqa: E402

SHAPES = {
    "qkv": (4096, 6144),
    "out": (4096, 4096),
    "gu": (4096, 28672),
    "down": (14336, 4096),
    "head": (4096, 128256),
}
PACK_TK = 256


def q4k_bytes(k, n, sdt=2):
    return k * n // 2 + 2 * (k // 32) * n * sdt


def _gdot_kernel(x3_ref, xg_ref, q_ref, s_ref, m_ref, o_ref, acc_ref, *,
                 gs, cdtype):
    """x3: (TK//gs, B, gs) grouped activations; q: (TK//2, TN) packed
    nibbles; s/m: (TK//gs, TN). Per group: unpack-to-bf16, integer dot on
    MXU, scale the partial. Mins fold into one rank-G correction dot."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qv = q_ref[0] if q_ref.ndim == 3 else q_ref[...]
    sv = s_ref[0] if s_ref.ndim == 3 else s_ref[...]
    mv = m_ref[0] if m_ref.ndim == 3 else m_ref[...]
    half_total, tn = qv.shape
    tk = half_total * 2
    b = x3_ref.shape[1]
    n_chunks = tk // PACK_TK
    gpc = PACK_TK // gs  # groups per pack-chunk

    acc = None
    for c in range(n_chunks):
        packed = qv[c * (PACK_TK // 2):(c + 1) * (PACK_TK // 2),
                    :].astype(jnp.int32)
        lo = (packed & 0xF).astype(cdtype)
        hi = (packed >> 4).astype(cdtype)
        w = jnp.concatenate([lo, hi], axis=0)  # (PACK_TK, TN) raw 0..15
        s = sv[c * gpc:(c + 1) * gpc, :].astype(jnp.float32)
        for g in range(gpc):
            xg = x3_ref[c * gpc + g]  # (B, gs)
            wg = w[g * gs:(g + 1) * gs, :]  # (gs, TN)
            p = jax.lax.dot_general(
                xg.astype(cdtype), wg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, TN)
            p = p * s[g][None, :]
            acc = p if acc is None else acc + p
    corr = jax.lax.dot_general(
        xg_ref[...].astype(cdtype), mv.astype(cdtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += acc - corr

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("gs", "tile_n", "tile_k"))
def qmm_gdot(x, qs, scales, mins, gs=32, tile_n=2048, tile_k=2048,
             lidx=None):
    """lidx: [1] int32 layer index into stacked [L, ...] planes (the
    marginal-bench methodology: one >VMEM stacked buffer passed as a jit
    ARG, so nothing is re-serialized into tunnel compile requests and XLA
    cannot park the working set on-chip)."""
    stacked = lidx is not None
    B, K = x.shape
    N = qs.shape[-1]
    tile_n = min(tile_n, N)
    tile_k = min(tile_k, K)
    grid = (pl.cdiv(N, tile_n), K // tile_k)
    kernel = functools.partial(_gdot_kernel, gs=gs, cdtype=jnp.bfloat16)

    xf = x.astype(jnp.float32)
    x3 = jnp.swapaxes(xf.reshape(B, K // gs, gs), 0, 1)  # (K//gs, B, gs)
    xg = x3.sum(-1)  # (K//gs, B) group sums for the mins correction

    if stacked:
        base = kernel
        kernel = lambda s_ref, *refs: base(*refs)  # noqa: E731

        def wmap(im):
            return lambda i, j, s: (s[0],) + im(i, j)

        def wstat(im):
            return lambda i, j, s: im(i, j)

        def wblock(shape):
            return (1,) + shape
    else:
        def wmap(im):
            return im

        wstat = wmap

        def wblock(shape):
            return shape

    in_specs = [
        pl.BlockSpec((tile_k // gs, B, gs), wstat(lambda i, j: (j, 0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_k // gs, B), wstat(lambda i, j: (j, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wblock((tile_k // 2, tile_n)),
                     wmap(lambda i, j: (j, i)), memory_space=pltpu.VMEM),
        pl.BlockSpec(wblock((tile_k // gs, tile_n)),
                     wmap(lambda i, j: (j, i)), memory_space=pltpu.VMEM),
        pl.BlockSpec(wblock((tile_k // gs, tile_n)),
                     wmap(lambda i, j: (j, i)), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((B, tile_n), wstat(lambda i, j: (0, i)),
                            memory_space=pltpu.VMEM)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=qs.size + scales.size * 2 + mins.size * 2,
            transcendentals=0,
        ),
    )
    args = (x3.astype(jnp.bfloat16), xg.astype(jnp.bfloat16), qs, scales,
            mins)
    if stacked:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_spec,
                scratch_shapes=[pltpu.VMEM((B, tile_n), jnp.float32)],
            ),
            **common,
        )(jnp.asarray(lidx, jnp.int32).reshape(1), *args)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((B, tile_n), jnp.float32)],
        **common,
    )(*args)


import numpy as np  # noqa: E402


def marginal(make_fn, x0, reps, los=2, his=8, wargs=()):
    """Marginal per-invocation seconds via inner-chain slope. Weight stacks
    come through wargs (jit ARGS — closure constants are serialized into
    tunnel compile requests). The tunnel relay caches IDENTICAL execute
    requests and block_until_ready does not block (round-4 capture note),
    so every timed call gets a distinct salt input and syncs via a host
    fetch of the result."""
    def loop(x, salt, n, inner, *wargs):
        x = (x + salt * 1e-9).astype(jnp.bfloat16)

        def body(it, x):
            y = x
            for i in range(inner):
                y = make_fn(y, 0, it * inner + i, *wargs)
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
        _ = np.asarray(r)  # host fetch = real sync
        salt += 1.0
        ts[inner] = (time.perf_counter() - t0) / reps
    return (ts[his] - ts[los]) / (his - los), ts


def check_numerics(qt, B, K, N):
    """gdot vs reference dequant matmul on small data."""
    import numpy as np

    x = jax.random.normal(jax.random.PRNGKey(7), (B, K), jnp.bfloat16) * 0.1
    y_ref = qmatmul.qmm(x, qt)
    y_new = qmm_gdot(x, qt.qs, qt.scales, qt.mins)
    a, b = np.asarray(y_ref), np.asarray(y_new)
    denom = max(1e-6, float(np.abs(a).max()))
    rel = float(np.abs(a - b).max()) / denom
    print(f"  numerics: max rel-to-peak diff {rel:.3e}")
    return rel < 3e-2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="out,qkv,gu,down,head")
    ap.add_argument("--b", default="1,8")
    ap.add_argument("--tiles", default="2048,2048;1024,4096;2048,4096;4096,1024")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)

    import math

    from llm_tpu.ops.pallas_qmm import qmm_pallas

    for name in args.shapes.split(","):
        K, N = SHAPES[name]
        gb = q4k_bytes(K, N) / 1e9
        kq, kx = jax.random.split(jax.random.fold_in(key, hash(name) % 977))
        qt = device_synthetic_qtensor(kq, N, K, GGMLType.Q4_K, jnp.bfloat16)
        # stacked [L, ...] planes sized past VMEM, passed as jit ARGS
        L = max(4, math.ceil(0.4 / gb))
        qs_st = jnp.stack([qt.qs] * L)
        sc_st = jnp.stack([qt.scales] * L)
        mn_st = jnp.stack([qt.mins] * L)
        print(f"{name} K={K} N={N} ({gb*1e3:.1f} MB) L={L}:", flush=True)
        if not args.skip_check:
            if not check_numerics(qt, 8, K, N):
                print("  NUMERICS FAIL — skipping perf")
                continue
        # size reps so each timed call runs >= ~1.2s (tunnel RTT ~25ms and
        # single-CPU host jitter swamp shorter calls)
        est_iter = 8 * gb / 600.0 + 0.002  # seconds per outer rep at hi=8
        reps = max(10, int(1.2 / est_iter))
        for B in (int(v) for v in args.b.split(",")):
            x0 = jax.random.normal(kx, (B, K), jnp.bfloat16) * 0.01

            # classic kernel at the production-table tile for this shape
            import json as _json
            _tbl = {}
            _tf = os.environ.get("LLM_TPU_TILE_TABLE",
                                 "/root/repo/tiles_v5e_llama3_8b.json")
            if os.path.exists(_tf):
                _tbl = {(r[0], r[1]): (r[2], r[3])
                        for r in _json.load(open(_tf))}
            ctn, ctk = _tbl.get((K, N), (2048, 2048))

            def fn_cur(x, b, it, qs_a, sc_a, mn_a, ctn=ctn, ctk=ctk):
                lidx = jnp.mod(it, L).astype(jnp.int32)
                os.environ["LLM_TPU_GDOT"] = "0"
                y = qmm_pallas(x, qs_a, sc_a, mn_a, gs=32, zp=0,
                               layout="p4", tile_n=ctn, tile_k=ctk,
                               compute_dtype=jnp.bfloat16, lidx=lidx)
                os.environ["LLM_TPU_GDOT"] = "1"
                return (y[:, :K] if N >= K else
                        jnp.pad(y, ((0, 0), (0, K - N)))).astype(jnp.bfloat16)

            try:
                m, _ = marginal(fn_cur, x0, reps,
                                wargs=(qs_st, sc_st, mn_st))
                print(f"  B={B} cur({ctn},{ctk})   marginal {m*1e6:8.1f} us "
                      f"{gb/m:7.1f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  B={B} cur: FAIL {str(e)[:120]}", flush=True)

            for tile in args.tiles.split(";"):
                tn, tk = (int(v) for v in tile.split(","))
                if tk > K or K % min(tk, K):
                    continue

                def fn_new(x, b, it, qs_a, sc_a, mn_a, tn=tn, tk=tk):
                    lidx = jnp.mod(it, L).astype(jnp.int32)
                    y = qmm_gdot(x, qs_a, sc_a, mn_a,
                                 tile_n=tn, tile_k=tk, lidx=lidx)
                    return (y[:, :K] if N >= K else
                            jnp.pad(y, ((0, 0), (0, K - N)))).astype(
                                jnp.bfloat16)

                try:
                    m, _ = marginal(fn_new, x0, reps,
                                    wargs=(qs_st, sc_st, mn_st))
                    print(f"  B={B} gdot({tn},{tk})  marginal {m*1e6:8.1f} us "
                          f"{gb/m:7.1f} GB/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  B={B} gdot({tn},{tk}): FAIL {str(e)[:150]}",
                          flush=True)


if __name__ == "__main__":
    main()
