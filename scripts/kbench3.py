"""Marginal-cost kernel microbenchmark.

Per-while-iteration overhead on the tunneled TPU is ~200-300us, swamping
single-kernel timings. This harness chains `inner` invocations of the same
kernel per loop iteration (x-feedback data dependency) and reports the
MARGINAL cost: (t_inner_hi - t_inner_lo) / (hi - lo) — pure steady-state
kernel time, overhead cancelled.

Modes:
  full — production qmm (pallas fused dequant-matmul)
  deq  — same DMA + full dequant VPU work, no MXU dot
  dma  — same block streaming, minimal VPU touch
  xla  — XLA dequant+dot fallback (LLM_TPU_QMM=xla) as control
"""

from __future__ import annotations

import argparse
import functools
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
from llm_tpu.ops.pallas_qmm import PACK_TK, _unpack_p4_chunk, _dequant_w  # noqa: E402

SHAPES = {
    "qkv": (4096, 6144),
    "out": (4096, 4096),
    "gu": (4096, 28672),
    "down": (14336, 4096),
    "head": (4096, 128256),
}
B = 8


def q4k_bytes(k, n, sdt=2):
    return k * n // 2 + 2 * (k // 32) * n * sdt


def _probe1_kernel(q_ref, o_ref, acc_ref):
    """Single-stream probe: qs plane only."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.sum(q_ref[0:32, :].astype(jnp.int32), axis=0,
                            keepdims=True).astype(jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_k"))
def probe1(qs, tile_n=2048, tile_k=2048):
    K2, N = qs.shape
    grid = (pl.cdiv(N, tile_n), K2 * 2 // tile_k)
    return pl.pallas_call(
        _probe1_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile_k // 2, tile_n), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, tile_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qs)


def _probe_kernel(x_ref, q_ref, s_ref, m_ref, o_ref, acc_ref, *, mode, gs,
                  cdtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if mode == "dma":
        qa = jnp.sum(q_ref[0:32, :].astype(jnp.int32), axis=0,
                     keepdims=True).astype(jnp.float32)
        sa = jnp.sum(s_ref[0:16, :].astype(jnp.float32), axis=0, keepdims=True)
        ma = jnp.sum(m_ref[0:16, :].astype(jnp.float32), axis=0, keepdims=True)
        acc_ref[...] += qa + sa + ma
    else:
        half = q_ref.shape[0]
        ptk = PACK_TK
        hh = ptk // 2
        for c in range(half // hh):
            packed = q_ref[c * hh:(c + 1) * hh, :].astype(jnp.int32)
            q = _unpack_p4_chunk(packed, ptk)
            gpc = ptk // gs
            w = _dequant_w(q, s_ref[c * gpc:(c + 1) * gpc, :], gs, 0, cdtype)
            acc_ref[...] += w[:1, :].astype(jnp.float32) + m_ref[:1, :].astype(
                jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("mode", "tile_n", "tile_k", "gs"))
def probe(x, qs, scales, mins, mode="dma", tile_n=2048, tile_k=2048, gs=32):
    K2, N = qs.shape
    K = K2 * 2
    grid = (pl.cdiv(N, tile_n), K // tile_k)
    kernel = functools.partial(_probe_kernel, mode=mode, gs=gs,
                               cdtype=jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, tile_k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // 2, tile_n), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // gs, tile_n), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k // gs, tile_n), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, tile_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, qs, scales, mins)


def marginal(make_fn, x0, reps, los=2, his=8, nbuf=1, wargs=()):
    """Marginal per-invocation seconds via inner-chain slope.

    make_fn(x, b, it, *wargs) uses weight-buffer b; with nbuf weight sets
    sized past VMEM (128MB on v5e), every inner step streams from HBM —
    XLA parks sub-VMEM closure constants on-chip, faking >roofline rates.
    Multi-GB weight stacks MUST come through wargs (jit arguments): closure
    constants are serialized into the tunnel compile request."""

    def loop(x, n, inner, *wargs):
        def body(it, x):
            y = x
            for i in range(inner):
                y = make_fn(y, i % nbuf, it * inner + i, *wargs)
            return (x0 + y * 1e-6).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)

    lj = jax.jit(loop, static_argnums=(1, 2))
    ts = {}
    for inner in (los, his):
        jax.block_until_ready(lj(x0, reps, inner, *wargs))
        t0 = time.perf_counter()
        jax.block_until_ready(lj(x0, reps, inner, *wargs))
        ts[inner] = (time.perf_counter() - t0) / reps
    return (ts[his] - ts[los]) / (his - los), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="gu,down,qkv,out,head")
    ap.add_argument("--modes", default="full,dma,deq")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--tiles", default=None,
                    help="override tn,tk e.g. 2048,2048 (or semicolon list "
                         "for stacked mode: 1024,4096;2048,2048)")
    ap.add_argument("--inner", default="2,8",
                    help="lo,hi inner-chain lengths for the marginal slope")
    ap.add_argument("--min-timed-s", type=float, default=1.0,
                    help="scale reps so each timed call runs at least this")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)

    for name in args.shapes.split(","):
        K, N = SHAPES[name]
        kq, kx = jax.random.split(jax.random.fold_in(key, hash(name) % 977))
        gbuf = q4k_bytes(K, N) / 1e9
        # enough weight sets that VMEM (128MB) can park only a small
        # fraction — XLA parks sub-VMEM constants on-chip, faking >roofline
        nbuf = max(3, int(0.75 / gbuf) + 1)
        qts = [device_synthetic_qtensor(jax.random.fold_in(kq, i), N, K,
                                        GGMLType.Q4_K, jnp.bfloat16)
               for i in range(nbuf)]
        qt = qts[0]
        x0 = jax.random.normal(kx, (B, K), jnp.bfloat16) * 0.01
        gb = gbuf
        reps = max(10, min(args.reps, int(0.05 / gb * 10)))
        print(f"{name} K={K} N={N} ({gb*1e3:.1f} MB) reps={reps} "
              f"nbuf={nbuf}:")

        for mode in args.modes.split(","):
            if mode == "stacked":
                # depth-stacked planes + traced layer index (the scan-path
                # kernel): one >VMEM buffer, un-parkable — honest HBM rates
                import math
                from llm_tpu.ops.pallas_qmm import qmm_pallas
                L = max(4, math.ceil(1.6 / gbuf))
                qs_st = jnp.stack([q.qs for q in
                                   (qts * ((L // len(qts)) + 1))[:L]])
                sc_st = jnp.stack([q.scales for q in
                                   (qts * ((L // len(qts)) + 1))[:L]])
                mn_st = jnp.stack([q.mins for q in
                                   (qts * ((L // len(qts)) + 1))[:L]])
                ilo, ihi = (int(v) for v in args.inner.split(","))
                if args.tiles:
                    combos = [tuple(int(v) for v in c.split(","))
                              for c in args.tiles.split(";")]
                else:
                    combos = []
                    for tk in (K, K // 2, K // 4, 2048):
                        if K % tk or tk % 256:
                            continue
                        for tn in (512, 1024, 2048, 4096):
                            # double-buffered qs + scales + mins VMEM bound
                            vm = 2 * (tk // 2 * tn + 2 * (tk // 32) * tn * 2)
                            if vm > 11 << 20 or (tn, tk) in combos:
                                continue
                            combos.append((tn, tk))
                for tn, tk in combos:
                    if tn > N or tk > K or K % tk or tk % 256:
                        continue
                    try:
                        def fn(x, b, it, qs_a, sc_a, mn_a, tn=tn, tk=tk):
                            lidx = jnp.mod(it, L).astype(jnp.int32)
                            y = qmm_pallas(
                                x, qs_a, sc_a, mn_a, gs=32, zp=0,
                                layout="p4", tile_n=tn, tile_k=tk,
                                compute_dtype=jnp.bfloat16, lidx=lidx)
                            return (y[:, :K] if N >= K else jnp.pad(
                                y, ((0, 0), (0, K - N)))).astype(jnp.bfloat16)
                        # reps sized so one timed call >= min-timed-s
                        # (tunnel RTT is ~25ms; short calls are noise)
                        est = ihi * gb / 600.0 + 0.003  # per-iter seconds
                        reps_s = max(reps, int(args.min_timed_s / est) + 1)
                        m, ts = marginal(fn, x0, reps_s, los=ilo, his=ihi,
                                         nbuf=1, wargs=(qs_st, sc_st, mn_st))
                        print(f"  stacked({tn},{tk}) marginal {m*1e6:8.1f} us "
                              f"{gb/m:7.1f} GB/s")
                    except Exception as e:  # noqa: BLE001
                        print(f"  stacked({tn},{tk}): FAIL {str(e)[:150]}")
                del qs_st, sc_st, mn_st
                continue
            if mode == "dmasweep":
                for tn, tk in ((1024, 2048), (2048, 2048), (1024, 4096),
                               (2048, 4096), (4096, 1024), (512, 4096),
                               (4096, 2048)):
                    if tn > N or tk > K or K % tk or N % tn:
                        continue
                    try:
                        def fn(x, b, it, tn=tn, tk=tk):
                            w = qts[b]
                            y = probe(x, w.qs, w.scales, w.mins,
                                      mode="dma", tile_n=tn, tile_k=tk)
                            return jnp.broadcast_to(y[:1, :1], (B, K)) * 1e-6
                        m, ts = marginal(fn, x0, reps, nbuf=nbuf)
                        print(f"  dma({tn},{tk})    marginal {m*1e6:8.1f} us "
                              f"{gb/m:7.1f} GB/s")
                    except Exception as e:  # noqa: BLE001
                        print(f"  dma({tn},{tk}): FAIL {str(e)[:120]}")
                continue
            if mode == "qsonly":
                qgb = qt.qs.size / 1e9
                for tn, tk in ((2048, 2048), (1024, 4096), (2048, 4096)):
                    if tn > N or tk > K or K % tk or N % tn:
                        continue
                    try:
                        def fn(x, b, it, tn=tn, tk=tk):
                            y = probe1(qts[b].qs, tile_n=tn, tile_k=tk)
                            return jnp.broadcast_to(y[:1, :1], (B, K)) * 1e-6
                        m, ts = marginal(fn, x0, reps, nbuf=nbuf)
                        print(f"  qsonly({tn},{tk}) marginal {m*1e6:8.1f} us "
                              f"{qgb/m:7.1f} GB/s")
                    except Exception as e:  # noqa: BLE001
                        print(f"  qsonly({tn},{tk}): FAIL {str(e)[:120]}")
                continue
            try:
                if mode == "full":
                    if args.tiles:
                        tn, tk = (int(v) for v in args.tiles.split(","))
                        qmatmul.set_tile_table({(K, N): (tn, tk)})
                    label = f"full{args.tiles or ''}"

                    def fn(x, b, it):
                        y = qmatmul.qmm(x, qts[b])
                        return y[:, :K] if N >= K else jnp.pad(
                            y, ((0, 0), (0, K - N)))
                elif mode == "xla":
                    label = "xla"

                    def fn(x, b, it):
                        qmatmul.set_backend("xla")
                        y = qmatmul.qmm(x, qts[b])
                        qmatmul.set_backend("auto")
                        return y[:, :K] if N >= K else jnp.pad(
                            y, ((0, 0), (0, K - N)))
                else:
                    tn, tk = ((int(v) for v in args.tiles.split(","))
                              if args.tiles else (2048, 2048))
                    tn = min(tn, N)
                    tk = min(tk, K)
                    label = f"{mode}({tn},{tk})"

                    def fn(x, b, it, tn=tn, tk=tk, mode=mode):
                        w = qts[b]
                        y = probe(x, w.qs, w.scales, w.mins, mode=mode,
                                  tile_n=tn, tile_k=tk)
                        return jnp.broadcast_to(y[:1, :1], (B, K)) * 1e-6

                m, ts = marginal(fn, x0, reps, nbuf=nbuf)
                print(f"  {label:18s} marginal {m*1e6:8.1f} us "
                      f"{gb/m:7.1f} GB/s   (iter2 {ts[2]*1e6:.0f} "
                      f"iter8 {ts[8]*1e6:.0f})")
            except Exception as e:  # noqa: BLE001
                import traceback
                print(f"  {mode}: FAIL {type(e).__name__}: "
                      f"{str(e)[:300]}")
                if "--trace" in sys.argv:
                    traceback.print_exc()


if __name__ == "__main__":
    main()
