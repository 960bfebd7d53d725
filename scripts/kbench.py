"""Per-kernel decode-shape microbenchmark for the fused qmm path.

Times individual Pallas invocations at the Llama-3-8B decode shapes as
in-device fori_loop chains (docs/PERF.md measurement methodology) and
decomposes the cost into:

  dma    — stream the same blocks through the same grid, touch 8 sublanes
           (pure pipeline/DMA rate for this layout+tiling)
  deq    — dma + full nibble unpack + scale multiply, no MXU dot
  full   — the production qmm kernel (dequant + dot + mins correction)

Usage:  python scripts/kbench.py [--shapes qkv,out,gu,down,head] [--sweep]
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

from llm_tpu.gguf.constants import GGMLType  # noqa: E402
from llm_tpu.models.synthetic import device_synthetic_qtensor  # noqa: E402
from llm_tpu.ops import qmatmul  # noqa: E402
from llm_tpu.ops.pallas_qmm import PACK_TK, _unpack_p4_chunk, _dequant_w  # noqa: E402

# decode shapes (name, K, N) for Llama-3-8B
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


def _probe_kernel(x_ref, q_ref, s_ref, m_ref, o_ref, acc_ref, *, mode, gs, cdtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if mode == "dma":
        # touch one native sublane-tile of each input block; DMA still
        # moves the full block (pipeline copies follow the BlockSpec)
        acc_ref[...] += (
            jnp.sum(q_ref[0:32, :].astype(jnp.float32), axis=0, keepdims=True)
            + jnp.sum(s_ref[0:16, :].astype(jnp.float32), axis=0, keepdims=True)
            + jnp.sum(m_ref[0:16, :].astype(jnp.float32), axis=0, keepdims=True)
        )
    else:  # deq: full unpack + dequant, no dot
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
    kernel = functools.partial(
        _probe_kernel, mode=mode, gs=gs, cdtype=jnp.bfloat16)
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


def chain_time(fn, x0, reps, feed):
    """Time fn in an in-device fori chain with a data dependency."""

    def loop(x, n):
        def body(_, x):
            y = fn(x)
            return feed(x, y)
        return jax.lax.fori_loop(0, n, body, x)

    lj = jax.jit(loop, static_argnums=(1,))
    jax.block_until_ready(lj(x0, reps))  # compile + warm at the timed rep count
    t0 = time.perf_counter()
    jax.block_until_ready(lj(x0, reps))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="qkv,out,gu,down,head")
    ap.add_argument("--sweep", action="store_true",
                    help="tile sweep on each shape")
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--modes", default="full,dma,deq")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)

    for name in args.shapes.split(","):
        K, N = SHAPES[name]
        kq, kx = jax.random.split(jax.random.fold_in(key, hash(name) % 1000))
        qt = device_synthetic_qtensor(kq, N, K, GGMLType.Q4_K, jnp.bfloat16)
        x0 = (jax.random.normal(kx, (B, K), jnp.bfloat16) * 0.01)
        gb = q4k_bytes(K, N) / 1e9
        reps = max(20, min(args.reps, int(0.08 / gb * 50)))

        def feed(x, y):
            return x * (1.0 + y[:1, :1].astype(jnp.bfloat16) * 1e-30)

        results = {}
        modes = args.modes.split(",")
        if "full" in modes:
            tuned = qmatmul._TILE_TABLE.get((K, N))
            dt = chain_time(lambda x: qmatmul.qmm(x, qt), x0, reps, feed)
            results[f"full(tuned={tuned})"] = dt
        for mode in ("dma", "deq"):
            if mode not in modes:
                continue
            for tn, tk in ([(2048, 2048), (1024, 2048), (4096, 1024)]
                           if args.sweep else [(2048, 2048)]):
                tn_ = min(tn, N)
                tk_ = min(tk, K)
                if K % tk_ or tk_ % 256:
                    continue
                try:
                    dt = chain_time(
                        lambda x: probe(x, qt.qs, qt.scales, qt.mins,
                                        mode=mode, tile_n=tn_, tile_k=tk_),
                        x0, reps, feed)
                    results[f"{mode}({tn_},{tk_})"] = dt
                except Exception as e:  # noqa: BLE001
                    print(f"  {mode}({tn_},{tk_}): FAIL {type(e).__name__}",
                          file=sys.stderr)
        if args.sweep and "full" in modes:
            for tn in (512, 1024, 2048, 4096):
                for tk in (512, 1024, 2048, 4096):
                    if K % tk or tk % 256 or tn > N:
                        continue
                    qmatmul.set_tile_table({(K, N): (tn, tk)})
                    try:
                        dt = chain_time(lambda x: qmatmul.qmm(x, qt),
                                        x0, reps, feed)
                        results[f"full({tn},{tk})"] = dt
                    except Exception as e:  # noqa: BLE001
                        print(f"  full({tn},{tk}): FAIL {type(e).__name__}",
                              file=sys.stderr)
            qmatmul.set_tile_table({})

        print(f"{name} K={K} N={N} ({gb*1e3:.1f} MB/step):")
        for label, dt in sorted(results.items(), key=lambda kv: kv[1]):
            print(f"  {label:24s} {dt*1e6:8.1f} us  {gb/dt:7.1f} GB/s")


if __name__ == "__main__":
    main()
