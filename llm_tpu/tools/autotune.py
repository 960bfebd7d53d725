"""llm-tpu-autotune: measure fused-matmul kernel tiles per weight shape.

Parity target: the reference's per-op perf harness (test-backend-ops perf
mode, /root/reference/tests/test-backend-ops.cpp:315-317) applied to tile
selection: benchmark qmm_pallas over the model's hot (K, N) shapes for a
grid of (tile_n, tile_k) candidates and write the winners as a JSON tile
table consumable via LLM_TPU_TILE_TABLE or qmatmul.set_tile_table().

Usage:
  python -m llm_tpu.tools.autotune --geometry llama3-8b -o tiles.json
  python -m llm_tpu.tools.autotune -m model.gguf -o tiles.json
"""

from __future__ import annotations

import json
import sys
import time

GEOMETRIES = {
    # (K, N) of the fused decode matmuls per geometry
    "llama3-8b": [
        (4096, 6144),    # qkv fused (4096 + 2*1024)
        (4096, 4096),    # attn output
        (4096, 28672),   # gate+up fused (2*14336)
        (14336, 4096),   # ffn down
        (4096, 128256),  # lm_head
    ],
    "qwen2-7b": [
        (3584, 4608), (3584, 3584), (3584, 37888), (18944, 3584),
        (3584, 152064),
    ],
}


def shapes_from_gguf(path):
    from ..gguf.reader import GGUFReader
    from ..models.loader import load_params
    from ..quant.qtensor import QTensor

    params, _ = load_params(GGUFReader(path))
    shapes = set()
    for layer in params["layers"]:
        for v in layer.values():
            if isinstance(v, QTensor) and v.kmajor:
                shapes.add((v.in_features, v.out_features))
    out = params.get("output")
    if isinstance(out, QTensor):
        shapes.add((out.in_features, out.out_features))
    return sorted(shapes)


def main(argv=None):
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.pallas_qmm import qmm_pallas

    ap = argparse.ArgumentParser(description="fused-matmul tile autotuner")
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("--geometry", default="llama3-8b",
                    choices=sorted(GEOMETRIES))
    ap.add_argument("-b", "--batch", type=int, default=8,
                    help="activation rows (8 = padded decode)")
    ap.add_argument("-o", "--output", default="tiles.json")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--tiles-n", default="4096,2048,1024,512")
    ap.add_argument("--tiles-k", default="4096,2048,1024,512")
    ap.add_argument("--shapes", default=None,
                    help="comma list of KxN pairs overriding geometry/model")
    ap.add_argument("--mins", action="store_true",
                    help="benchmark the fused-mins kernel (Q4_K decode path)")
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    if args.shapes:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]
    else:
        shapes = (shapes_from_gguf(args.model) if args.model
                  else GEOMETRIES[args.geometry])
    tiles_n = [int(t) for t in args.tiles_n.split(",")]
    tiles_k = [int(t) for t in args.tiles_k.split(",")]
    B = args.batch
    key = jax.random.PRNGKey(0)
    results = []
    from ..ops.qmatmul import _vmem_estimate

    # Timing rides an ON-DEVICE fori_loop with a data dependency between
    # iterations and ONE host fetch at the end — per-dispatch timing over a
    # tunneled TPU measures the link, not the kernel.
    # NOTE: planes must be jit ARGUMENTS — closing over them would embed
    # multi-MB literals in the compile request (the tunnel rejects/chokes).
    def _loop(x0, qs, sc, mn, tn, tk, reps):
        def body(i, x):
            y = qmm_pallas(x, qs, sc, mn, gs=32, zp=0, layout="p4",
                           tile_n=tn, tile_k=tk)
            # scalar feedback: keeps a data dependency between iterations
            # regardless of (K, N) vs x's shape
            return x + y.mean().astype(x.dtype) * 1e-6

        return jax.lax.fori_loop(0, reps, body, x0)

    loop_j = jax.jit(_loop, static_argnums=(4, 5, 6))

    def timed(qs, sc, mn, x, tn, tk, reps):
        jax.block_until_ready(loop_j(x, qs, sc, mn, tn, tk, reps))
        t0 = time.perf_counter()
        r = np.asarray(loop_j(x, qs, sc, mn, tn, tk, reps))
        dt = time.perf_counter() - t0
        assert np.isfinite(r).all()
        return dt / reps * 1e3

    for K, N in shapes:
        qs = jax.random.randint(key, (K // 2, N), 0, 256, jnp.int32).astype(jnp.uint8)
        sc = jax.random.uniform(key, (K // 32, N), jnp.float32).astype(jnp.bfloat16)
        mn = jax.random.uniform(key, (K // 32, N), jnp.float32).astype(jnp.bfloat16)
        x = jax.random.normal(key, (B, K), jnp.bfloat16)
        best = None
        for tn in tiles_n:
            for tk in tiles_k:
                if tk > K or tk % 256 != 0 or K % tk != 0:
                    continue
                if tn > N:
                    continue
                if _vmem_estimate(B, min(tn, N), tk, 32, "p4") > (13 << 20):
                    continue
                try:
                    ms = timed(qs, sc, mn if args.mins else None, x,
                               tn, tk, args.reps)
                except Exception as e:  # noqa: BLE001
                    print(f"  ({K},{N}) tn={tn} tk={tk}: {type(e).__name__}",
                          file=sys.stderr)
                    continue
                gbs = (qs.size + sc.size * 2) / 2**30 / (ms / 1e3)
                print(f"  ({K},{N}) tn={tn} tk={tk}: {ms:.3f} ms "
                      f"({gbs:.0f} GB/s)", file=sys.stderr, flush=True)
                if best is None or ms < best[0]:
                    best = (ms, tn, tk)
        if best:
            ms, tn, tk = best
            # fused-mins variant at the winning tile (Q4_K decode path)
            try:
                ms_m = timed(qs, sc, mn, x, tn, tk, args.reps)
                print(f"  ({K},{N}) fused-mins at best tile: {ms_m:.3f} ms",
                      file=sys.stderr)
            except Exception:  # noqa: BLE001
                pass
            print(f"({K},{N}) -> tile_n={tn} tile_k={tk} ({ms:.3f} ms)",
                  file=sys.stderr)
            results.append([K, N, tn, tk])

    with open(args.output, "w") as f:
        json.dump(results, f)
    print(f"wrote {args.output} ({len(results)} shapes); use "
          f"LLM_TPU_TILE_TABLE={args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
