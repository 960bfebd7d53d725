"""Batched throughput benchmark (llama-batched-bench parity,
/root/reference/tools/batched-bench): a (pp, tg, pl) grid — prompt length
x generation length x parallel sequences — reporting prompt/gen/total
throughput per combination in a markdown table."""

from __future__ import annotations

import itertools
import sys
import time


def run_cell(ctx, pp: int, tg: int, pl: int, vocab: int):
    from ..runtime.batch import Batch

    ctx.clear()
    t0 = time.perf_counter()
    b = Batch()
    for s in range(pl):
        for i in range(pp):
            b.add((i * 7 + s) % vocab, i, (s,), logits=(i == pp - 1))
    if ctx.decode(b) != 0:
        raise RuntimeError("prompt decode failed (cache too small?)")
    t_pp = time.perf_counter() - t0

    t0 = time.perf_counter()
    import numpy as np

    last = {s: int(np.argmax(ctx.get_logits((s + 1) * pp - 1))) for s in range(pl)}
    for j in range(tg):
        b = Batch()
        for s in range(pl):
            b.add(last[s], pp + j, (s,), logits=True)
        if ctx.decode(b) != 0:
            raise RuntimeError("gen decode failed")
        for k, s in enumerate(range(pl)):
            last[s] = int(np.argmax(ctx.get_logits(k)))
    t_tg = time.perf_counter() - t0

    n_pp, n_tg = pp * pl, tg * pl
    return {
        "pp": pp, "tg": tg, "pl": pl,
        "t_pp": t_pp, "s_pp": n_pp / t_pp if t_pp else 0.0,
        "t_tg": t_tg, "s_tg": n_tg / t_tg if t_tg else 0.0,
        "t": t_pp + t_tg, "s": (n_pp + n_tg) / (t_pp + t_tg),
    }


def main(argv=None):
    import argparse

    import jax.numpy as jnp

    from ..gguf.reader import GGUFReader
    from ..runtime.engine import Context
    from .args import env_default as ed, required_unless_env

    ap = argparse.ArgumentParser(description="batched throughput bench grid")
    ap.add_argument("-m", "--model", default=ed("model", None),
                    required=required_unless_env("model"))
    ap.add_argument("-npp", type=lambda s: [int(x) for x in s.split(",")],
                    default=[128, 256], help="prompt lengths")
    ap.add_argument("-ntg", type=lambda s: [int(x) for x in s.split(",")],
                    default=[32], help="gen lengths")
    ap.add_argument("-npl", type=lambda s: [int(x) for x in s.split(",")],
                    default=[1, 2, 4], help="parallel seq counts")
    ap.add_argument("-c", "--ctx-size", type=int, default=ed("ctx-size", 4096))
    ap.add_argument("--f32", action="store_true")
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)

    reader = GGUFReader(args.model)
    ctx = Context(reader, n_cells=args.ctx_size,
                  dtype=jnp.float32 if args.f32 else jnp.bfloat16)

    print("| PP | TG | PL | T_PP s | S_PP t/s | T_TG s | S_TG t/s | T s | S t/s |")
    print("|----|----|----|--------|----------|--------|----------|-----|-------|")
    for pp, tg, pl in itertools.product(args.npp, args.ntg, args.npl):
        if (pp + tg) * pl > args.ctx_size:
            print(f"| {pp} | {tg} | {pl} | skip: exceeds ctx |", file=sys.stderr)
            continue
        r = run_cell(ctx, pp, tg, pl, ctx.cfg.vocab_size)
        print(f"| {r['pp']} | {r['tg']} | {r['pl']} | {r['t_pp']:.3f} | "
              f"{r['s_pp']:.2f} | {r['t_tg']:.3f} | {r['s_tg']:.2f} | "
              f"{r['t']:.3f} | {r['s']:.2f} |", flush=True)


if __name__ == "__main__":
    main()
