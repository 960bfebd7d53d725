"""llm-tpu-bench: throughput benchmark grid.

Parity target: tools/llama-bench (llama-bench README): a test matrix over
prompt-processing (ppN) and token-generation (tgN) sizes with optional
pre-existing KV depth (@dN), warmup + repetitions, mean ± stddev, and
md/json/csv/sql output.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

from ..gguf.reader import GGUFReader
from ..runtime.batch import Batch
from ..runtime.engine import Context


def run_pp(ctx: Context, n_prompt: int, depth: int = 0, seq_id: int = 0) -> float:
    """Prompt-processing tokens/sec for one run."""
    ctx.seq_rm(seq_id)
    if depth:
        ctx.decode(Batch.text(list(np.arange(depth) % 100 + 1), seq_id=seq_id))
    toks = list(np.arange(n_prompt) % 100 + 1)
    t0 = time.perf_counter()
    rc = ctx.decode(Batch.text(toks, seq_id=seq_id, pos_start=depth))
    dt = time.perf_counter() - t0
    if rc != 0:
        raise RuntimeError(f"pp decode rc={rc}")
    return n_prompt / dt


def run_tg(ctx: Context, n_gen: int, depth: int = 0, seq_id: int = 0) -> float:
    """Token-generation tokens/sec for one run (greedy feedback)."""
    ctx.seq_rm(seq_id)
    pos = 0
    if depth:
        ctx.decode(Batch.text(list(np.arange(depth) % 100 + 1), seq_id=seq_id))
        pos = depth
    else:
        ctx.decode(Batch.one(1, pos=0, seq_id=seq_id))
        pos = 1
    tok = int(np.argmax(ctx.get_logits()))
    # warm the decode program
    ctx.decode(Batch.one(tok, pos=pos, seq_id=seq_id))
    pos += 1
    t0 = time.perf_counter()
    for _ in range(n_gen):
        tok = int(np.argmax(ctx.get_logits()))
        ctx.decode(Batch.one(tok, pos=pos, seq_id=seq_id))
        pos += 1
    dt = time.perf_counter() - t0
    return n_gen / dt


def bench_matrix(ctx, tests, reps=3, progress=None):
    rows = []
    for kind, n, depth in tests:
        fn = run_pp if kind == "pp" else run_tg
        fn(ctx, min(n, 8) if kind == "pp" else 2, depth)  # warmup/compile
        vals = [fn(ctx, n, depth) for _ in range(reps)]
        row = {
            "test": f"{kind}{n}" + (f"@d{depth}" if depth else ""),
            "t/s": round(statistics.mean(vals), 2),
            "stddev": round(statistics.stdev(vals) if len(vals) > 1 else 0.0, 2),
        }
        rows.append(row)
        if progress:
            progress(row)
    return rows


def format_md(rows, model_desc: str) -> str:
    out = [f"| model | test | t/s |", "|---|---|---|"]
    for r in rows:
        out.append(f"| {model_desc} | {r['test']} | {r['t/s']} ± {r['stddev']} |")
    return "\n".join(out)


def main(argv=None):
    import argparse

    import jax.numpy as jnp

    ap = argparse.ArgumentParser(description="llm-tpu benchmark")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--n-prompt", type=int, default=512)
    ap.add_argument("-n", "--n-gen", type=int, default=128)
    ap.add_argument("-d", "--depth", type=int, default=0)
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("-o", "--output", choices=("md", "json", "csv", "sql"),
                    default="md")
    from .mesh_args import add_mesh_args, mesh_from_args

    add_mesh_args(ap)
    from .args import add_device, apply_device

    add_device(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)
    mesh = mesh_from_args(args)

    reader = GGUFReader(args.model)
    ctx = Context(reader, n_cells=args.ctx_size, dtype=jnp.bfloat16, mesh=mesh)
    desc = f"{ctx.cfg.arch} {ctx.cfg.n_layers}L"

    tests = []
    if args.n_prompt:
        tests.append(("pp", args.n_prompt, args.depth))
    if args.n_gen:
        tests.append(("tg", args.n_gen, args.depth))

    rows = bench_matrix(ctx, tests, args.reps,
                        progress=lambda r: print(r, file=sys.stderr))
    if args.output == "json":
        print(json.dumps(rows, indent=2))
    elif args.output == "csv":
        print("test,t/s,stddev")
        for r in rows:
            print(f"{r['test']},{r['t/s']},{r['stddev']}")
    elif args.output == "sql":
        # llama-bench -o sql parity: CREATE TABLE + one INSERT per row
        # (tools/llama-bench sql_printer), so results pipe into sqlite3
        # for cross-run comparison
        print("CREATE TABLE IF NOT EXISTS test (\n"
              "  model TEXT,\n  test TEXT,\n  avg_ts REAL,\n"
              "  stddev_ts REAL\n);\n")
        for r in rows:
            print("INSERT INTO test (model, test, avg_ts, stddev_ts) "
                  f"VALUES ('{desc}', '{r['test']}', '{r['t/s']}', "
                  f"'{r['stddev']}');")
    else:
        print(format_md(rows, desc))


if __name__ == "__main__":
    main()
