"""Server-path throughput benchmark: multi-slot CONTINUOUS BATCHING
through the real HTTP server (the llama-batched-bench grid driven at the
llama-server layer; reference tools/batched-bench README table +
server.cpp slot scheduling).

Spawns `llm_tpu.server.app` as a subprocess with -np slots, then for each
grid cell fires `pl` concurrent clients, each streaming a pp-token prompt
and tg generated tokens, and reports:

  S_PP t/s   aggregate prompt throughput
  S_TG t/s   aggregate generation throughput
  TTFT p50/p95 (ms)  time to first streamed token per client

Usage:
  python -m llm_tpu.tools.server_bench -m model.gguf \
      -pps 32,128 -tgs 16,32 -pls 1,2,4 [--port 8081] [--device cpu]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import threading
import time
import urllib.request


def _wait_health(port: int, timeout: float = 1200.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=5) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(1.0)
    raise RuntimeError("server did not become healthy")


def _client(port: int, prompt_ids, tg: int, out: dict, idx: int):
    body = json.dumps({
        "prompt": prompt_ids, "n_predict": tg, "stream": True,
        "temperature": 0.0, "cache_prompt": False,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/completion", data=body,
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    first = None
    n_tok = 0
    with urllib.request.urlopen(req, timeout=600) as r:
        for line in r:
            if not line.startswith(b"data: "):
                continue
            if first is None:
                first = time.perf_counter()
            n_tok += 1
    out[idx] = {"ttft": (first or time.perf_counter()) - t0,
                "done": time.perf_counter() - t0, "n": n_tok}


def run_grid(port: int, vocab: int, pps, tgs, pls, out=sys.stdout):
    rows = []
    print("| PP | TG | PL | S_PP t/s | S_TG t/s | TTFT p50 ms | "
          "TTFT p95 ms | total s |", file=out)
    print("|---|---|---|---|---|---|---|---|", file=out)
    for pp, tg, pl in ((p, t, l) for p in pps for t in tgs for l in pls):
        prompts = [[(i * 7 + s) % vocab for i in range(pp)]
                   for s in range(pl)]
        res: dict = {}
        t0 = time.perf_counter()
        th = [threading.Thread(target=_client,
                               args=(port, prompts[s], tg, res, s))
              for s in range(pl)]
        for t in th:
            t.start()
        for t in th:
            t.join()
        wall = time.perf_counter() - t0
        ttfts = sorted(r["ttft"] for r in res.values())
        n_gen = sum(r["n"] for r in res.values())
        s_pp = pp * pl / max(ttfts[-1], 1e-9)  # prompts all done by last TTFT
        s_tg = n_gen / max(wall, 1e-9)
        p50 = statistics.median(ttfts) * 1e3
        p95 = ttfts[min(len(ttfts) - 1, int(0.95 * len(ttfts)))] * 1e3
        row = (pp, tg, pl, s_pp, s_tg, p50, p95, wall)
        rows.append(row)
        print("| %d | %d | %d | %.2f | %.2f | %.1f | %.1f | %.2f |" % row,
              file=out, flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("-c", "--ctx-size", type=int, default=1024)
    ap.add_argument("-np", "--n-parallel", type=int, default=4)
    ap.add_argument("-pps", default="32,128")
    ap.add_argument("-tgs", default="16")
    ap.add_argument("-pls", default="1,2,4")
    ap.add_argument("--vocab", type=int, default=97)
    ap.add_argument("--device", default=None)
    ap.add_argument("--no-prewarm", action="store_true",
                    help="skip server-side bucket prewarm (measures "
                         "cold-compile stalls instead of steady state)")
    args = ap.parse_args(argv)

    cmd = [sys.executable, "-m", "llm_tpu.server.app", "-m", args.model,
           "--port", str(args.port), "-np", str(args.n_parallel),
           "-c", str(args.ctx_size)]
    if not args.no_prewarm:
        cmd.append("--prewarm")
    if args.device:
        cmd += ["--device", args.device]
    srv = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
    try:
        _wait_health(args.port)
        pps = [int(x) for x in args.pps.split(",")]
        tgs = [int(x) for x in args.tgs.split(",")]
        pls = [int(x) for x in args.pls.split(",")]
        run_grid(args.port, args.vocab, pps, tgs, pls)
    finally:
        srv.terminate()
        srv.wait(timeout=30)


if __name__ == "__main__":
    main()
