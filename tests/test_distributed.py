"""Multi-process (multi-host) mesh validation over localhost DCN.

Parity target: the reference's only multi-node mechanism is the RPC
backend (ggml-rpc, SURVEY.md §2.5/§5.8); ours is jax.distributed + GSPMD
(tools/mesh_args.py --dist-* flags). This test runs TWO separate
processes, each owning 4 virtual CPU devices, joined through
jax.distributed.initialize into one 8-device mesh — cross-process
collectives ride the gRPC DCN transport, the same code path a real
multi-host TPU pod uses."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import argparse
import numpy as np

from llm_tpu.tools.mesh_args import add_mesh_args, mesh_from_args

ap = argparse.ArgumentParser()
add_mesh_args(ap)
args = ap.parse_args()
mesh = mesh_from_args(args)
assert mesh is not None

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

# tensor-parallel matmul: weight row-sharded over tp, output replicated
w = np.arange(8 * 16, dtype=np.float32).reshape(8, 16) * 0.01
x = np.ones((4, 8), np.float32)
ws = jax.make_array_from_callback(
    w.shape, NamedSharding(mesh, P("tp", None)), lambda idx: w[idx])
xs = jax.make_array_from_callback(
    x.shape, NamedSharding(mesh, P()), lambda idx: x[idx])
f = jax.jit(lambda a, b: a @ b,
            out_shardings=NamedSharding(mesh, P()))
y = f(xs, ws)
local = np.asarray(y.addressable_shards[0].data)
np.testing.assert_allclose(local, x @ w, rtol=1e-6)

# cross-process collective: psum over the tp axis spans both processes
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

v = np.arange(8, dtype=np.float32)
vs = jax.make_array_from_callback(
    v.shape, NamedSharding(mesh, P("tp")), lambda idx: v[idx])
g = jax.jit(shard_map(lambda a: jax.lax.psum(a, "tp"), mesh=mesh,
                      in_specs=P("tp"), out_specs=P()))
r = np.asarray(g(vs).addressable_shards[0].data)
np.testing.assert_allclose(r, [v.sum()], rtol=1e-6)

print("DIST_OK", jax.process_index(), flush=True)
"""

_WORKER_ENGINE = r"""
import argparse
import numpy as np

from llm_tpu.tools.mesh_args import add_mesh_args, mesh_from_args

ap = argparse.ArgumentParser()
add_mesh_args(ap)
args = ap.parse_args()
mesh = mesh_from_args(args)
assert mesh is not None

import jax
import jax.numpy as jnp

assert jax.process_count() == 2

# the 70B-geometry virtual-pod rehearsal in miniature: a synthetic sharded
# decode through the FULL engine (Context.decode) on a mesh that spans two
# processes over localhost DCN — identical host control flow on every
# controller (the multi-host SPMD contract), step inputs shipped as global
# replicated arrays (engine._in), logits gathered in-graph (_jit_step).
from llm_tpu.models.synthetic import make_synthetic_model
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

params, cfg = make_synthetic_model(
    n_embd=256, n_layers=2, n_heads=8, n_kv_heads=8, n_ff=512,
    vocab=256, qtype=None, dtype=jnp.float32, fuse=False, seed=11)
params = jax.tree.map(np.asarray, params)  # host leaves: collective put

ref = Context(None, n_cells=31, params_cfg=(params, cfg), dtype=jnp.float32)
tpc = Context(None, n_cells=31, params_cfg=(params, cfg), dtype=jnp.float32,
              mesh=mesh)
toks = list(range(8))
for c in (ref, tpc):
    assert c.decode(Batch.text(toks, seq_id=0)) == 0
np.testing.assert_allclose(tpc.get_logits(), ref.get_logits(),
                           atol=2e-4, rtol=2e-4)
for c in (ref, tpc):
    assert c.decode(Batch.one(3, pos=len(toks), seq_id=0)) == 0
np.testing.assert_allclose(tpc.get_logits(), ref.get_logits(),
                           atol=2e-4, rtol=2e-4)
print("DIST_ENGINE_OK", jax.process_index(), flush=True)
"""


_WORKER_ENGINE_70B = r"""
import argparse
import numpy as np

from llm_tpu.tools.mesh_args import add_mesh_args, mesh_from_args

ap = argparse.ArgumentParser()
add_mesh_args(ap)
args = ap.parse_args()
mesh = mesh_from_args(args)
assert mesh is not None

import jax
import jax.numpy as jnp

assert jax.process_count() == 2

# BASELINE config 5 rehearsal at REAL 70B layer width: one Llama-3-70B
# decoder layer (n_embd 8192, 64 q / 8 kv heads, n_ff 28672, GQA 8:1,
# fused Q4_K planes) sharded tp=8 across two processes over localhost DCN.
# Every sharded tensor has the exact serving shape of the 70B checkpoint;
# only the layer count is reduced so a single CPU can evaluate the oracle.
from llm_tpu.gguf.constants import GGMLType
from llm_tpu.models.synthetic import make_synthetic_model
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

params, cfg = make_synthetic_model(
    n_embd=8192, n_layers=1, n_heads=64, n_kv_heads=8, n_ff=28672,
    vocab=2048, qtype=GGMLType.Q4_K, dtype=jnp.float32, fuse=True, seed=5)

tpc = Context(None, n_cells=15, params_cfg=(params, cfg), dtype=jnp.float32,
              mesh=mesh)
assert tpc.cfg.fused_tp == 8, "fused 70B planes must shard"
toks = [3, 1, 4, 1]
assert tpc.decode(Batch.text(toks, seq_id=0)) == 0
got = tpc.get_logits()
assert tpc.decode(Batch.one(7, pos=len(toks), seq_id=0)) == 0
got2 = tpc.get_logits()

# the single-device oracle is process-local; evaluate it once (process 0)
if jax.process_index() == 0:
    ref = Context(None, n_cells=15, params_cfg=(params, cfg),
                  dtype=jnp.float32)
    assert ref.decode(Batch.text(toks, seq_id=0)) == 0
    np.testing.assert_allclose(got, ref.get_logits(), atol=2e-3, rtol=2e-3)
    assert ref.decode(Batch.one(7, pos=len(toks), seq_id=0)) == 0
    np.testing.assert_allclose(got2, ref.get_logits(), atol=2e-3, rtol=2e-3)
print("DIST_70B_OK", jax.process_index(), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, script, ok_marker, timeout=420):
    worker = tmp_path / "worker.py"
    worker.write_text(script)
    port = _free_port()
    env = dict(os.environ)
    env["LLM_TPU_PLATFORM"] = "cpu"  # in-process jax.config (env alone is
    # unreliable where a PJRT plugin sitecustomize is active)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), "--platform", "cpu",
             "--n-virtual-devices", "4", "-tp", "8",
             "--dist-coordinator", f"localhost:{port}",
             "--dist-num-processes", "2", "--dist-process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd="/root/repo"))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert ok_marker in out, (out, err[-1000:])


def test_two_process_mesh(tmp_path):
    _run_two_process(tmp_path, _WORKER, "DIST_OK")


def test_two_process_engine_decode(tmp_path):
    """Context.decode exact-match across a 2-process x 4-device DCN mesh
    (BASELINE config 5 rehearsal: the engine path a real multi-host pod
    runs, minus the hardware)."""
    _run_two_process(tmp_path, _WORKER_ENGINE, "DIST_ENGINE_OK")


def test_two_process_engine_decode_70b_geometry(tmp_path):
    """Context.decode at exact Llama-3-70B layer width (8192 embd, 64q/8kv,
    n_ff 28672, fused Q4_K) sharded tp=8 across a 2-process DCN mesh,
    exact-matched against the single-device oracle (BASELINE config 5)."""
    _run_two_process(tmp_path, _WORKER_ENGINE_70B, "DIST_70B_OK",
                     timeout=1500)
