"""State save/load tests (model: reference examples/save-load-state +
server slot save/restore)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context
from llm_tpu.runtime.state import (
    state_load,
    state_save,
    state_seq_load,
    state_seq_save,
)

from test_model_vs_hf import _tiny_hf_llama


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    model = _tiny_hf_llama()
    path = str(tmp_path_factory.mktemp("st") / "m.gguf")
    convert_hf_llama(model, path)
    return path


def test_full_state_round_trip(tiny, tmp_path):
    prompt = [3, 1, 4, 1, 5]
    ctx = Context(GGUFReader(tiny), n_cells=32, dtype=jnp.float32)
    ctx.decode(Batch.text(prompt))
    want = ctx.get_logits().copy()
    sp = str(tmp_path / "state.npz")
    state_save(ctx, sp, tokens=prompt)

    ctx2 = Context(GGUFReader(tiny), n_cells=48, dtype=jnp.float32)
    toks = state_load(ctx2, sp)
    assert toks == prompt
    # continuing from the restored state must match continuing the original
    ctx.decode(Batch.one(7, pos=5))
    ctx2.decode(Batch.one(7, pos=5))
    np.testing.assert_allclose(ctx2.get_logits(), ctx.get_logits(), atol=1e-5)
    del want


def test_seq_state_round_trip(tiny, tmp_path):
    ctx = Context(GGUFReader(tiny), n_cells=32, dtype=jnp.float32)
    ctx.decode(Batch.text([2, 7, 1, 8], seq_id=0))
    ctx.decode(Batch.text([9, 9, 9], seq_id=1))
    sp = str(tmp_path / "seq.npz")
    state_seq_save(ctx, 1, sp, tokens=[9, 9, 9])

    ctx2 = Context(GGUFReader(tiny), n_cells=32, dtype=jnp.float32)
    toks = state_seq_load(ctx2, 2, sp)  # restore into a DIFFERENT seq id
    assert toks == [9, 9, 9]
    assert ctx2.cells.n_seq_cells(2) == 3

    ctx.decode(Batch.one(5, pos=3, seq_id=1))
    ctx2.decode(Batch.one(5, pos=3, seq_id=2))
    np.testing.assert_allclose(ctx2.get_logits(), ctx.get_logits(), atol=1e-5)


def test_state_too_big_rejected(tiny, tmp_path):
    ctx = Context(GGUFReader(tiny), n_cells=32, dtype=jnp.float32)
    ctx.decode(Batch.text(list(range(1, 20))))
    sp = str(tmp_path / "big.npz")
    state_save(ctx, sp)
    small = Context(GGUFReader(tiny), n_cells=8, dtype=jnp.float32)
    with pytest.raises(ValueError):
        state_load(small, sp)
