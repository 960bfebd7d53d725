"""Native C unpacker vs the numpy path: planes must match bit-exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu import native
from llm_tpu.gguf.constants import GGMLType
from llm_tpu.quant import codecs
from llm_tpu.quant.qtensor import dequantize_qtensor, qtensor_from_gguf


@pytest.mark.skipif(not native.available(), reason="no C compiler")
@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0,
                                   GGMLType.Q6_K, GGMLType.Q4_0],
                         ids=lambda t: t.name)
def test_native_matches_numpy(qtype):
    rng = np.random.default_rng(0)
    K, N = 512, 16
    w = rng.normal(size=(N, K)).astype(np.float32)
    raw = codecs.quantize(w, qtype)

    res = native.unpack_planes(int(qtype), raw, N, K)
    assert res is not None
    qn, sn, mn, gs, layout, zp = res

    import os
    os.environ["LLM_TPU_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        qt = qtensor_from_gguf(raw, qtype, (K, N))
    finally:
        del os.environ["LLM_TPU_NO_NATIVE"]
        native._tried = False
        native._lib = None

    assert qt.layout == layout and qt.group_size == gs and qt.zp == zp
    np.testing.assert_array_equal(np.asarray(qt.qs), qn)
    np.testing.assert_allclose(np.asarray(qt.scales), sn, rtol=0, atol=0)
    if mn is not None:
        np.testing.assert_allclose(np.asarray(qt.mins), mn, rtol=0, atol=0)


@pytest.mark.skipif(not native.available(), reason="no C compiler")
def test_native_qtensor_dequant_correct():
    """End-to-end: native-built QTensor dequantizes to the codec reference."""
    rng = np.random.default_rng(1)
    K, N = 512, 8
    w = rng.normal(size=(N, K)).astype(np.float32)
    raw = codecs.quantize(w, GGMLType.Q4_K)
    qt = qtensor_from_gguf(raw, GGMLType.Q4_K, (K, N))
    want = codecs.dequantize(raw, GGMLType.Q4_K, K).reshape(N, K)
    np.testing.assert_allclose(dequantize_qtensor(qt), want, rtol=0, atol=1e-6)


def test_c_abi_end_to_end(tmp_path):
    """The C ABI (native/llm_tpu.h + llm_tpu_c.c, embedding CPython) drives
    a real session: load GGUF, tokenize, decode, greedy-sample — and the
    tokens match the Python engine exactly (llama.h bindings parity)."""
    import shutil
    import subprocess
    import sys

    sys.path.insert(0, "tests")
    from llm_tpu.convert.hf_llama import convert_hf_llama
    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context
    from test_model_vs_hf import _tiny_hf_llama
    from test_tools import _test_vocab

    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler")
    pycfg = shutil.which("python3-config")
    if pycfg is None:
        pytest.skip("no python3-config")

    path = str(tmp_path / "m.gguf")
    convert_hf_llama(_tiny_hf_llama(hidden=64, layers=2, vocab=97), path,
                     vocab=_test_vocab(97))

    # python-side greedy reference
    import numpy as np

    ctx = Context(GGUFReader(path), n_cells=64, dtype=jnp.float32)
    tokens = [3, 1, 4, 1, 5]
    assert ctx.decode(Batch.text(tokens, seq_id=0)) == 0
    want = []
    pos = len(tokens)
    for _ in range(8):
        t = int(np.argmax(ctx.get_logits()))
        want.append(t)
        assert ctx.decode(Batch.one(t, pos=pos, seq_id=0)) == 0
        pos += 1

    import os

    nd = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "llm_tpu", "native")
    so = str(tmp_path / "libllm_tpu.so")
    inc = subprocess.run([pycfg, "--includes"], capture_output=True,
                         text=True).stdout.split()
    ld = subprocess.run([pycfg, "--embed", "--ldflags"], capture_output=True,
                        text=True).stdout.split()
    r = subprocess.run([cc, "-O2", "-shared", "-fPIC",
                        os.path.join(nd, "llm_tpu_c.c"), "-o", so,
                        f"-I{nd}"] + inc + ld, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    driver = tmp_path / "drv.c"
    driver.write_text("""
#include <stdio.h>
#include "llm_tpu.h"
int main(int argc, char **argv) {
    if (llm_tpu_init(NULL) != 0) return 2;
    llm_tpu_context *ctx = llm_tpu_context_new(argv[1], 64);
    if (!ctx) return 3;
    int32_t toks[5] = {3, 1, 4, 1, 5};
    int32_t pos[8];
    for (int i = 0; i < 5; i++) pos[i] = i;
    if (llm_tpu_decode(ctx, toks, 5, pos, 0) != 0) return 4;
    int p = 5;
    for (int s = 0; s < 4; s++) {
        int32_t t = llm_tpu_sample_greedy(ctx);
        printf("%d\\n", t);
        int32_t pp = p++;
        if (llm_tpu_decode(ctx, &t, 1, &pp, 0) != 0) return 5;
    }
    /* remaining 4 via the on-device generation loop */
    int32_t first = llm_tpu_sample_greedy(ctx);
    printf("%d\\n", first);
    int32_t gen[8];
    int32_t ng = llm_tpu_generate(ctx, first, 3, 0, gen, 8);
    if (ng < 0) return 6;
    for (int i = 0; i < ng; i++) printf("%d\\n", gen[i]);
    llm_tpu_context_free(ctx);
    return 0;
}
""")
    exe = str(tmp_path / "drv")
    r = subprocess.run([cc, "-O2", str(driver), "-o", exe, f"-I{nd}",
                        f"-L{tmp_path}", "-lllm_tpu",
                        f"-Wl,-rpath,{tmp_path}"] + inc + ld,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(nd.rstrip("/")).rsplit("/llm_tpu", 1)[0]
    env["JAX_PLATFORMS"] = "cpu"
    env["LLM_TPU_PLATFORM"] = "cpu"  # in-process jax.config (env alone is unreliable)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([exe, path], capture_output=True, text=True,
                         env=env, timeout=300)
    assert out.returncode == 0, (out.stdout, out.stderr[-2000:])
    got = [int(x) for x in out.stdout.split()]
    assert got == want
