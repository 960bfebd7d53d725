"""Server integration tests (model: reference tools/server/tests pytest
suite): continuous batching, OpenAI endpoints, SSE streaming, prefix cache."""

import asyncio
import json

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from aiohttp.test_utils import TestClient, TestServer

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.engine import Context
from llm_tpu.samplers import SamplingParams
from llm_tpu.server.app import ServerApp
from llm_tpu.server.core import GenTask, InferenceServer
from llm_tpu.tokenizers import tokenizer_from_gguf

from test_model_vs_hf import _tiny_hf_llama
from test_tools import _test_vocab


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    model = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    path = str(tmp_path_factory.mktemp("srv") / "m.gguf")
    convert_hf_llama(model, path, vocab=_test_vocab(97))
    reader = GGUFReader(path)
    tok = tokenizer_from_gguf(reader)
    ctx = Context(reader, n_cells=256, n_ubatch=32, dtype=jnp.float32)
    eng = InferenceServer(ctx, tok, n_slots=3, n_batch=32)
    eng.start()
    yield eng
    eng.stop()


def _drain(task):
    pieces = []
    while True:
        ev = task.events.get(timeout=180)
        if ev.get("done"):
            return pieces, ev
        pieces.append(ev)


def test_core_single_task(engine):
    toks = engine.tok.encode("hello world", add_special=True)
    task = engine.submit(GenTask(prompt_tokens=toks,
                                 params=SamplingParams(temp=0.0), n_predict=6))
    pieces, meta = _drain(task)
    assert meta["stop_reason"] in ("length", "eos")
    assert meta["n_prompt"] == len(toks)
    assert len(pieces) <= 6


def test_core_parallel_tasks_match_serial(engine):
    """Three tasks batched continuously must each produce the same greedy
    continuation as when run alone."""
    prompts = ["abc def", "hello world, this", "x y z 1 2 3"]
    serial = []
    for p in prompts:
        toks = engine.tok.encode(p, add_special=True)
        t = engine.submit(GenTask(prompt_tokens=toks,
                                  params=SamplingParams(temp=0.0), n_predict=5))
        pieces, _ = _drain(t)
        serial.append([e["token"] for e in pieces])

    tasks = []
    for p in prompts:
        toks = engine.tok.encode(p, add_special=True)
        tasks.append(engine.submit(GenTask(prompt_tokens=toks,
                                           params=SamplingParams(temp=0.0),
                                           n_predict=5)))
    parallel = []
    for t in tasks:
        pieces, _ = _drain(t)
        parallel.append([e["token"] for e in pieces])
    assert parallel == serial


def test_core_batch_fast_path_multislot(engine):
    """Concurrent device-eligible SAMPLED tasks (llama.cpp-default params)
    advance through the batched device loop — one dispatch per chunk for
    all generating slots (server.cpp:2961 analogue without the per-token
    host trip)."""
    base = engine.metrics.get("fast_chunks_total", 0)
    tasks = []
    for i, p in enumerate(["abc def", "hello world", "x y z"]):
        toks = engine.tok.encode(p, add_special=True)
        tasks.append(engine.submit(GenTask(
            prompt_tokens=toks,
            params=SamplingParams(temp=0.8, top_k=40, top_p=0.95,
                                  min_p=0.05, seed=100 + i),
            n_predict=12)))
    for t in tasks:
        pieces, meta = _drain(t)
        assert meta["stop_reason"] in ("length", "eos")
        assert len(pieces) <= 12
    assert engine.metrics.get("fast_chunks_total", 0) > base


def test_core_stop_string_on_fast_path(engine):
    """Stop strings are honored on the device-chunk fast path: the chunk is
    truncated at the match and overshoot cells are rolled back."""
    toks = engine.tok.encode("abc def", add_special=True)
    t = engine.submit(GenTask(prompt_tokens=toks,
                              params=SamplingParams(temp=0.0), n_predict=8))
    pieces, _ = _drain(t)
    texts = [e["text"] for e in pieces]
    stop = texts[3] if texts[3].strip() else "".join(texts[2:5])
    t2 = engine.submit(GenTask(prompt_tokens=toks,
                               params=SamplingParams(temp=0.0), n_predict=8,
                               stop=[stop]))
    p2, meta = _drain(t2)
    assert meta["stop_reason"] == "stop_string"
    assert len(p2) <= len(pieces)


def test_core_prefix_cache_reuse(engine):
    toks = engine.tok.encode("the quick brown fox jumps", add_special=True)
    t1 = engine.submit(GenTask(prompt_tokens=toks,
                               params=SamplingParams(temp=0.0), n_predict=3))
    out1, _ = _drain(t1)
    before = engine.metrics["tokens_prompt_total"]
    # same prompt again: only the final token should be re-processed
    t2 = engine.submit(GenTask(prompt_tokens=toks,
                               params=SamplingParams(temp=0.0), n_predict=3))
    out2, _ = _drain(t2)
    reprocessed = engine.metrics["tokens_prompt_total"] - before
    assert [e["token"] for e in out1] == [e["token"] for e in out2]
    assert reprocessed <= 2


@pytest.fixture()
def client(engine, event_loop=None):
    app = ServerApp(engine, model_name="tiny").build()
    return app


async def _with_client(app, fn):
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    try:
        return await fn(client)
    finally:
        await client.close()


def test_http_endpoints(client):
    async def run(c):
        r = await c.get("/health")
        assert (await r.json())["status"] == "ok"

        r = await c.get("/v1/models")
        assert (await r.json())["data"][0]["id"] == "tiny"

        r = await c.post("/tokenize", json={"content": "hello"})
        toks = (await r.json())["tokens"]
        assert toks
        r = await c.post("/detokenize", json={"tokens": toks})
        assert "hello" in (await r.json())["content"]

        r = await c.post("/v1/completions", json={
            "prompt": "hello world", "max_tokens": 4, "temperature": 0,
        })
        d = await r.json()
        assert d["object"] == "text_completion"
        assert d["usage"]["completion_tokens"] <= 4
        assert isinstance(d["choices"][0]["text"], str)

        r = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0,
        })
        d = await r.json()
        assert d["choices"][0]["message"]["role"] == "assistant"

        r = await c.get("/metrics")
        text = await r.text()
        assert "llm_tpu_requests_total" in text

        r = await c.get("/slots")
        assert len(await r.json()) == 3
        return True

    assert asyncio.run(_with_client(client, run))


def test_http_streaming(client):
    async def run(c):
        r = await c.post("/v1/completions", json={
            "prompt": "abc", "max_tokens": 4, "temperature": 0, "stream": True,
        })
        assert r.headers["Content-Type"].startswith("text/event-stream")
        chunks = []
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: "):
                payload = line[6:]
                if payload == "[DONE]":
                    break
                chunks.append(json.loads(payload))
        assert chunks
        assert any(ch["choices"][0]["text"] for ch in chunks[:-1]) or len(chunks) == 1
        assert chunks[-1]["choices"][0]["finish_reason"] in ("length", "stop")
        return True

    assert asyncio.run(_with_client(client, run))


def test_http_rerank_and_lora_endpoints(client):
    async def run(c):
        # rerank: shape + self-similarity ranks highest
        r = await c.post("/v1/rerank", json={
            "query": "hello world",
            "documents": ["hello world", "completely different text 123"],
        })
        assert r.status == 200
        d = await r.json()
        assert len(d["results"]) == 2
        assert d["results"][0]["relevance_score"] >= d["results"][1]["relevance_score"]
        assert d["results"][0]["index"] == 0  # identical doc ranks first

        # lora-adapters: empty registry round-trips
        r = await c.get("/lora-adapters")
        assert await r.json() == []
        r = await c.post("/lora-adapters", json=[{"id": 0, "scale": 1.0}])
        assert r.status == 400  # no adapter 0 loaded

        # infill without FIM tokens -> clean 400
        r = await c.post("/infill", json={"input_prefix": "a", "input_suffix": "b"})
        assert r.status == 400
    asyncio.run(_with_client(client, run))


def test_infill_with_fim_tokens(tmp_path):
    """A vocab carrying FIM ids serves /infill (format_infill parity)."""
    model = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    path = str(tmp_path / "fim.gguf")
    vocab = _test_vocab(97)
    from llm_tpu.gguf.constants import Keys
    vocab[Keys.Tokenizer.FIM_PRE_ID] = np.uint32(90)
    vocab[Keys.Tokenizer.FIM_SUF_ID] = np.uint32(91)
    vocab[Keys.Tokenizer.FIM_MID_ID] = np.uint32(92)
    convert_hf_llama(model, path, vocab=vocab)
    reader = GGUFReader(path)
    tok = tokenizer_from_gguf(reader)
    assert tok.vocab.fim_pre_id == 90
    ctx = Context(reader, n_cells=128, n_ubatch=32, dtype=jnp.float32)
    eng = InferenceServer(ctx, tok, n_slots=2, n_batch=32)
    eng.start()
    try:
        app = ServerApp(eng, model_name="fim").build()

        async def run(c):
            r = await c.post("/infill", json={
                "input_prefix": "def add(a, b):", "input_suffix": "return c",
                "n_predict": 4, "temperature": 0.0,
            })
            assert r.status == 200
            d = await r.json()
            assert "content" in d and d["usage"]["completion_tokens"] <= 4
        asyncio.run(_with_client(app, run))
    finally:
        eng.stop()


def test_partial_json_and_tool_call_parsing():
    from llm_tpu.server.toolcall import (extract_tool_calls,
                                         parse_partial_json,
                                         tool_call_in_progress)

    v, done = parse_partial_json('{"a": 1, "b": [2, 3]}')
    assert done and v == {"a": 1, "b": [2, 3]}
    # healed truncations (streaming)
    v, done = parse_partial_json('{"name": "get_weather", "arguments": {"city": "Par')
    assert not done and v["name"] == "get_weather"
    v, done = parse_partial_json('{"name": "f", "arguments":')
    assert not done and v == {"name": "f"}

    calls, content = extract_tool_calls(
        'thinking...<tool_call>{"name": "add", "arguments": {"a": 1}}</tool_call>')
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "add"
    assert json.loads(calls[0]["function"]["arguments"]) == {"a": 1}
    assert content == "thinking..."

    calls, _ = extract_tool_calls(
        '[TOOL_CALLS][{"name": "mul", "arguments": {"x": 2}}]')
    assert calls and calls[0]["function"]["name"] == "mul"

    calls, content = extract_tool_calls('{"name": "solo", "arguments": {}}')
    assert calls and content == ""

    assert tool_call_in_progress('<tool_call>{"name": "a"')
    assert not tool_call_in_progress("plain text answer")


def test_chat_completions_with_tools(client):
    async def run(c):
        r = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "add 1 and 2"}],
            "tools": [{"type": "function", "function": {
                "name": "add", "parameters": {"type": "object"}}}],
            "max_tokens": 4, "temperature": 0.0,
        })
        assert r.status == 200
        d = await r.json()
        msg = d["choices"][0]["message"]
        # random-weight model won't emit a call; the schema must still hold
        assert "content" in msg or "tool_calls" in msg
    asyncio.run(_with_client(client, run))


def _greedy_reference(path, prompt, n):
    """Greedy tokens via a plain Context (no server, no speculation)."""
    reader = GGUFReader(path)
    tok = tokenizer_from_gguf(reader)
    ctx = Context(reader, n_cells=256, dtype=jnp.float32)
    from llm_tpu.runtime.batch import Batch

    toks = tok.encode(prompt, add_special=True)
    assert ctx.decode(Batch.text(toks, seq_id=0)) == 0
    out = []
    pos = len(toks)
    for _ in range(n):
        t = int(np.argmax(ctx.get_logits()))
        out.append(t)
        if tok.vocab.is_eog(t):
            break
        assert ctx.decode(Batch.one(t, pos=pos, seq_id=0)) == 0
        pos += 1
    return toks, out


@pytest.fixture(scope="module")
def spec_paths(tmp_path_factory):
    """Target + draft GGUFs. The draft IS the target model, so greedy
    drafts always verify — exercising the full accept path."""
    model = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    d = tmp_path_factory.mktemp("spec")
    path = str(d / "target.gguf")
    convert_hf_llama(model, path, vocab=_test_vocab(97))
    return path


def _spec_engine(path, **kw):
    reader = GGUFReader(path)
    tok = tokenizer_from_gguf(reader)
    ctx = Context(reader, n_cells=256, n_ubatch=64, dtype=jnp.float32)
    eng = InferenceServer(ctx, tok, n_slots=2, n_batch=64, **kw)
    eng.start()
    return eng


def test_server_speculative_draft_model(spec_paths):
    """Per-slot draft-model speculation (server.cpp:2069-2077): greedy
    output must be IDENTICAL to non-speculative greedy decoding, and with
    draft == target every draft token must be accepted."""
    path = spec_paths
    _, want = _greedy_reference(path, "the quick brown", 10)

    draft_ctx = Context(GGUFReader(path), n_cells=256, dtype=jnp.float32)
    eng = _spec_engine(path, draft_ctx=draft_ctx, n_draft=4)
    try:
        toks = eng.tok.encode("the quick brown", add_special=True)
        task = eng.submit(GenTask(prompt_tokens=toks,
                                  params=SamplingParams(temp=0.0),
                                  n_predict=10))
        pieces, meta = _drain(task)
        got = [p["token"] for p in pieces]
        assert got == [t for t in want if not eng.tok.vocab.is_eog(t)]
        assert eng.metrics["draft_proposed_total"] > 0
        # draft == target => every draft token accepted, except a final
        # round truncated by n_predict/eos
        assert (eng.metrics["draft_accepted_total"]
                >= eng.metrics["draft_proposed_total"] - eng.n_draft)
        assert eng.metrics["draft_accepted_total"] > 0

        # second request reuses the slot (prefix cache + draft reset path)
        task2 = eng.submit(GenTask(prompt_tokens=toks,
                                   params=SamplingParams(temp=0.0),
                                   n_predict=10))
        pieces2, _ = _drain(task2)
        assert [p["token"] for p in pieces2] == got
    finally:
        eng.stop()


def test_server_speculative_ngram(spec_paths):
    """N-gram lookup drafting: output identical to plain greedy decoding
    even when drafts mispredict (rejected tails must leave the KV cache
    consistent)."""
    path = spec_paths
    prompt = "the quick brown fox jumps over the quick brown fox jumps"
    _, want = _greedy_reference(path, prompt, 12)

    eng = _spec_engine(path, lookup_ngram=True, n_draft=4)
    try:
        toks = eng.tok.encode(prompt, add_special=True)
        task = eng.submit(GenTask(prompt_tokens=toks,
                                  params=SamplingParams(temp=0.0),
                                  n_predict=12))
        pieces, meta = _drain(task)
        got = [p["token"] for p in pieces]
        assert got == [t for t in want if not eng.tok.vocab.is_eog(t)]
    finally:
        eng.stop()


def test_server_thread_safety_stress(spec_paths):
    """Concurrent clients x slots x mid-stream cancel (the reference's
    test-thread-safety.cpp analogue): many threads submit/cancel tasks
    against a 2-slot engine; greedy results must stay deterministic and
    the engine must end idle with no stuck tasks."""
    import threading

    path = spec_paths
    eng = _spec_engine(path)
    try:
        toks = eng.tok.encode("the quick brown", add_special=True)
        warm = eng.submit(GenTask(prompt_tokens=toks,
                                  params=SamplingParams(temp=0.0),
                                  n_predict=6))
        pieces, _ = _drain(warm)
        want_tokens = [p["token"] for p in pieces]
        errors: list[str] = []

        def client(i):
            try:
                for r in range(3):
                    task = eng.submit(GenTask(
                        prompt_tokens=toks, params=SamplingParams(temp=0.0),
                        n_predict=6))
                    if i % 3 == 2 and r == 1:
                        task.cancel()  # mid-flight cancellation
                        # drain whatever comes until done
                        while not task.events.get(timeout=120).get("done"):
                            pass
                        continue
                    pieces, meta = _drain(task)
                    got = [p["token"] for p in pieces]
                    if meta["stop_reason"] not in ("length", "eos",
                                                   "cancelled"):
                        errors.append(f"bad stop {meta}")
                    elif meta["stop_reason"] != "cancelled" \
                            and got != want_tokens:
                        errors.append(f"client {i} run {r}: {got} != "
                                      f"{want_tokens}")
            except Exception as e:  # noqa: BLE001
                errors.append(f"client {i}: {e!r}")

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not any(t.is_alive() for t in threads), "stuck client threads"
        assert not errors, errors[:5]
        # engine drains to idle
        import time as _time

        for _ in range(100):
            if all(s.state.name == "IDLE" for s in eng.slots):
                break
            _time.sleep(0.1)
        assert all(s.state.name == "IDLE" for s in eng.slots)
    finally:
        eng.stop()


def test_webui_served(client):
    async def run(c):
        r = await c.get("/")
        assert r.status == 200
        body = await r.text()
        assert "chat/completions" in body
        return True

    assert asyncio.run(_with_client(client, run))


def test_fast_path_matches_scalar_loop(engine):
    """The single-slot greedy fast path (on-device chunked generation)
    must produce the same token stream as the scalar batching loop (forced
    here with a no-op logit bias, which is host-only)."""
    toks = [3, 1, 4, 1, 5]
    slow = engine.submit(GenTask(prompt_tokens=list(toks),
                                 params=SamplingParams(temp=0.0,
                                                       logit_bias={0: 0.0}),
                                 n_predict=19))
    slow_toks, _ = _drain(slow)
    fast = engine.submit(GenTask(prompt_tokens=list(toks),
                                 params=SamplingParams(temp=0.0),
                                 n_predict=19))
    fast_toks, _ = _drain(fast)
    assert fast_toks == slow_toks
    assert engine.metrics.get("fast_chunks_total", 0) > 0


def test_server_bench_grid(tmp_path):
    """server_bench drives the real HTTP server with concurrent streaming
    clients and reports the (pp, tg, pl) grid (tools/batched-bench
    analogue at the server layer)."""
    import io
    import subprocess
    import sys

    from llm_tpu.tools.server_bench import _wait_health, run_grid

    from test_model_vs_hf import _tiny_hf_llama

    path = str(tmp_path / "sb.gguf")
    convert_hf_llama(_tiny_hf_llama(hidden=64, layers=2, vocab=97), path)
    port = 8079  # NEVER 8082-8117 (TPU tunnel relay range)
    srv = subprocess.Popen(
        [sys.executable, "-m", "llm_tpu.server.app", "-m", path,
         "--port", str(port), "-np", "2", "-c", "128", "--device", "cpu"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        _wait_health(port)
        buf = io.StringIO()
        rows = run_grid(port, 97, [8], [4], [1, 2], out=buf)
        assert len(rows) == 2
        # every client generated tg tokens and the table rendered
        assert all(r[4] > 0 for r in rows)
        assert "S_TG" in buf.getvalue()
    finally:
        srv.terminate()
        srv.wait(timeout=30)


def test_core_grammar_constrained_task(engine):
    """grammar field (server.cpp `grammar`): a %regex constraint forces
    the generated text into the language regardless of what greedy
    sampling would have produced."""
    toks = engine.tok.encode("hello", add_special=True)
    task = engine.submit(GenTask(
        prompt_tokens=toks,
        params=SamplingParams(temp=0.0, grammar="%regex yes|no|maybe"),
        n_predict=8))
    pieces, meta = _drain(task)
    text = "".join(p["text"] for p in pieces)
    assert text in ("yes", "no", "maybe", "ye", "n", "mayb", "y", "m",
                    "ma", "may", "e", ""), text
    # a finished generation must be a full match
    if meta["stop_reason"] == "eos":
        assert text in ("yes", "no", "maybe")


def test_http_grammar_and_response_format(client):
    async def run(c):
        # native /completion with a GBNF grammar
        r = await c.post("/completion", json={
            "prompt": "hello", "n_predict": 6, "temperature": 0,
            "grammar": 'root ::= "a"+',
        })
        d = await r.json()
        assert set(d["content"]) <= {"a"}, d["content"]

        # OpenAI response_format json_object -> JSON grammar: every
        # emitted char is a valid JSON prefix (forced by the grammar)
        r = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0,
            "response_format": {"type": "json_object"},
        })
        d = await r.json()
        out = d["choices"][0]["message"]["content"]
        if out:
            assert out[0] in '{["-0123456789tfn', out
        return True

    assert asyncio.run(_with_client(client, run))


def test_http_n_probs_and_logprobs(client):
    async def run(c):
        # native n_probs (server.cpp send_final_response)
        r = await c.post("/completion", json={
            "prompt": "hello", "n_predict": 3, "temperature": 0,
            "n_probs": 4,
        })
        d = await r.json()
        cp = d["completion_probabilities"]
        assert len(cp) == len(d["content"]) or len(cp) >= 1
        assert len(cp[0]["top_probs"]) == 4
        probs = [tp["prob"] for tp in cp[0]["top_probs"]]
        assert probs == sorted(probs, reverse=True)
        assert 0.0 < cp[0]["prob"] <= 1.0
        # the sampled (greedy) token must be the top-1 candidate
        assert cp[0]["id"] == cp[0]["top_probs"][0]["id"]
        # OpenAI completions envelope rides along
        lp = d["choices"][0]["logprobs"]
        assert len(lp["tokens"]) == len(cp)
        assert lp["token_logprobs"][0] <= 0.0

        # OpenAI chat logprobs
        r = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3, "temperature": 0,
            "logprobs": True, "top_logprobs": 2,
        })
        d = await r.json()
        content = d["choices"][0]["logprobs"]["content"]
        assert content and len(content[0]["top_logprobs"]) == 2

        # extended sampling fields are accepted (no 500s)
        r = await c.post("/completion", json={
            "prompt": "hello", "n_predict": 2, "temperature": 0.7,
            "xtc_probability": 0.3, "top_n_sigma": 2.0, "min_keep": 2,
            "dry_multiplier": 0.5, "logit_bias": {"5": -100.0},
            "seed": 7,
        })
        assert r.status == 200
        return True

    assert asyncio.run(_with_client(client, run))
