"""OpenAI-compatible HTTP server (aiohttp).

Parity target: llama-server's endpoint surface
(/root/reference/tools/server/server.cpp:4832-4862): /completion,
/v1/completions, /v1/chat/completions, /tokenize, /detokenize, /v1/models,
/health, /props, /metrics (Prometheus), /slots — with SSE streaming.
Chat templating uses the GGUF-embedded Jinja template when present.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid

from aiohttp import web

from ..samplers import SamplingParams
from .core import GenTask, InferenceServer, SlotState

# encoder-only archs served in embedding/rerank mode (llm_build_bert family)
_BERT_ARCHS = ("bert", "nomic-bert", "nomic-bert-moe", "jina-bert-v2",
               "neo-bert")

DEFAULT_CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "<|im_start|>{{ message.role }}\n{{ message.content }}<|im_end|>\n"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)


def _grammar_from_request(d: dict) -> str:
    """server.cpp request fields: `grammar` (GBNF or '%regex ...'),
    `json_schema`, and the OpenAI `response_format` envelope
    (json_object / json_schema) — all reduced to GBNF text."""
    grammar = str(d.get("grammar") or "")
    if grammar:
        return grammar
    js = d.get("json_schema")
    rf = d.get("response_format")
    if js is None and isinstance(rf, dict):
        t = rf.get("type")
        if t == "json_object":
            js = {}
        elif t == "json_schema":
            js = (rf.get("json_schema") or {}).get("schema", {})
    if js is None:
        return ""
    from ..grammar.json_schema import json_schema_to_gbnf

    return json_schema_to_gbnf(js)


def _logit_bias_from_request(d: dict) -> dict:
    """OpenAI dict {"123": -5.0} or llama.cpp list [[123, -5.0], ...]."""
    lb = d.get("logit_bias") or {}
    if isinstance(lb, dict):
        return {int(k): float(v) for k, v in lb.items()}
    return {int(k): float(v) for k, v in lb}


def _sampling_from_request(d: dict) -> SamplingParams:
    seed = d.get("seed", -1)
    return SamplingParams(
        grammar=_grammar_from_request(d),
        temp=float(d.get("temperature", d.get("temp", 0.8))),
        top_k=int(d.get("top_k", 40)),
        top_p=float(d.get("top_p", 0.95)),
        min_p=float(d.get("min_p", 0.05)),
        typical_p=float(d.get("typical_p", d.get("typ_p", 1.0))),
        min_keep=int(d.get("min_keep", 0)),
        xtc_probability=float(d.get("xtc_probability", 0.0)),
        xtc_threshold=float(d.get("xtc_threshold", 0.1)),
        top_n_sigma=float(d.get("top_n_sigma", -1.0)),
        dry_multiplier=float(d.get("dry_multiplier", 0.0)),
        dry_base=float(d.get("dry_base", 1.75)),
        dry_allowed_length=int(d.get("dry_allowed_length", 2)),
        dry_penalty_last_n=int(d.get("dry_penalty_last_n", -1)),
        dry_sequence_breakers=tuple(d.get("dry_sequence_breakers") or ()),
        logit_bias=_logit_bias_from_request(d),
        penalty_repeat=float(d.get("repeat_penalty", 1.0)),
        penalty_freq=float(d.get("frequency_penalty", 0.0)),
        penalty_present=float(d.get("presence_penalty", 0.0)),
        penalty_last_n=int(d.get("repeat_last_n", 64)),
        mirostat=int(d.get("mirostat", 0)),
        mirostat_tau=float(d.get("mirostat_tau", 5.0)),
        mirostat_eta=float(d.get("mirostat_eta", 0.1)),
        seed=seed if seed is not None and seed >= 0 else 0xFFFFFFFF,
    )


class ServerApp:
    def __init__(self, engine: InferenceServer, model_name: str = "llm-tpu",
                 chat_template: str | None = None):
        self.engine = engine
        self.tok = engine.tok
        self.model_name = model_name
        self.chat_template_override = chat_template
        self.t_start = time.time()

    # -- helpers ----------------------------------------------------------------

    def _make_task(self, d: dict, prompt_text: str | None = None) -> GenTask:
        if prompt_text is None:
            prompt = d.get("prompt", "")
            if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
                toks = list(prompt)
            else:
                toks = self.tok.encode(str(prompt), add_special=True, parse_special=True)
        else:
            toks = self.tok.encode(prompt_text, add_special=True, parse_special=True)
        stop = d.get("stop") or []
        if isinstance(stop, str):
            stop = [stop]
        n_predict = int(d.get("n_predict", d.get("max_tokens", 128)) or 128)
        # n_probs (native) / logprobs+top_logprobs (OpenAI)
        n_probs = int(d.get("n_probs", 0) or 0)
        lp = d.get("logprobs")
        if not n_probs:
            if lp is True:
                n_probs = int(d.get("top_logprobs", 0) or 0) or 1
            elif isinstance(lp, int) and not isinstance(lp, bool):
                n_probs = lp
        return GenTask(
            prompt_tokens=toks,
            params=_sampling_from_request(d),
            n_predict=n_predict,
            stop=list(stop),
            stream=bool(d.get("stream", False)),
            n_probs=n_probs,
        )

    async def _collect(self, task: GenTask):
        """Drain events (in a thread-friendly way) until done."""
        loop = asyncio.get_event_loop()
        pieces = []
        events = []
        meta = {}
        while True:
            ev = await loop.run_in_executor(None, task.events.get)
            if ev.get("done"):
                meta = ev
                break
            pieces.append(ev["text"])
            events.append(ev)
        meta["events"] = events
        return "".join(pieces), meta

    # -- endpoints ----------------------------------------------------------------

    async def webui(self, request):
        from .webui import INDEX_HTML

        return web.Response(text=INDEX_HTML, content_type="text/html")

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def props(self, request):
        cfg = self.engine.ctx.cfg
        return web.json_response({
            "model": self.model_name,
            "n_ctx": self.engine.ctx.n_cells,
            "n_slots": self.engine.n_slots,
            "arch": cfg.arch,
            "n_layers": cfg.n_layers,
            "vocab_size": cfg.vocab_size,
            "chat_template": self.tok.vocab.chat_template,
        })

    async def models(self, request):
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": int(self.t_start), "owned_by": "llm-tpu"}],
        })

    async def tokenize(self, request):
        d = await request.json()
        toks = self.tok.encode(
            d.get("content", ""), add_special=bool(d.get("add_special", False)),
            parse_special=bool(d.get("parse_special", True)),
        )
        return web.json_response({"tokens": toks})

    async def detokenize(self, request):
        d = await request.json()
        return web.json_response(
            {"content": self.tok.decode([int(t) for t in d.get("tokens", [])])}
        )

    async def slot_action(self, request):
        """POST /slots/{id}?action=save|restore|erase (server.cpp slot
        save/restore endpoints)."""
        from ..runtime.state import state_seq_load, state_seq_save

        sid = int(request.match_info["id"])
        if not (0 <= sid < self.engine.n_slots):
            return web.json_response({"error": "invalid slot"}, status=400)
        action = request.query.get("action", "")
        d = await request.json()
        filename = d.get("filename", f"slot{sid}.npz")
        slot = self.engine.slots[sid]
        if action == "save":
            with self.engine.ctx_lock:
                state_seq_save(self.engine.ctx, sid, filename, tokens=slot.cache_tokens)
            return web.json_response({"saved": filename,
                                      "n_tokens": len(slot.cache_tokens)})
        if action == "restore":
            with self.engine.ctx_lock:
                toks = state_seq_load(self.engine.ctx, sid, filename)
            slot.cache_tokens = toks
            return web.json_response({"restored": filename, "n_tokens": len(toks)})
        if action == "erase":
            self.engine.ctx.seq_rm(sid)
            slot.cache_tokens = []
            return web.json_response({"erased": sid})
        return web.json_response({"error": "unknown action"}, status=400)

    async def slots(self, request):
        out = []
        for s in self.engine.slots:
            out.append({
                "id": s.id,
                "state": s.state.name,
                "n_past": len(s.cache_tokens),
                "n_decoded": s.n_decoded,
            })
        return web.json_response(out)

    async def metrics(self, request):
        m = self.engine.metrics
        lines = [
            "# TYPE llm_tpu_requests_total counter",
            f"llm_tpu_requests_total {m['requests_total']}",
            "# TYPE llm_tpu_tokens_predicted_total counter",
            f"llm_tpu_tokens_predicted_total {m['tokens_predicted_total']}",
            "# TYPE llm_tpu_tokens_prompt_total counter",
            f"llm_tpu_tokens_prompt_total {m['tokens_prompt_total']}",
            "# TYPE llm_tpu_busy_slots gauge",
            f"llm_tpu_busy_slots {m['busy_slots']}",
            "# TYPE llm_tpu_draft_proposed_total counter",
            f"llm_tpu_draft_proposed_total {m.get('draft_proposed_total', 0)}",
            "# TYPE llm_tpu_draft_accepted_total counter",
            f"llm_tpu_draft_accepted_total {m.get('draft_accepted_total', 0)}",
        ]
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def embeddings(self, request):
        """/v1/embeddings (OpenAI) + /embeddings (native)."""
        d = await request.json()
        inputs = d.get("input", d.get("content", ""))
        if isinstance(inputs, str):
            inputs = [inputs]
        pooling = d.get("pooling", "mean")
        loop = asyncio.get_event_loop()
        out = []
        for i, text in enumerate(inputs):
            toks = self.tok.encode(str(text), add_special=True, parse_special=True)
            # run on the inference thread's context via executor lock-free:
            # encode uses a dedicated seq id above the slot range
            def run(t=toks):
                with self.engine.ctx_lock:
                    return self.engine.ctx.encode(t, pooling, seq_id=self.engine.n_slots)

            emb = await loop.run_in_executor(None, run)
            out.append({"object": "embedding", "index": i,
                        "embedding": [float(x) for x in emb.reshape(-1)]})
        return web.json_response({
            "object": "list", "data": out, "model": self.model_name,
            "usage": {"prompt_tokens": 0, "total_tokens": 0},
        })

    async def infill(self, request):
        """/infill — fill-in-the-middle completion (server.cpp
        handle_infill): prompt = FIM_PRE + prefix + FIM_SUF + suffix +
        FIM_MID (+ optional extra prompt after MID)."""
        d = await request.json()
        v = self.tok.vocab
        if v.fim_pre_id < 0 or v.fim_suf_id < 0 or v.fim_mid_id < 0:
            return web.json_response(
                {"error": "model has no FIM tokens"}, status=400)
        pre = self.tok.encode(str(d.get("input_prefix", "")), add_special=False)
        suf = self.tok.encode(str(d.get("input_suffix", "")), add_special=False)
        toks = []
        if v.add_bos and v.bos_id >= 0:
            toks.append(v.bos_id)
        toks += [v.fim_pre_id] + pre + [v.fim_suf_id] + suf + [v.fim_mid_id]
        if d.get("prompt"):
            toks += self.tok.encode(str(d["prompt"]), add_special=False)
        task = GenTask(
            prompt_tokens=toks,
            params=_sampling_from_request(d),
            n_predict=int(d.get("n_predict", d.get("max_tokens", 128)) or 128),
            stop=list(d.get("stop") or []),
            stream=False,
        )
        self.engine.submit(task)
        text, meta = await self._collect(task)
        return web.json_response({
            "content": text,
            "stop_reason": meta.get("stop_reason"),
            "usage": _usage(meta),
        })

    async def rerank(self, request):
        """/rerank + /v1/rerank — score documents against a query.

        The reference serves this with a classifier-head reranker model
        (server.cpp handle_rerank); generative checkpoints have no head, so
        this endpoint scores by cosine similarity of pooled embeddings —
        same response shape, weaker ranking signal."""
        d = await request.json()
        query = str(d.get("query", ""))
        docs = d.get("documents", d.get("texts", [])) or []
        import numpy as np

        loop = asyncio.get_event_loop()

        ctx = self.engine.ctx
        if getattr(ctx, "params", {}) and "cls" in getattr(ctx, "params", {}):
            # classifier-head reranker (server.cpp handle_rerank +
            # format_rerank: bos query eos sep doc eos)
            v = self.tok.vocab

            def score(doc):
                toks = []
                if v.bos_id >= 0:
                    toks.append(v.bos_id)
                toks += self.tok.encode(query, add_special=False)
                if v.eos_id >= 0:
                    toks.append(v.eos_id)
                if getattr(v, "sep_id", -1) >= 0:
                    toks.append(v.sep_id)
                toks += self.tok.encode(str(doc), add_special=False)
                if v.eos_id >= 0:
                    toks.append(v.eos_id)
                with self.engine.ctx_lock:
                    return ctx.rerank_score(toks)

            results = []
            for i, doc in enumerate(docs):
                s = await loop.run_in_executor(None, score, doc)
                results.append({"index": i, "relevance_score": float(s)})
            results.sort(key=lambda r: -r["relevance_score"])
            if d.get("top_n"):
                results = results[: int(d["top_n"])]
            return web.json_response({
                "model": self.model_name, "object": "list",
                "results": results,
                "usage": {"prompt_tokens": 0, "total_tokens": 0},
            })

        def embed(text):
            toks = self.tok.encode(str(text), add_special=True, parse_special=True)
            with self.engine.ctx_lock:
                return self.engine.ctx.encode(toks, "mean",
                                              seq_id=self.engine.n_slots)

        qv = await loop.run_in_executor(None, embed, query)
        qv = qv / (np.linalg.norm(qv) + 1e-8)
        results = []
        for i, doc in enumerate(docs):
            dv = await loop.run_in_executor(None, embed, doc)
            dv = dv / (np.linalg.norm(dv) + 1e-8)
            results.append({"index": i,
                            "relevance_score": float(np.dot(qv, dv))})
        results.sort(key=lambda r: -r["relevance_score"])
        if d.get("top_n"):
            results = results[: int(d["top_n"])]
        return web.json_response({
            "model": self.model_name, "object": "list", "results": results,
            "usage": {"prompt_tokens": 0, "total_tokens": 0},
        })

    async def lora_adapters_get(self, request):
        """GET /lora-adapters (server.cpp handle_lora_adapters_list)."""
        return web.json_response([
            {"id": i, "path": l["path"], "scale": l["scale"]}
            for i, l in enumerate(self.engine.loras)
        ])

    async def lora_adapters_post(self, request):
        """POST /lora-adapters: [{"id": n, "scale": s}, ...] — re-applies
        adapters at the new scales (handle_lora_adapters_apply)."""
        from ..models.lora import attach_lora

        d = await request.json()
        if not isinstance(d, list):
            return web.json_response({"error": "expected a list"}, status=400)
        for item in d:
            i = int(item.get("id", -1))
            if not (0 <= i < len(self.engine.loras)):
                return web.json_response({"error": f"invalid id {i}"}, status=400)
            self.engine.loras[i]["scale"] = float(item.get("scale", 1.0))
        with self.engine.ctx_lock:
            for l in self.engine.loras:
                attach_lora(self.engine.ctx.params, l["tensors"], l["alpha"],
                            scale=l["scale"])
        return web.json_response({"success": True})

    # completions (native + OpenAI) ------------------------------------------------

    async def completion(self, request):
        d = await request.json()
        task = self.engine.submit(self._make_task(d))
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"

        if task.stream:
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            })
            await resp.prepare(request)
            loop = asyncio.get_event_loop()
            try:
                while True:
                    ev = await loop.run_in_executor(None, task.events.get)
                    if ev.get("done"):
                        payload = self._oai_completion_chunk(rid, "", ev)
                        await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
                        await resp.write(b"data: [DONE]\n\n")
                        break
                    payload = self._oai_completion_chunk(rid, ev["text"], None,
                                                         ev=ev)
                    await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
            finally:
                task.cancel()
            await resp.write_eof()
            return resp

        text, meta = await self._collect(task)
        out = {
            "id": rid, "object": "text_completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": [{"index": 0, "text": text,
                         "finish_reason": _finish_reason(meta)}],
            "usage": _usage(meta),
            "content": text,  # llama-server native field
            "stop_reason": meta.get("stop_reason"),
        }
        if task.n_probs:
            evs = meta.get("events", [])
            # native field (server.cpp send_final_response n_probs)
            out["completion_probabilities"] = [
                {"id": ev["token"], "token": ev["text"],
                 "prob": ev.get("prob"), "top_probs": ev.get("top_probs", [])}
                for ev in evs]
            # OpenAI completions logprobs envelope
            import math

            def _lp(p):
                return math.log(max(p, 1e-30)) if p is not None else None
            out["choices"][0]["logprobs"] = {
                "tokens": [ev["text"] for ev in evs],
                "token_logprobs": [_lp(ev.get("prob")) for ev in evs],
                "top_logprobs": [
                    {tp["token"]: _lp(tp["prob"])
                     for tp in ev.get("top_probs", [])} for ev in evs],
            }
        return web.json_response(out)

    def _oai_completion_chunk(self, rid, text, done_meta, ev=None):
        out = {
            "id": rid, "object": "text_completion", "model": self.model_name,
            "created": int(time.time()),
            "choices": [{
                "index": 0, "text": text,
                "finish_reason": _finish_reason(done_meta) if done_meta else None,
            }],
        }
        if ev is not None and ev.get("top_probs") is not None:
            # native per-chunk probs (server.cpp send_partial_response)
            out["completion_probabilities"] = [{
                "id": ev["token"], "token": ev["text"],
                "prob": ev.get("prob"), "top_probs": ev["top_probs"]}]
        return out

    async def chat_completions(self, request):
        d = await request.json()
        messages = list(d.get("messages", []))
        tools = d.get("tools") or []
        if tools:
            from .toolcall import render_tools_prompt

            messages = [{"role": "system",
                         "content": render_tools_prompt(tools)}] + messages
        prompt = self._render_chat(messages)
        task = self.engine.submit(self._make_task(d, prompt_text=prompt))
        rid = f"chatcmpl-{uuid.uuid4().hex[:24]}"

        if d.get("stream"):
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            })
            await resp.prepare(request)
            loop = asyncio.get_event_loop()
            first = True
            try:
                while True:
                    ev = await loop.run_in_executor(None, task.events.get)
                    delta = {}
                    if first and not ev.get("done"):
                        delta["role"] = "assistant"
                        first = False
                    finish = None
                    if ev.get("done"):
                        finish = _finish_reason(ev)
                    else:
                        delta["content"] = ev["text"]
                    choice = {"index": 0, "delta": delta,
                              "finish_reason": finish}
                    if task.n_probs and ev.get("top_probs") is not None:
                        import math

                        choice["logprobs"] = {"content": [{
                            "token": ev["text"],
                            "logprob": math.log(max(ev.get("prob", 0.0), 1e-30)),
                            "top_logprobs": [
                                {"token": tp["token"],
                                 "logprob": math.log(max(tp["prob"], 1e-30))}
                                for tp in ev["top_probs"]],
                        }]}
                    payload = {
                        "id": rid, "object": "chat.completion.chunk",
                        "created": int(time.time()), "model": self.model_name,
                        "choices": [choice],
                    }
                    await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
                    if ev.get("done"):
                        await resp.write(b"data: [DONE]\n\n")
                        break
            finally:
                task.cancel()
            await resp.write_eof()
            return resp

        text, meta = await self._collect(task)
        message = {"role": "assistant", "content": text}
        finish = _finish_reason(meta)
        if tools:
            from .toolcall import extract_tool_calls

            calls, content = extract_tool_calls(text)
            if calls:
                message = {"role": "assistant",
                           "content": content or None, "tool_calls": calls}
                finish = "tool_calls"
        choice = {"index": 0, "message": message, "finish_reason": finish}
        if task.n_probs:
            import math

            def _lp(p):
                return math.log(max(p, 1e-30)) if p is not None else None
            choice["logprobs"] = {"content": [
                {"token": ev["text"], "logprob": _lp(ev.get("prob")),
                 "top_logprobs": [
                     {"token": tp["token"], "logprob": _lp(tp["prob"])}
                     for tp in ev.get("top_probs", [])]}
                for ev in meta.get("events", [])]}
        return web.json_response({
            "id": rid, "object": "chat.completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": [choice],
            "usage": _usage(meta),
        })

    def _render_chat(self, messages: list[dict]) -> str:
        from .chat import TEMPLATES, apply_template, detect_template

        if self.chat_template_override:
            return apply_template(self.chat_template_override, messages)
        template = self.tok.vocab.chat_template
        if template:
            return apply_template(template, messages)
        return TEMPLATES["chatml"](messages)

    # -- wiring ---------------------------------------------------------------------

    def build(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/", self.webui)
        app.router.add_get("/health", self.health)
        app.router.add_get("/props", self.props)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/slots", self.slots)
        app.router.add_post("/slots/{id}", self.slot_action)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_post("/tokenize", self.tokenize)
        app.router.add_post("/embeddings", self.embeddings)
        app.router.add_post("/v1/embeddings", self.embeddings)
        app.router.add_post("/detokenize", self.detokenize)
        app.router.add_post("/infill", self.infill)
        app.router.add_post("/rerank", self.rerank)
        app.router.add_post("/v1/rerank", self.rerank)
        app.router.add_get("/lora-adapters", self.lora_adapters_get)
        app.router.add_post("/lora-adapters", self.lora_adapters_post)
        app.router.add_post("/completion", self.completion)
        app.router.add_post("/completions", self.completion)
        app.router.add_post("/v1/completions", self.completion)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        return app


def _finish_reason(meta):
    if not meta:
        return None
    r = meta.get("stop_reason", "")
    if r == "length":
        return "length"
    if r and r.startswith("error"):
        return r
    return "stop"


def _usage(meta):
    return {
        "prompt_tokens": meta.get("n_prompt", 0),
        "completion_tokens": meta.get("n_decoded", 0),
        "total_tokens": meta.get("n_prompt", 0) + meta.get("n_decoded", 0),
    }


def main(argv=None):
    import argparse

    import jax.numpy as jnp

    from ..gguf.reader import GGUFReader
    from ..runtime.engine import Context
    from ..tokenizers import tokenizer_from_gguf

    from ..tools.args import env_default as ed, required_unless_env

    ap = argparse.ArgumentParser(description="llm-tpu OpenAI-compatible server")
    ap.add_argument("-m", "--model", default=ed("model", None),
                    required=required_unless_env("model"))
    ap.add_argument("--host", default=ed("host", "127.0.0.1"))
    ap.add_argument("--port", type=int, default=ed("port", 8080))
    ap.add_argument("-c", "--ctx-size", type=int, default=ed("ctx-size", 4096))
    ap.add_argument("-np", "--n-parallel", type=int, default=ed("n-parallel", 4))
    ap.add_argument("-b", "--n-batch", type=int, default=ed("n-batch", 256))
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--alias", default=None, help="model name served")
    ap.add_argument("--chat-template", default=None,
                    help="builtin template name (chatml/llama2/llama3/gemma/...) "
                         "or a Jinja source string")
    ap.add_argument("--lora", action="append", default=[],
                    help="LoRA adapter GGUF (repeatable); optional :scale suffix")
    ap.add_argument("-md", "--model-draft", default=None,
                    help="draft model GGUF: per-slot speculative decoding")
    ap.add_argument("--draft-max", type=int, default=8,
                    help="max draft tokens per step (llama-server --draft-max)")
    ap.add_argument("--lookup-ngram", action="store_true",
                    help="draft from prompt n-gram stats (no draft model)")
    ap.add_argument("--prewarm", action="store_true",
                    help="compile all prompt-length buckets + batched "
                         "decode loops before accepting traffic (slower "
                         "startup, no mid-traffic compile stalls)")
    from ..tools.args import add_override_kv, apply_kv_overrides
    from ..tools.mesh_args import add_mesh_args, mesh_from_args

    add_override_kv(ap)
    add_mesh_args(ap)
    from ..tools.args import add_device, add_ep_cf, apply_device, apply_ep_cf

    add_device(ap)
    add_ep_cf(ap)
    args = ap.parse_args(argv)
    apply_device(args.device)
    apply_ep_cf(args.ep_capacity_factor)
    mesh = mesh_from_args(args)

    reader = GGUFReader(args.model)
    apply_kv_overrides(reader, args.override_kv)
    tok = tokenizer_from_gguf(reader)
    if reader.architecture in _BERT_ARCHS:
        # encoder-only checkpoint: serve /embeddings + /rerank through the
        # bidirectional graph (server.cpp embedding/rerank modes)
        from ..models.bert import BertContext

        ctx = BertContext(reader)
    else:
        ctx = Context(
            reader, n_cells=args.ctx_size, n_ubatch=args.n_batch,
            dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            mesh=mesh, n_seq_hint=args.n_parallel,
        )
    draft_ctx = None
    if args.model_draft:
        draft_ctx = Context(
            GGUFReader(args.model_draft), n_cells=args.ctx_size,
            n_ubatch=args.n_batch,
            dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        )
    engine = InferenceServer(ctx, tok, n_slots=args.n_parallel,
                             n_batch=args.n_batch, draft_ctx=draft_ctx,
                             n_draft=args.draft_max,
                             lookup_ngram=args.lookup_ngram)
    for spec in args.lora:
        from ..models.lora import attach_lora, load_lora_gguf

        path, _, sc = spec.partition(":")
        scale = float(sc) if sc else 1.0
        tensors, alpha = load_lora_gguf(path)
        attach_lora(ctx.params, tensors, alpha, scale=scale)
        engine.loras.append({"path": path, "scale": scale,
                             "tensors": tensors, "alpha": alpha})
    if args.prewarm and hasattr(engine, "prewarm"):
        import time as _time

        t0 = _time.time()
        engine.prewarm()
        print(f"prewarm: {_time.time() - t0:.1f}s", flush=True)
    engine.start()
    name = args.alias or args.model.rsplit("/", 1)[-1]
    app = ServerApp(engine, model_name=name,
                    chat_template=args.chat_template).build()
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
