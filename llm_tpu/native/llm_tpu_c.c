/* llm_tpu C ABI implementation: embeds CPython and drives the Python/JAX
 * runtime (see llm_tpu.h for the contract; reference surface:
 * /root/reference/include/llama.h).
 *
 * Build:
 *   cc -O2 -shared -fPIC llm_tpu_c.c -o libllm_tpu.so \
 *      $(python3-config --includes) $(python3-config --embed --ldflags)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>
#include <string.h>

#include "llm_tpu.h"

struct llm_tpu_context {
    PyObject *ctx;      /* llm_tpu.runtime.engine.Context */
    PyObject *tok;      /* tokenizer */
    PyObject *batch_cls;
    PyObject *np;       /* numpy module */
    int32_t n_vocab;
};

static int g_inited = 0;

int llm_tpu_init(const char *pythonpath) {
    if (g_inited) return 0;
    if (pythonpath && *pythonpath) {
        setenv("PYTHONPATH", pythonpath, 1);
    }
    Py_InitializeEx(0);
    if (!Py_IsInitialized()) return -1;
    g_inited = 1;
    return 0;
}

static void print_err(void) {
    if (PyErr_Occurred()) PyErr_Print();
}

llm_tpu_context *llm_tpu_context_new(const char *gguf_path, int32_t n_cells) {
    if (!g_inited && llm_tpu_init(NULL) != 0) return NULL;

    PyObject *mod_reader = PyImport_ImportModule("llm_tpu.gguf.reader");
    PyObject *mod_engine = PyImport_ImportModule("llm_tpu.runtime.engine");
    PyObject *mod_tok = PyImport_ImportModule("llm_tpu.tokenizers");
    PyObject *mod_batch = PyImport_ImportModule("llm_tpu.runtime.batch");
    PyObject *np = PyImport_ImportModule("numpy");
    if (!mod_reader || !mod_engine || !mod_tok || !mod_batch || !np) {
        print_err();
        return NULL;
    }

    PyObject *reader = PyObject_CallMethod(mod_reader, "GGUFReader", "s", gguf_path);
    if (!reader) { print_err(); return NULL; }
    PyObject *tok = PyObject_CallMethod(mod_tok, "tokenizer_from_gguf", "O", reader);
    if (!tok) { print_err(); Py_DECREF(reader); return NULL; }

    PyObject *kwargs = Py_BuildValue("{s:i}", "n_cells", (int)n_cells);
    PyObject *args = Py_BuildValue("(O)", reader);
    PyObject *ctx_cls = PyObject_GetAttrString(mod_engine, "Context");
    PyObject *ctx = PyObject_Call(ctx_cls, args, kwargs);
    Py_DECREF(args); Py_DECREF(kwargs); Py_DECREF(ctx_cls); Py_DECREF(reader);
    if (!ctx) { print_err(); Py_DECREF(tok); return NULL; }

    struct llm_tpu_context *h = calloc(1, sizeof(*h));
    h->ctx = ctx;
    h->tok = tok;
    h->batch_cls = PyObject_GetAttrString(mod_batch, "Batch");
    h->np = np;

    PyObject *cfg = PyObject_GetAttrString(ctx, "cfg");
    PyObject *nv = cfg ? PyObject_GetAttrString(cfg, "vocab_size") : NULL;
    h->n_vocab = nv ? (int32_t)PyLong_AsLong(nv) : -1;
    Py_XDECREF(nv); Py_XDECREF(cfg);
    return h;
}

void llm_tpu_context_free(llm_tpu_context *h) {
    if (!h) return;
    Py_XDECREF(h->ctx);
    Py_XDECREF(h->tok);
    Py_XDECREF(h->batch_cls);
    free(h);
}

int32_t llm_tpu_n_vocab(const llm_tpu_context *h) { return h->n_vocab; }

int32_t llm_tpu_tokenize(llm_tpu_context *h, const char *text,
                         int32_t *out, int32_t cap, int add_special) {
    PyObject *toks = PyObject_CallMethod(
        h->tok, "encode", "sO", text, add_special ? Py_True : Py_False);
    if (!toks) { print_err(); return -1; }
    Py_ssize_t n = PySequence_Length(toks);
    for (Py_ssize_t i = 0; i < n && i < cap; ++i) {
        PyObject *t = PySequence_GetItem(toks, i);
        out[i] = (int32_t)PyLong_AsLong(t);
        Py_DECREF(t);
    }
    Py_DECREF(toks);
    return (int32_t)n;
}

int32_t llm_tpu_token_piece(llm_tpu_context *h, int32_t token,
                            char *buf, int32_t cap) {
    PyObject *s = PyObject_CallMethod(h->tok, "piece", "i", (int)token);
    if (!s) { print_err(); return -1; }
    Py_ssize_t len = 0;
    const char *utf8 = PyUnicode_AsUTF8AndSize(s, &len);
    if (!utf8) { Py_DECREF(s); return -1; }
    int32_t ncopy = (int32_t)len < cap ? (int32_t)len : cap;
    memcpy(buf, utf8, (size_t)ncopy);
    if (ncopy < cap) buf[ncopy] = 0;
    Py_DECREF(s);
    return (int32_t)len;
}

int32_t llm_tpu_decode(llm_tpu_context *h, const int32_t *tokens, int32_t n,
                       const int32_t *pos, int32_t seq_id) {
    PyObject *b = PyObject_CallObject(h->batch_cls, NULL);
    if (!b) { print_err(); return -2; }
    for (int32_t i = 0; i < n; ++i) {
        PyObject *seqs = Py_BuildValue("(i)", (int)seq_id);
        PyObject *r = PyObject_CallMethod(
            b, "add", "iiOO", (int)tokens[i], (int)pos[i], seqs,
            i == n - 1 ? Py_True : Py_False);
        Py_DECREF(seqs);
        if (!r) { print_err(); Py_DECREF(b); return -2; }
        Py_DECREF(r);
    }
    PyObject *rc = PyObject_CallMethod(h->ctx, "decode", "O", b);
    Py_DECREF(b);
    if (!rc) { print_err(); return -2; }
    int32_t v = (int32_t)PyLong_AsLong(rc);
    Py_DECREF(rc);
    return v;
}

static PyObject *last_logits(llm_tpu_context *h) {
    return PyObject_CallMethod(h->ctx, "get_logits", NULL);
}

int32_t llm_tpu_get_logits(llm_tpu_context *h, float *out, int32_t cap) {
    PyObject *lg = last_logits(h);
    if (!lg) { print_err(); return -1; }
    /* tolist() keeps this independent of the numpy C API/ABI */
    PyObject *f32 = PyObject_CallMethod(lg, "astype", "s", "float32");
    PyObject *lst = f32 ? PyObject_CallMethod(f32, "tolist", NULL) : NULL;
    Py_XDECREF(f32);
    Py_DECREF(lg);
    if (!lst) { print_err(); return -1; }
    Py_ssize_t n = PySequence_Length(lst);
    for (Py_ssize_t i = 0; i < n && i < cap; ++i) {
        PyObject *v = PySequence_GetItem(lst, i);
        out[i] = (float)PyFloat_AsDouble(v);
        Py_DECREF(v);
    }
    Py_DECREF(lst);
    return (int32_t)n;
}

int32_t llm_tpu_sample_greedy(llm_tpu_context *h) {
    PyObject *lg = last_logits(h);
    if (!lg) { print_err(); return -1; }
    PyObject *am = PyObject_CallMethod(h->np, "argmax", "O", lg);
    Py_DECREF(lg);
    if (!am) { print_err(); return -1; }
    int32_t v = (int32_t)PyLong_AsLong(am);
    Py_DECREF(am);
    return v;
}

int32_t llm_tpu_seq_rm(llm_tpu_context *h, int32_t seq_id,
                       int32_t p0, int32_t p1) {
    PyObject *r = PyObject_CallMethod(h->ctx, "seq_rm", "iii",
                                      (int)seq_id, (int)p0, (int)p1);
    if (!r) { print_err(); return -1; }
    Py_DECREF(r);
    return 0;
}

int32_t llm_tpu_generate(llm_tpu_context *h, int32_t first_token,
                         int32_t n_tokens, int32_t seq_id,
                         int32_t *out, int32_t cap) {
    /* on-device chunked generation (Context.generate_loop: in-jit greedy
     * chain with EOG stop) — the C-side analogue of the reference's tight
     * local decode loop (tools/main). */
    PyObject *kw = Py_BuildValue("{s:i}", "seq_id", (int)seq_id);
    PyObject *args = Py_BuildValue("(ii)", (int)first_token, (int)n_tokens);
    PyObject *meth = PyObject_GetAttrString(h->ctx, "generate_loop");
    PyObject *lst = meth ? PyObject_Call(meth, args, kw) : NULL;
    Py_XDECREF(meth);
    Py_DECREF(args);
    Py_DECREF(kw);
    if (!lst) { print_err(); return -1; }
    Py_ssize_t n = PySequence_Length(lst);
    for (Py_ssize_t i = 0; i < n && i < cap; ++i) {
        PyObject *v = PySequence_GetItem(lst, i);
        out[i] = (int32_t)PyLong_AsLong(v);
        Py_DECREF(v);
    }
    Py_DECREF(lst);
    return (int32_t)n;
}
