/* llm_tpu C ABI — stable bindings surface for non-Python hosts.
 *
 * Parity target: the reference's public C API (/root/reference/include/
 * llama.h: llama_model_load_from_file, llama_decode, llama_get_logits,
 * llama_tokenize, llama_memory_seq_rm, ...), reduced to the session
 * operations bindings actually need. The implementation (llm_tpu_c.c)
 * embeds CPython and drives the JAX runtime; link with
 * `$(python3-config --embed --ldflags)`.
 *
 * All functions return 0 on success (or a documented count); negative on
 * error. Not thread-safe: serialize calls per context like llama.cpp's
 * single inference thread.
 */

#ifndef LLM_TPU_H
#define LLM_TPU_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct llm_tpu_context llm_tpu_context;

/* Initialize the embedded runtime. `pythonpath` may be NULL (uses
 * PYTHONPATH from the environment); call once per process. */
int llm_tpu_init(const char *pythonpath);

/* Load a GGUF model and create an execution context.
 * n_cells: KV cache capacity. Returns NULL on failure. */
llm_tpu_context *llm_tpu_context_new(const char *gguf_path, int32_t n_cells);

void llm_tpu_context_free(llm_tpu_context *ctx);

int32_t llm_tpu_n_vocab(const llm_tpu_context *ctx);

/* Tokenize UTF-8 text. Returns the token count (which may exceed cap —
 * call again with a bigger buffer), or negative on error. */
int32_t llm_tpu_tokenize(llm_tpu_context *ctx, const char *text,
                         int32_t *out, int32_t cap, int add_special);

/* Render one token's text piece into buf; returns byte length. */
int32_t llm_tpu_token_piece(llm_tpu_context *ctx, int32_t token,
                            char *buf, int32_t cap);

/* Decode n tokens at positions pos[0..n) for sequence seq_id; logits are
 * produced for the last token. Return codes follow llama_decode:
 * 0 ok, 1 no KV slot (recoverable), negative fatal. */
int32_t llm_tpu_decode(llm_tpu_context *ctx, const int32_t *tokens,
                       int32_t n, const int32_t *pos, int32_t seq_id);

/* Copy the last logits row into out (n_vocab floats). */
int32_t llm_tpu_get_logits(llm_tpu_context *ctx, float *out, int32_t cap);

/* argmax of the last logits row (greedy sampling helper). */
int32_t llm_tpu_sample_greedy(llm_tpu_context *ctx);

/* Generate up to n_tokens greedily ON DEVICE starting from first_token
 * (decodes it, then chains sampling in one dispatch; stops after an
 * end-of-generation token). Writes up to cap token ids into out; returns
 * the number generated, or -1 on error. */
int32_t llm_tpu_generate(llm_tpu_context *ctx, int32_t first_token,
                         int32_t n_tokens, int32_t seq_id,
                         int32_t *out, int32_t cap);

/* llama_memory_seq_rm analogue: remove [p0, p1) of seq (negatives = open). */
int32_t llm_tpu_seq_rm(llm_tpu_context *ctx, int32_t seq_id,
                       int32_t p0, int32_t p1);

#ifdef __cplusplus
}
#endif

#endif /* LLM_TPU_H */
