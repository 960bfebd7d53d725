/* Native single-pass GGUF block -> TPU plane unpacker.
 *
 * This is the runtime-native piece of the load path: where the reference
 * re-layouts quantized blocks with C kernels (ggml-cpu/repack.cpp), we
 * unpack GGUF blocks straight into K-major device planes in ONE pass
 * (the numpy path needs several temporaries + a transpose). Exposed via
 * ctypes (llm_tpu/native/__init__.py); multi-threaded over output rows.
 *
 * Layout contracts match quant/qtensor.py:
 *   qs   p4: uint8 [K/2, N], pairing (k, k + pack_tk/2) within each K-tile
 *   qs   i8: int8  [K, N]
 *   scales/mins: float32 [K/gs, N]
 * Input raw is row-major GGUF: N rows of K values in block format.
 */

#include <stdint.h>
#include <string.h>
#include <pthread.h>

typedef uint8_t u8;
typedef int8_t i8;
typedef uint16_t u16;
typedef int64_t i64;

/* fp16 -> fp32 (no F16C dependency) */
static float f16_to_f32(u16 h) {
    u16 sign = (u16)(h & 0x8000u);
    u16 exp = (u16)((h >> 10) & 0x1F);
    u16 man = (u16)(h & 0x3FF);
    union { uint32_t u; float f; } o;
    if (exp == 0) {
        if (man == 0) { o.u = ((uint32_t)sign) << 16; return o.f; }
        /* subnormal */
        int e = -1;
        uint32_t m = man;
        do { m <<= 1; e++; } while (!(m & 0x400));
        o.u = (((uint32_t)sign) << 16) | ((uint32_t)(127 - 15 - e) << 23)
              | ((m & 0x3FF) << 13);
        return o.f;
    }
    if (exp == 0x1F) {
        o.u = (((uint32_t)sign) << 16) | 0x7F800000u | ((uint32_t)man << 13);
        return o.f;
    }
    o.u = (((uint32_t)sign) << 16) | ((uint32_t)(exp - 15 + 127) << 23)
          | ((uint32_t)man << 13);
    return o.f;
}

static void get_scale_min_k4(int j, const u8 *q, u8 *d, u8 *m) {
    if (j < 4) {
        *d = q[j] & 63; *m = q[j + 4] & 63;
    } else {
        *d = (u8)((q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4));
        *m = (u8)((q[j + 4] >> 4) | ((q[j] >> 6) << 4));
    }
}

/* write one 4-bit value into the p4 packed plane at (k, n) */
static inline void p4_put(u8 *qs, i64 k, i64 n, i64 N, int pack_tk, u8 val) {
    i64 tile = k / pack_tk;
    i64 off = k % pack_tk;
    i64 half = pack_tk / 2;
    i64 row = tile * half + (off % half);
    u8 *cell = &qs[row * N + n];
    if (off < half) *cell = (u8)((*cell & 0xF0) | (val & 0xF));
    else            *cell = (u8)((*cell & 0x0F) | ((val & 0xF) << 4));
}

/* ------------------------- per-row unpackers ------------------------- */

/* Q4_K: 144-byte super-blocks of 256 (ggml-common.h:285-296) */
static void unpack_q4k_row(const u8 *raw, i64 n, i64 N, i64 K,
                           u8 *qs, float *scales, float *mins, int pack_tk) {
    i64 nblocks = K / 256;
    for (i64 b = 0; b < nblocks; b++) {
        const u8 *blk = raw + b * 144;
        float d = f16_to_f32(*(const u16 *)(blk + 0));
        float dmin = f16_to_f32(*(const u16 *)(blk + 2));
        const u8 *sc = blk + 4;
        const u8 *q = blk + 16;
        for (int j = 0; j < 4; j++) {           /* 64-value chunks */
            u8 s1, m1, s2, m2;
            get_scale_min_k4(2 * j, sc, &s1, &m1);
            get_scale_min_k4(2 * j + 1, sc, &s2, &m2);
            i64 g0 = b * 8 + 2 * j;             /* global group index */
            scales[g0 * N + n] = d * (float)s1;
            mins[g0 * N + n] = dmin * (float)m1;
            scales[(g0 + 1) * N + n] = d * (float)s2;
            mins[(g0 + 1) * N + n] = dmin * (float)m2;
            const u8 *qj = q + j * 32;
            i64 kbase = b * 256 + j * 64;
            for (int l = 0; l < 32; l++) {
                p4_put(qs, kbase + l, n, N, pack_tk, (u8)(qj[l] & 0xF));
                p4_put(qs, kbase + 32 + l, n, N, pack_tk, (u8)(qj[l] >> 4));
            }
        }
    }
}

/* Q8_0: 34-byte blocks of 32 (ggml-common.h:209-214) -> i8 plane */
static void unpack_q80_row(const u8 *raw, i64 n, i64 N, i64 K,
                           i8 *qs, float *scales) {
    i64 nblocks = K / 32;
    for (i64 b = 0; b < nblocks; b++) {
        const u8 *blk = raw + b * 34;
        scales[b * N + n] = f16_to_f32(*(const u16 *)blk);
        const i8 *q = (const i8 *)(blk + 2);
        for (int l = 0; l < 32; l++) qs[(b * 32 + l) * N + n] = q[l];
    }
}

/* Q6_K: 210-byte super-blocks of 256 (ggml-common.h:320-326) -> i8 plane */
static void unpack_q6k_row(const u8 *raw, i64 n, i64 N, i64 K,
                           i8 *qs, float *scales) {
    i64 nblocks = K / 256;
    for (i64 b = 0; b < nblocks; b++) {
        const u8 *blk = raw + b * 210;
        const u8 *ql = blk;
        const u8 *qh = blk + 128;
        const i8 *sc = (const i8 *)(blk + 192);
        float d = f16_to_f32(*(const u16 *)(blk + 208));
        for (int g = 0; g < 16; g++)
            scales[(b * 16 + g) * N + n] = d * (float)sc[g];
        for (int half = 0; half < 2; half++) {
            const u8 *qlh = ql + half * 64;
            const u8 *qhh = qh + half * 32;
            i64 kb = b * 256 + half * 128;
            for (int l = 0; l < 32; l++) {
                i8 q1 = (i8)((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)) - 32;
                i8 q2 = (i8)((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)) - 32;
                i8 q3 = (i8)((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32;
                i8 q4 = (i8)((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32;
                qs[(kb + l) * N + n] = q1;
                qs[(kb + 32 + l) * N + n] = q2;
                qs[(kb + 64 + l) * N + n] = q3;
                qs[(kb + 96 + l) * N + n] = q4;
            }
        }
    }
}

/* Q4_0: 18-byte blocks of 32 (ggml-common.h:167-172) -> p4 plane, zp=8 */
static void unpack_q40_row(const u8 *raw, i64 n, i64 N, i64 K,
                           u8 *qs, float *scales, int pack_tk) {
    i64 nblocks = K / 32;
    for (i64 b = 0; b < nblocks; b++) {
        const u8 *blk = raw + b * 18;
        scales[b * N + n] = f16_to_f32(*(const u16 *)blk);
        const u8 *q = blk + 2;
        for (int l = 0; l < 16; l++) {
            /* stored zp-biased (raw nibble IS q, value = q - 8; zp=8) */
            p4_put(qs, b * 32 + l, n, N, pack_tk, (u8)(q[l] & 0xF));
            p4_put(qs, b * 32 + 16 + l, n, N, pack_tk, (u8)(q[l] >> 4));
        }
    }
}

/* ------------------------- threaded drivers ------------------------- */

typedef struct {
    int type;           /* 12=Q4_K, 8=Q8_0, 14=Q6_K, 2=Q4_0 */
    const u8 *raw;
    i64 row_bytes;
    i64 N, K;
    void *qs;
    float *scales;
    float *mins;
    int pack_tk;
    i64 n0, n1;
} job_t;

static void *worker(void *arg) {
    job_t *j = (job_t *)arg;
    for (i64 n = j->n0; n < j->n1; n++) {
        const u8 *row = j->raw + n * j->row_bytes;
        switch (j->type) {
        case 12: unpack_q4k_row(row, n, j->N, j->K, (u8 *)j->qs, j->scales,
                                j->mins, j->pack_tk); break;
        case 8:  unpack_q80_row(row, n, j->N, j->K, (i8 *)j->qs, j->scales); break;
        case 14: unpack_q6k_row(row, n, j->N, j->K, (i8 *)j->qs, j->scales); break;
        case 2:  unpack_q40_row(row, n, j->N, j->K, (u8 *)j->qs, j->scales,
                                j->pack_tk); break;
        }
    }
    return 0;
}

/* entry point: returns 0 on success, -1 on unsupported type */
int unpack_planes(int type, const u8 *raw, i64 row_bytes, i64 N, i64 K,
                  void *qs, float *scales, float *mins, int pack_tk,
                  int n_threads) {
    if (type != 12 && type != 8 && type != 14 && type != 2) return -1;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    if (n_threads > N) n_threads = (int)N;

    pthread_t tids[64];
    job_t jobs[64];
    i64 chunk = (N + n_threads - 1) / n_threads;
    int nt = 0;
    for (int t = 0; t < n_threads; t++) {
        i64 n0 = t * chunk;
        i64 n1 = n0 + chunk > N ? N : n0 + chunk;
        if (n0 >= n1) break;
        jobs[nt] = (job_t){type, raw, row_bytes, N, K, qs, scales, mins,
                           pack_tk, n0, n1};
        nt++;
    }
    if (nt == 1) {
        worker(&jobs[0]);
        return 0;
    }
    for (int t = 0; t < nt; t++) pthread_create(&tids[t], 0, worker, &jobs[t]);
    for (int t = 0; t < nt; t++) pthread_join(tids[t], 0);
    return 0;
}
