/* Native single-pass GGUF block -> TPU plane unpacker.
 *
 * This is the runtime-native piece of the load path: where the reference
 * re-layouts quantized blocks with C kernels (ggml-cpu/repack.cpp), we
 * unpack GGUF blocks straight into K-major device planes in ONE pass.
 * Exposed via ctypes (llm_tpu/native/__init__.py); multi-threaded over
 * output rows.
 *
 * Performance: the K-major planes mean every (k, n) value lands at
 * qs[k' * N + n] — a stride-N byte write. Writing a whole row's K values
 * that way touches a fresh cache line per byte (measured 138 MB/s in
 * round 4). So the unpackers are TILED: each thread decodes a TN-column
 * tile of one super-block into an L1-resident local buffer (strided
 * writes into ~8KB are free), then memcpys contiguous TN-byte runs into
 * the global plane.
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

#define TN 64  /* columns per tile: one cache line of plane per memcpy */

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

/* ---------------------- tiled per-type unpackers ----------------------
 * Each processes super-block b for columns [n0, n0+tn) of the plane.
 * pack_tk is fixed at 256 for p4 types (asserted in the entry point), so
 * a 256-value super-block is exactly one pack tile: packed local row r
 * (0..127) holds k = r (low nibble) and k = r + 128 (high nibble). */

/* Q4_K: 144-byte super-blocks of 256 (ggml-common.h:285-296).
 * Chunk j's byte qj[l]: low nibble = k j*64+l, high = k j*64+32+l, so
 *   row l      <- lo(q0[l]) | hi-nibble lo(q2[l])
 *   row 32+l   <- hi(q0[l]) | hi(q2[l])
 *   row 64+l   <- lo(q1[l]) | lo(q3[l])<<4
 *   row 96+l   <- hi(q1[l]) | hi(q3[l])<<4        (single pass, no RMW) */
static void q4k_tile(const u8 *raw, i64 row_bytes, i64 b, i64 n0, int tn,
                     i64 N, u8 *qs, float *scales, float *mins) {
    u8 tbuf[128][TN];
    float sbuf[8][TN], mbuf[8][TN];
    for (int c = 0; c < tn; c++) {
        const u8 *blk = raw + (n0 + c) * row_bytes + b * 144;
        float d = f16_to_f32(*(const u16 *)(blk + 0));
        float dmin = f16_to_f32(*(const u16 *)(blk + 2));
        const u8 *sc = blk + 4;
        for (int g = 0; g < 8; g++) {
            u8 s, m;
            get_scale_min_k4(g, sc, &s, &m);
            sbuf[g][c] = d * (float)s;
            mbuf[g][c] = dmin * (float)m;
        }
        const u8 *q0 = blk + 16, *q1 = q0 + 32, *q2 = q0 + 64, *q3 = q0 + 96;
        for (int l = 0; l < 32; l++) {
            tbuf[l][c]      = (u8)((q0[l] & 0xF) | ((q2[l] & 0xF) << 4));
            tbuf[32 + l][c] = (u8)((q0[l] >> 4) | (q2[l] & 0xF0));
            tbuf[64 + l][c] = (u8)((q1[l] & 0xF) | ((q3[l] & 0xF) << 4));
            tbuf[96 + l][c] = (u8)((q1[l] >> 4) | (q3[l] & 0xF0));
        }
    }
    for (int r = 0; r < 128; r++)
        memcpy(&qs[(b * 128 + r) * N + n0], tbuf[r], (size_t)tn);
    for (int g = 0; g < 8; g++) {
        memcpy(&scales[(b * 8 + g) * N + n0], sbuf[g], sizeof(float) * tn);
        memcpy(&mins[(b * 8 + g) * N + n0], mbuf[g], sizeof(float) * tn);
    }
}

/* Q8_0: 34-byte blocks of 32 (ggml-common.h:209-214) -> i8 plane.
 * b here indexes PAIRS of 4 blocks (128 k-values) to amortize memcpys. */
static void q80_tile(const u8 *raw, i64 row_bytes, i64 b, i64 n0, int tn,
                     i64 N, i64 K, i8 *qs, float *scales) {
    i8 tbuf[128][TN];
    float sbuf[4][TN];
    i64 k0 = b * 128;
    int nrows = (int)(K - k0 < 128 ? K - k0 : 128);
    int nblk = nrows / 32;
    for (int c = 0; c < tn; c++) {
        const u8 *row = raw + (n0 + c) * row_bytes;
        for (int sb = 0; sb < nblk; sb++) {
            const u8 *blk = row + (k0 / 32 + sb) * 34;
            sbuf[sb][c] = f16_to_f32(*(const u16 *)blk);
            const i8 *q = (const i8 *)(blk + 2);
            for (int l = 0; l < 32; l++) tbuf[sb * 32 + l][c] = q[l];
        }
    }
    for (int r = 0; r < nrows; r++)
        memcpy(&qs[(k0 + r) * N + n0], tbuf[r], (size_t)tn);
    for (int sb = 0; sb < nblk; sb++)
        memcpy(&scales[(k0 / 32 + sb) * N + n0], sbuf[sb],
               sizeof(float) * tn);
}

/* Q6_K: 210-byte super-blocks of 256 (ggml-common.h:320-326) -> i8 plane */
static void q6k_tile(const u8 *raw, i64 row_bytes, i64 b, i64 n0, int tn,
                     i64 N, i8 *qs, float *scales) {
    i8 tbuf[256][TN];
    float sbuf[16][TN];
    for (int c = 0; c < tn; c++) {
        const u8 *blk = raw + (n0 + c) * row_bytes + b * 210;
        const u8 *ql = blk;
        const u8 *qh = blk + 128;
        const i8 *sc = (const i8 *)(blk + 192);
        float d = f16_to_f32(*(const u16 *)(blk + 208));
        for (int g = 0; g < 16; g++) sbuf[g][c] = d * (float)sc[g];
        for (int half = 0; half < 2; half++) {
            const u8 *qlh = ql + half * 64;
            const u8 *qhh = qh + half * 32;
            int kb = half * 128;
            for (int l = 0; l < 32; l++) {
                tbuf[kb + l][c] =
                    (i8)((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)) - 32;
                tbuf[kb + 32 + l][c] =
                    (i8)((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)) - 32;
                tbuf[kb + 64 + l][c] =
                    (i8)((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32;
                tbuf[kb + 96 + l][c] =
                    (i8)((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32;
            }
        }
    }
    for (int r = 0; r < 256; r++)
        memcpy(&qs[(b * 256 + r) * N + n0], tbuf[r], (size_t)tn);
    for (int g = 0; g < 16; g++)
        memcpy(&scales[(b * 16 + g) * N + n0], sbuf[g], sizeof(float) * tn);
}

/* Q4_0: 18-byte blocks of 32 (ggml-common.h:167-172) -> p4 plane, zp=8.
 * b indexes 256-value pack tiles (8 stored blocks): within the tile,
 * stored block sb covers k = sb*32..+32; value at k goes to packed row
 * k%128, nibble = (k<128 ? lo : hi). Stored byte q[l] of block sb: low
 * nibble = k sb*32+l, high = k sb*32+16+l. */
static void q40_tile(const u8 *raw, i64 row_bytes, i64 b, i64 n0, int tn,
                     i64 N, u8 *qs, float *scales) {
    u8 tbuf[128][TN];
    float sbuf[8][TN];
    for (int c = 0; c < tn; c++) {
        const u8 *row = raw + (n0 + c) * row_bytes;
        for (int sb = 0; sb < 8; sb++) {
            const u8 *blk = row + (b * 8 + sb) * 18;
            sbuf[sb][c] = f16_to_f32(*(const u16 *)blk);
            const u8 *q = blk + 2;
            int base = sb * 32;           /* k offset within the 256-tile */
            for (int l = 0; l < 16; l++) {
                int k1 = base + l, k2 = base + 16 + l;
                int r1 = k1 & 127, r2 = k2 & 127;
                u8 v1 = (u8)(q[l] & 0xF), v2 = (u8)(q[l] >> 4);
                if (sb < 4) {             /* k < 128: low nibble */
                    tbuf[r1][c] = (u8)((tbuf[r1][c] & 0xF0) | v1);
                    tbuf[r2][c] = (u8)((tbuf[r2][c] & 0xF0) | v2);
                } else {                  /* k >= 128: high nibble */
                    tbuf[r1][c] = (u8)((tbuf[r1][c] & 0x0F) | (v1 << 4));
                    tbuf[r2][c] = (u8)((tbuf[r2][c] & 0x0F) | (v2 << 4));
                }
            }
        }
    }
    for (int r = 0; r < 128; r++)
        memcpy(&qs[(b * 128 + r) * N + n0], tbuf[r], (size_t)tn);
    for (int sb = 0; sb < 8; sb++)
        memcpy(&scales[(b * 8 + sb) * N + n0], sbuf[sb], sizeof(float) * tn);
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
    i64 nsuper = (j->type == 8) ? (j->K + 127) / 128 : j->K / 256;
    for (i64 n = j->n0; n < j->n1; n += TN) {
        int tn = (int)(j->n1 - n < TN ? j->n1 - n : TN);
        for (i64 b = 0; b < nsuper; b++) {
            switch (j->type) {
            case 12: q4k_tile(j->raw, j->row_bytes, b, n, tn, j->N,
                              (u8 *)j->qs, j->scales, j->mins); break;
            case 8:  q80_tile(j->raw, j->row_bytes, b, n, tn, j->N, j->K,
                              (i8 *)j->qs, j->scales); break;
            case 14: q6k_tile(j->raw, j->row_bytes, b, n, tn, j->N,
                              (i8 *)j->qs, j->scales); break;
            case 2:  q40_tile(j->raw, j->row_bytes, b, n, tn, j->N,
                              (u8 *)j->qs, j->scales); break;
            }
        }
    }
    return 0;
}

/* entry point: returns 0 on success, -1 on unsupported type/layout */
int unpack_planes(int type, const u8 *raw, i64 row_bytes, i64 N, i64 K,
                  void *qs, float *scales, float *mins, int pack_tk,
                  int n_threads) {
    if (type != 12 && type != 8 && type != 14 && type != 2) return -1;
    /* p4 tiling above assumes the 256-value pack tile */
    if ((type == 12 || type == 2) && pack_tk != 256) return -1;
    if ((type == 12 || type == 14 || type == 2) && (K % 256)) return -1;
    if (type == 8 && (K % 32)) return -1;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;

    /* thread ranges snap to TN-column tiles */
    i64 ntiles = (N + TN - 1) / TN;
    if (n_threads > ntiles) n_threads = (int)ntiles;

    pthread_t tids[64];
    job_t jobs[64];
    i64 chunk = (ntiles + n_threads - 1) / n_threads * TN;
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
