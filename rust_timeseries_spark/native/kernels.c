/* Native fast paths for the engine's two measured CPU ceilings
 * (BENCH/BASELINE.md §3a): the per-value bit-packing loops of the
 * delta-of-delta / Gorilla block codecs (functions/compression.py) and
 * the per-step ACD(1,1) psi / dpsi recursions (operators/recursion.py,
 * stats/acd.py — replicating src/duration/core/psi.rs:576-604,690-717).
 *
 * CONTRACT: every function here is BIT/BYTE-IDENTICAL to its pure-Python
 * counterpart.  The float kernels use the same IEEE-754 double op
 * sequence as the Python code (x86-64 SSE2 doubles == CPython floats);
 * the build deliberately passes -ffp-contract=off and no -ffast-math so
 * the compiler cannot fuse a*b+c into an FMA or reassociate sums.
 * tests/test_compression.py and tests/test_recursion.py assert the
 * equivalence against the pure-Python paths on every run where the
 * native library is present.
 *
 * Compiled on demand by rust_timeseries_spark/native/__init__.py via the
 * system C compiler; absent a compiler the engine transparently runs the
 * pure-Python paths.
 */

#include <stdint.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* MSB-first bit writer (mirrors compression.BitWriter)                */
/* ------------------------------------------------------------------ */

typedef struct {
    uint8_t *buf;
    int64_t nbytes;   /* whole bytes flushed */
    uint64_t acc;     /* pending bits, right-aligned */
    int nbits;        /* number of pending bits (< 8 after flush) */
} BitWriter;

static void bw_init(BitWriter *w, uint8_t *buf) {
    w->buf = buf;
    w->nbytes = 0;
    w->acc = 0;
    w->nbits = 0;
}

/* write nbits (1..32) of value, MSB-first */
static void bw_write32(BitWriter *w, uint32_t value, int nbits) {
    w->acc = (w->acc << nbits) | (value & ((nbits == 32) ? 0xFFFFFFFFu : ((1u << nbits) - 1u)));
    w->nbits += nbits;
    while (w->nbits >= 8) {
        w->nbits -= 8;
        w->buf[w->nbytes++] = (uint8_t)((w->acc >> w->nbits) & 0xFF);
    }
    w->acc &= (w->nbits == 0) ? 0 : ((1ull << w->nbits) - 1ull);
}

/* write nbits (1..64) of value, MSB-first */
static void bw_write(BitWriter *w, uint64_t value, int nbits) {
    if (nbits > 32) {
        bw_write32(w, (uint32_t)(value >> 32), nbits - 32);
        bw_write32(w, (uint32_t)(value & 0xFFFFFFFFull), 32);
    } else if (nbits > 0) {
        bw_write32(w, (uint32_t)(value & 0xFFFFFFFFull), nbits);
    }
}

/* flush trailing partial byte (left-aligned, zero-padded) */
static int64_t bw_finish(BitWriter *w) {
    if (w->nbits) {
        w->buf[w->nbytes++] = (uint8_t)((w->acc << (8 - w->nbits)) & 0xFF);
        w->acc = 0;
        w->nbits = 0;
    }
    return w->nbytes;
}

static void bw_varint(BitWriter *w, uint64_t u) {
    for (;;) {
        uint32_t b = (uint32_t)(u & 0x7F);
        u >>= 7;
        if (u) {
            bw_write32(w, 0x80u | b, 8);
        } else {
            bw_write32(w, b, 8);
            return;
        }
    }
}

/* ------------------------------------------------------------------ */
/* MSB-first bit reader (mirrors compression.BitReader)                */
/* ------------------------------------------------------------------ */

typedef struct {
    const uint8_t *data;
    int64_t pos;      /* bit position */
    int64_t end_bits; /* total bits available */
    int err;          /* set on any out-of-bounds read */
} BitReader;

/* bounds-checked read: a truncated/corrupt blob sets err and yields 0,
 * mirroring the Python BitReader's IndexError (surfaced as a negative
 * return from the decode entry points below) */
static uint64_t br_read(BitReader *r, int nbits) {
    uint64_t out = 0;
    int64_t pos = r->pos;
    int remaining = nbits;
    if (r->err || pos + nbits > r->end_bits) {
        r->err = 1;
        return 0;
    }
    while (remaining > 0) {
        int64_t byte_idx = pos >> 3;
        int bit_idx = (int)(pos & 7);
        int avail = 8 - bit_idx;
        int take = avail < remaining ? avail : remaining;
        uint64_t chunk = (uint64_t)((r->data[byte_idx] >> (avail - take)) & ((1u << take) - 1u));
        out = (out << take) | chunk;
        pos += take;
        remaining -= take;
    }
    r->pos = pos;
    return out;
}

static uint64_t br_varint(BitReader *r) {
    uint64_t out = 0;
    int shift = 0;
    for (;;) {
        uint64_t b = br_read(r, 8);
        if (r->err) return 0;
        out |= (b & 0x7F) << shift;
        if (!(b & 0x80)) return out;
        shift += 7;
        if (shift > 63) { /* corrupt continuation chain */
            r->err = 1;
            return 0;
        }
    }
}

static uint64_t zigzag_enc(int64_t v) {
    return ((uint64_t)v << 1) ^ (uint64_t)(v >> 63);
}

static int64_t zigzag_dec(uint64_t u) {
    return (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
}

/* ------------------------------------------------------------------ */
/* delta-of-delta int64 codec (compression.encode/decode_dod_int64)    */
/* ------------------------------------------------------------------ */

/* returns encoded byte count; out must hold >= 20 + 9*n bytes */
int64_t rts_encode_dod_int64(const int64_t *v, int64_t n, uint8_t *out) {
    BitWriter w;
    bw_init(&w, out);
    bw_varint(&w, (uint64_t)n);
    if (n == 0) return bw_finish(&w);
    bw_write(&w, (uint64_t)v[0], 64);
    if (n == 1) return bw_finish(&w);
    /* deltas/dods wrap mod 2^64 exactly like numpy int64 */
    uint64_t d_prev = (uint64_t)v[1] - (uint64_t)v[0];
    bw_varint(&w, zigzag_enc((int64_t)d_prev));
    for (int64_t i = 2; i < n; i++) {
        uint64_t d = (uint64_t)v[i] - (uint64_t)v[i - 1];
        int64_t dod = (int64_t)(d - d_prev);
        d_prev = d;
        if (dod == 0) {
            bw_write32(&w, 0, 1);
        } else if (dod >= -64 && dod < 64) {
            bw_write32(&w, 0b10, 2);
            bw_write32(&w, (uint32_t)(dod + 64), 7);
        } else if (dod >= -256 && dod < 256) {
            bw_write32(&w, 0b110, 3);
            bw_write32(&w, (uint32_t)(dod + 256), 9);
        } else if (dod >= -2048 && dod < 2048) {
            bw_write32(&w, 0b1110, 4);
            bw_write32(&w, (uint32_t)(dod + 2048), 12);
        } else {
            bw_write32(&w, 0b1111, 4);
            bw_write(&w, (uint64_t)dod, 64);
        }
    }
    return bw_finish(&w);
}

/* out must hold n int64 where n was read from the blob header
 * (rts_blob_count); returns number of values written, or -1 on a
 * truncated/corrupt blob */
int64_t rts_decode_dod_int64(const uint8_t *blob, int64_t blob_len, int64_t *out) {
    BitReader r = {blob, 0, blob_len * 8, 0};
    int64_t n = (int64_t)br_varint(&r);
    if (r.err) return -1;
    if (n == 0) return 0;
    uint64_t cur = br_read(&r, 64);
    if (r.err) return -1;
    out[0] = (int64_t)cur;
    if (n == 1) return 1;
    uint64_t delta = (uint64_t)zigzag_dec(br_varint(&r));
    cur += delta;
    out[1] = (int64_t)cur;
    for (int64_t i = 2; i < n; i++) {
        uint64_t dod;
        if (br_read(&r, 1) == 0) {
            dod = 0;
        } else if (br_read(&r, 1) == 0) {
            dod = br_read(&r, 7) - 64;
        } else if (br_read(&r, 1) == 0) {
            dod = br_read(&r, 9) - 256;
        } else if (br_read(&r, 1) == 0) {
            dod = br_read(&r, 12) - 2048;
        } else {
            dod = br_read(&r, 64);
        }
        delta += dod;
        cur += delta;
        out[i] = (int64_t)cur;
    }
    return r.err ? -1 : n;
}

/* value count from a blob header (shared varint layout); -1 if the
 * header itself is truncated/corrupt */
int64_t rts_blob_count(const uint8_t *blob, int64_t blob_len) {
    BitReader r = {blob, 0, blob_len * 8, 0};
    int64_t n = (int64_t)br_varint(&r);
    return r.err ? -1 : n;
}

/* ------------------------------------------------------------------ */
/* Gorilla XOR float64 codec                                           */
/* ------------------------------------------------------------------ */

/* values passed as raw uint64 bit patterns; out >= 20 + 10*n bytes */
int64_t rts_encode_gorilla_f64(const uint64_t *bits, int64_t n, uint8_t *out) {
    BitWriter w;
    bw_init(&w, out);
    bw_varint(&w, (uint64_t)n);
    if (n == 0) return bw_finish(&w);
    bw_write(&w, bits[0], 64);
    if (n == 1) return bw_finish(&w);
    int prev_lead = 65, prev_mean = 0;
    for (int64_t i = 1; i < n; i++) {
        uint64_t x = bits[i] ^ bits[i - 1];
        if (x == 0) {
            bw_write32(&w, 0, 1);
            continue;
        }
        int lead = __builtin_clzll(x);
        if (lead > 31) lead = 31;
        int trail = __builtin_ctzll(x);
        int mean = 64 - lead - trail;
        if (lead >= prev_lead && prev_lead + prev_mean + trail >= 64 && prev_lead != 65) {
            bw_write32(&w, 0b10, 2);
            bw_write(&w, x >> (64 - prev_lead - prev_mean), prev_mean);
        } else {
            bw_write32(&w, 0b11, 2);
            bw_write32(&w, (uint32_t)lead, 5);
            bw_write32(&w, (uint32_t)(mean & 63), 6);
            bw_write(&w, x >> trail, mean);
            prev_lead = lead;
            prev_mean = mean;
        }
    }
    return bw_finish(&w);
}

/* out must hold n uint64 (n = rts_blob_count); -1 on truncated blob */
int64_t rts_decode_gorilla_f64(const uint8_t *blob, int64_t blob_len, uint64_t *out) {
    BitReader r = {blob, 0, blob_len * 8, 0};
    int64_t n = (int64_t)br_varint(&r);
    if (r.err) return -1;
    if (n == 0) return 0;
    uint64_t prev = br_read(&r, 64);
    if (r.err) return -1;
    out[0] = prev;
    int lead = 0, mean = 0;
    for (int64_t i = 1; i < n; i++) {
        if (br_read(&r, 1) == 0) {
            out[i] = prev;
            continue;
        }
        if (br_read(&r, 1) == 1) {
            lead = (int)br_read(&r, 5);
            mean = (int)br_read(&r, 6);
            if (mean == 0) mean = 64;
        }
        int sh = 64 - lead - mean; /* >= 0 on any well-formed blob */
        if (sh < 0) return -1;     /* malformed header: fail loudly like
                                      the Python BitReader, never emit
                                      silently-corrupted values */
        uint64_t x = br_read(&r, mean) << sh;
        prev ^= x;
        out[i] = prev;
    }
    return r.err ? -1 : n;
}

/* ------------------------------------------------------------------ */
/* ACD(1,1) psi recursion — recursion.psi_recursion_np fast path       */
/* (psi.rs:576-604).  Identical op sequence:                           */
/*   t==0: sum_alpha = a0*di0 + 0.0                                    */
/*   t> 0: sum_alpha = 0.0 + a0*x[t-1]                                 */
/*   psi  = om + sum_alpha + b0*psi_prev, clamped to [gmin, gmax]      */
/* ------------------------------------------------------------------ */

void rts_psi11(const double *x, int64_t n, double om, double a0, double b0,
               double psi0, double di0, double gmin, double gmax, double *out) {
    double psi_prev = psi0;
    for (int64_t t = 0; t < n; t++) {
        double sum_alpha = (t == 0) ? (a0 * di0 + 0.0) : (0.0 + a0 * x[t - 1]);
        double new_psi = om + sum_alpha + b0 * psi_prev;
        if (new_psi < gmin) new_psi = gmin;
        else if (new_psi > gmax) new_psi = gmax;
        out[t] = new_psi;
        psi_prev = new_psi;
    }
}

/* ------------------------------------------------------------------ */
/* ACD(1,1) dpsi recursion — acd._deriv_and_psi fast path              */
/* (psi.rs:690-717).  deriv is (n+1) x 3 row-major; row 0 is the       */
/* pre-sample row (already filled by the caller); rows 1..n are        */
/* written here.  psi_buf has length n+1 (pre-sample + in-sample).     */
/* ------------------------------------------------------------------ */

void rts_dpsi11(const double *x, int64_t n, const double *psi_buf,
                double om, double a0, double b0, double denom, int uncond,
                double di0, double *deriv) {
    double d_prev0 = deriv[0], d_prev1 = deriv[1], d_prev2 = deriv[2];
    for (int64_t t = 0; t < n; t++) {
        double r0, r1, r2;
        if (t == 0) {
            double alpha_sum = uncond ? a0 : 0.0;
            double pdd = (alpha_sum * om) / (denom * denom);
            r0 = 1.0 + alpha_sum / denom;
            r1 = di0 + pdd;
            r2 = psi_buf[t] + pdd;
        } else {
            r0 = 1.0;
            r1 = x[t - 1] + 0.0;
            r2 = psi_buf[t] + 0.0;
        }
        r0 = r0 + b0 * d_prev0;
        r1 = r1 + b0 * d_prev1;
        r2 = r2 + b0 * d_prev2;
        double *row = deriv + 3 * (1 + t);
        row[0] = r0;
        row[1] = r1;
        row[2] = r2;
        d_prev0 = r0;
        d_prev1 = r1;
        d_prev2 = r2;
    }
}
