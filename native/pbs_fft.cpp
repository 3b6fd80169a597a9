// Single-thread f64 negacyclic-FFT programmable bootstrap (64-bit torus).
//
// Purpose (VERDICT r3 missing #2 / next #5): a MEASURED same-machine CPU
// denominator for BASELINE.md.  The reference binary (tfhe-rs 0.2 +
// concrete-fft 0.1, Cargo.lock) cannot run here (no Rust toolchain), so this
// re-implements its compute recipe — the split-complex f64 negacyclic FFT
// external product (the same algorithm analyzed in ops/pbs_fft.py) — as
// plain C++ at the reference parameter point PARAM_MESSAGE_2_CARRY_2
// (n=742, k=1, N=2048, l=1, base 2^23, ks 3/5; values ground-truth-verified
// against /root/reference/test_data/client_key by crypto/refkey.py).
//
// Gadget/row conventions mirror crypto/glwe.py + crypto/golden.py exactly
// (balanced signed digits, rows ordered (comp, level), digit j of weight
// q/B^(j+1)), so the same bsk/ksk arrays drive both; correctness is
// decrypt-gated from Python (benchmarks/cpu_baseline.py).  The f64 transform
// carries the usual concrete-fft rounding floor (~2^30-2^38 for full-torus
// operands at N=2048) — far below the 64-bit LUT margin delta/2 = 2^58,
// same argument as the reference's own FFT.
//
// Build: make -C native   (g++ -O2; single thread by construction)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr double PI = 3.14159265358979323846264338327950288;

struct Cplx { double re, im; };

static inline Cplx cmul(Cplx a, Cplx b) {
    return {a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re};
}
static inline Cplx cadd(Cplx a, Cplx b) { return {a.re + b.re, a.im + b.im}; }
static inline Cplx csub(Cplx a, Cplx b) { return {a.re - b.re, a.im - b.im}; }

// Iterative radix-2 FFT over C^H (H a power of two), in place.
struct Fft {
    int H;
    int *rev;
    // per-stage CONTIGUOUS twiddles: stage with half-length m stores its m
    // twiddles at [m] (the classic "w_tab[m + j]" layout) — sequential
    // reads instead of the strided j*step walk, ~1.7x on this core
    Cplx *w_fwd, *w_inv;

    explicit Fft(int H_) : H(H_) {
        rev = (int *)malloc(sizeof(int) * H);
        int lg = 0;
        while ((1 << lg) < H) lg++;
        for (int i = 0; i < H; i++) {
            int r = 0;
            for (int b = 0; b < lg; b++) r |= ((i >> b) & 1) << (lg - 1 - b);
            rev[i] = r;
        }
        w_fwd = (Cplx *)malloc(sizeof(Cplx) * 2 * H);
        w_inv = (Cplx *)malloc(sizeof(Cplx) * 2 * H);
        for (int m = 1; m < H; m <<= 1)
            for (int j = 0; j < m; j++) {
                double ang = -PI * j / m;
                w_fwd[m + j] = {std::cos(ang), std::sin(ang)};
                w_inv[m + j] = {std::cos(-ang), std::sin(-ang)};
            }
    }
    ~Fft() { free(rev); free(w_fwd); free(w_inv); }

    void run(Cplx *a, bool inverse) const {
        for (int i = 0; i < H; i++)
            if (i < rev[i]) { Cplx t = a[i]; a[i] = a[rev[i]]; a[rev[i]] = t; }
        const Cplx *tw = inverse ? w_inv : w_fwd;
        for (int m = 1; m < H; m <<= 1) {
            const Cplx *w = tw + m;
            for (int i = 0; i < H; i += 2 * m) {
                Cplx *lo = a + i, *hi = a + i + m;
                for (int j = 0; j < m; j++) {
                    Cplx u = lo[j], v = cmul(hi[j], w[j]);
                    lo[j] = cadd(u, v);
                    hi[j] = csub(u, v);
                }
            }
        }
        if (inverse) {
            double s = 1.0 / H;
            for (int i = 0; i < H; i++) { a[i].re *= s; a[i].im *= s; }
        }
    }
};

// Split-complex negacyclic transform: a real length-N negacyclic poly is
// evaluated at the N/2 odd roots zeta^(4t+1) (zeta = e^{-i pi/N}); the
// other half are conjugates.  Forward: z_j = (p_j - i p_{j+H}) zeta^j,
// then FFT_H.  Inverse: IFFT_H, untwist by zeta^{-j}, read (re, -im).
struct NegacyclicFft {
    int N, H;
    Fft fft;
    Cplx *twist, *untwist;

    explicit NegacyclicFft(int N_) : N(N_), H(N_ / 2), fft(N_ / 2) {
        twist = (Cplx *)malloc(sizeof(Cplx) * H);
        untwist = (Cplx *)malloc(sizeof(Cplx) * H);
        for (int j = 0; j < H; j++) {
            double ang = -PI * j / N;
            twist[j] = {std::cos(ang), std::sin(ang)};
            untwist[j] = {std::cos(-ang), std::sin(-ang)};
        }
    }
    ~NegacyclicFft() { free(twist); free(untwist); }

    // p: signed torus values (centered int64 view of uint64)
    void forward_i64(const int64_t *p, Cplx *out) const {
        for (int j = 0; j < H; j++) {
            Cplx z = {(double)p[j], -(double)p[j + H]};
            out[j] = cmul(z, twist[j]);
        }
        fft.run(out, false);
    }
    void forward_i32(const int32_t *p, Cplx *out) const {
        for (int j = 0; j < H; j++) {
            Cplx z = {(double)p[j], -(double)p[j + H]};
            out[j] = cmul(z, twist[j]);
        }
        fft.run(out, false);
    }
    // spectrum -> real negacyclic coefficients, reduced mod 2^64.
    // Reduction via fma: qr = nearbyint(x/Q); fma(-qr, Q, x) is the exact
    // residual x - qr*Q rounded once (ulp <= 2^11 at |r| <= 2^63), with a
    // conditional +-Q fix for half-integer quotients.  This is branch-free
    // hot-path arithmetic — the earlier fmod/floor formulation hit libm
    // slow paths on the 2^90+-magnitude accumulations and dominated the
    // whole PBS (measured 577 -> ~90 ms/PBS).  Total reduction error is
    // ~2^11 per coefficient — noise-wise invisible under the 2^58 margin.
    void inverse_to_u64(Cplx *spec, uint64_t *out) const {
        fft.run(spec, true);
        const double Q = 18446744073709551616.0;    // 2^64
        const double INVQ = 1.0 / 18446744073709551616.0;
        const double HQ = 9223372036854775808.0;    // 2^63
        auto reduce = [&](double x) -> uint64_t {
            double qr = std::nearbyint(x * INVQ);
            double r = std::fma(-qr, Q, x);
            if (r >= HQ) r -= Q;
            if (r < -HQ) r += Q;
            return (uint64_t)(int64_t)std::llrint(r);
        };
        for (int j = 0; j < H; j++) {
            Cplx w = cmul(spec[j], untwist[j]);
            out[j] = reduce(w.re);
            out[j + H] = reduce(-w.im);
        }
    }
};

struct PbsState {
    int n, k, N, l, base_log;
    NegacyclicFft *tf;
    Cplx *bsk_fft;     // [n][(k+1)l][(k+1)][H]
    Cplx *scratch_d;   // digit spectra [(k+1)l][H]
    Cplx *scratch_a;   // accumulator spectrum [H]
    int64_t *poly_i64; // [N]
    uint64_t *acc;     // [(k+1)][N]
    uint64_t *diff;    // [N]
    int32_t *digits;   // [N]
};

static inline void negacyclic_rotate_u64(const uint64_t *p, int r, int N,
                                         uint64_t *out) {
    // X^r * p mod (X^N + 1), r in [0, 2N)
    r &= 2 * N - 1;
    for (int t = 0; t < N; t++) {
        int src = t - r;
        // destination t takes p[src] with sign flips per wrap
        int s = src & (2 * N - 1);
        if (s < 0) s += 2 * N;
        uint64_t v = p[s & (N - 1)];
        if (s >= N) v = (uint64_t)(0) - v;
        out[t] = v;
    }
}

}  // namespace

extern "C" {

void *pbsfft_prepare(const uint64_t *bsk, int n, int k, int N, int l,
                     int base_log) {
    PbsState *st = new PbsState();
    st->n = n; st->k = k; st->N = N; st->l = l; st->base_log = base_log;
    st->tf = new NegacyclicFft(N);
    int H = N / 2;
    int rows = (k + 1) * l, k1 = k + 1;
    size_t total = (size_t)n * rows * k1 * H;
    st->bsk_fft = (Cplx *)malloc(sizeof(Cplx) * total);
    int64_t *tmp = (int64_t *)malloc(sizeof(int64_t) * N);
    for (int i = 0; i < n; i++)
        for (int r = 0; r < rows; r++)
            for (int c = 0; c < k1; c++) {
                const uint64_t *p =
                    bsk + (((size_t)i * rows + r) * k1 + c) * N;
                for (int t = 0; t < N; t++) tmp[t] = (int64_t)p[t];
                st->tf->forward_i64(
                    tmp, st->bsk_fft + (((size_t)i * rows + r) * k1 + c) * H);
            }
    free(tmp);
    st->scratch_d = (Cplx *)malloc(sizeof(Cplx) * rows * H);
    st->scratch_a = (Cplx *)malloc(sizeof(Cplx) * H);
    st->poly_i64 = (int64_t *)malloc(sizeof(int64_t) * N);
    st->acc = (uint64_t *)malloc(sizeof(uint64_t) * k1 * N);
    st->diff = (uint64_t *)malloc(sizeof(uint64_t) * N);
    st->digits = (int32_t *)malloc(sizeof(int32_t) * N);
    return st;
}

void pbsfft_free(void *h) {
    PbsState *st = (PbsState *)h;
    delete st->tf;
    free(st->bsk_fft); free(st->scratch_d); free(st->scratch_a);
    free(st->poly_i64); free(st->acc); free(st->diff); free(st->digits);
    delete st;
}

// One full PBS: ct_in [n+1] u64 -> ct_out [n+1] u64 (keyswitched).
// ksk: [kN][ks_level][n+1] u64 (crypto/glwe.py gen_keyswitch_key layout).
void pbsfft_pbs(void *h, const uint64_t *ksk, int ks_base_log, int ks_level,
                const uint64_t *ct_in, const uint64_t *lut,
                uint64_t *ct_out) {
    PbsState *st = (PbsState *)h;
    const int n = st->n, k = st->k, N = st->N, l = st->l;
    const int k1 = k + 1, rows = k1 * l, H = N / 2;
    const int lgN = __builtin_ctz((unsigned)N);

    // ---- mod switch q = 2^64 -> 2N ----
    const int shift = 64 - (lgN + 1);
    auto ms = [&](uint64_t x) -> int {
        return (int)(((x + (1ull << (shift - 1))) >> shift) & (2 * N - 1));
    };

    // ---- acc init: [0.., X^{-b~} * lut] ----
    std::memset(st->acc, 0, sizeof(uint64_t) * k * N);
    negacyclic_rotate_u64(lut, (2 * N - ms(ct_in[n])) & (2 * N - 1), N,
                          st->acc + (size_t)k * N);

    // ---- CMUX ladder ----
    const int B = 1 << st->base_log;
    const int half = B / 2;
    const int dshift = 64 - st->base_log * l;
    for (int i = 0; i < n; i++) {
        int a_i = ms(ct_in[i]);
        if (a_i == 0) continue;
        // decompose diff of every component into digit spectra
        // (level-major: digit j of weight q/B^(j+1), MSD-first rows —
        // crypto/glwe.py decompose_balanced conventions; l = 1 at the
        // reference point so the per-level recompute costs nothing)
        for (int comp = 0; comp < k1; comp++) {
            uint64_t *accc = st->acc + (size_t)comp * N;
            negacyclic_rotate_u64(accc, a_i, N, st->diff);
            if (l == 1) {
                // reference point: one balanced digit = the (sign-fixed)
                // top base_log bits — branch-free, auto-vectorizes
                for (int t = 0; t < N; t++) {
                    uint64_t d = st->diff[t] - accc[t];
                    int32_t dj = (int32_t)((d + (1ull << (dshift - 1)))
                                           >> dshift) & (B - 1);
                    st->digits[t] = dj - ((dj >= half) ? B : 0);
                }
                st->tf->forward_i32(st->digits,
                                    st->scratch_d + (size_t)(comp * l) * H);
            } else for (int j = 0; j < l; j++) {
                for (int t = 0; t < N; t++) {
                    uint64_t d = st->diff[t] - accc[t];
                    uint64_t state = (d + (1ull << (dshift - 1))) >> dshift;
                    int64_t s = (int64_t)state;
                    int32_t dj = 0;
                    for (int jj = l - 1; jj >= j; jj--) {
                        dj = (int32_t)(s & (B - 1));
                        if (dj >= half) dj -= B;
                        s = (s - dj) >> st->base_log;
                    }
                    st->digits[t] = dj;
                }
                st->tf->forward_i32(st->digits,
                                    st->scratch_d + (size_t)(comp * l + j) * H);
            }
        }
        // accumulate rows x bsk spectra per output component
        for (int c = 0; c < k1; c++) {
            for (int t = 0; t < H; t++) st->scratch_a[t] = {0.0, 0.0};
            for (int r = 0; r < rows; r++) {
                const Cplx *bf =
                    st->bsk_fft + (((size_t)i * rows + r) * k1 + c) * H;
                const Cplx *df = st->scratch_d + (size_t)r * H;
                for (int t = 0; t < H; t++)
                    st->scratch_a[t] = cadd(st->scratch_a[t],
                                            cmul(df[t], bf[t]));
            }
            uint64_t *prod = st->diff;  // reuse as N-sized temp
            st->tf->inverse_to_u64(st->scratch_a, prod);
            uint64_t *accc = st->acc + (size_t)c * N;
            for (int t = 0; t < N; t++) accc[t] += prod[t];
        }
    }

    // ---- sample extract (coefficient 0) ----
    const size_t kN = (size_t)k * N;
    uint64_t *big = (uint64_t *)malloc(sizeof(uint64_t) * (kN + 1));
    for (int c = 0; c < k; c++) {
        const uint64_t *a = st->acc + (size_t)c * N;
        big[(size_t)c * N] = a[0];
        for (int t = 1; t < N; t++)
            big[(size_t)c * N + t] = (uint64_t)0 - a[N - t];
    }
    big[kN] = st->acc[(size_t)k * N];

    // ---- keyswitch kN -> n (exact integer) ----
    const int Bks = 1 << ks_base_log;
    const int hks = Bks / 2;
    const int ksshift = 64 - ks_base_log * ks_level;
    for (int t = 0; t <= n; t++) ct_out[t] = 0;
    ct_out[n] = big[kN];
    for (size_t t = 0; t < kN; t++) {
        uint64_t state64 = (big[t] + (1ull << (ksshift - 1))) >> ksshift;
        int64_t s = (int64_t)state64;
        int32_t dig[16];
        for (int j = ks_level - 1; j >= 0; j--) {
            int32_t dj = (int32_t)(s & (Bks - 1));
            if (dj >= hks) dj -= Bks;
            s = (s - dj) >> ks_base_log;
            dig[j] = dj;
        }
        for (int j = 0; j < ks_level; j++) {
            if (dig[j] == 0) continue;
            const uint64_t *row = ksk + (t * ks_level + j) * (size_t)(n + 1);
            uint64_t dj = (uint64_t)(int64_t)dig[j];
            for (int c = 0; c <= n; c++) ct_out[c] -= dj * row[c];
        }
    }
    free(big);
}

}  // extern "C"
