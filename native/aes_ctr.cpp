// AES-128-CTR keystream generator — the native CSPRNG backing client-side
// randomness (key generation, mask sampling, noise), replacing the
// reference stack's concrete-csprng 0.3.0 (AES-CTR based; SURVEY.md N11).
//
// Table-free, constant-time-ish software AES (no AES-NI requirement so the
// same binary runs on any build host).  Exposed as a C ABI for ctypes.
//
// Build: make -C native   (produces libfheregex.so)

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

uint8_t xtime(uint8_t x) { return static_cast<uint8_t>((x << 1) ^ ((x >> 7) * 0x1B)); }

// S-box computed at init (from multiplicative inverse + affine transform),
// stored in a static table.
uint8_t SBOX[256];
bool sbox_ready = false;

uint8_t gmul(uint8_t a, uint8_t b) {
    uint8_t p = 0;
    for (int i = 0; i < 8; i++) {
        if (b & 1) p ^= a;
        a = xtime(a);
        b >>= 1;
    }
    return p;
}

void init_sbox() {
    if (sbox_ready) return;
    // brute-force inverses in GF(2^8)
    uint8_t inv[256];
    inv[0] = 0;
    for (int a = 1; a < 256; a++) {
        for (int b = 1; b < 256; b++) {
            if (gmul(static_cast<uint8_t>(a), static_cast<uint8_t>(b)) == 1) {
                inv[a] = static_cast<uint8_t>(b);
                break;
            }
        }
    }
    for (int i = 0; i < 256; i++) {
        uint8_t x = inv[i];
        uint8_t y = static_cast<uint8_t>(
            x ^ (uint8_t)((x << 1) | (x >> 7)) ^ (uint8_t)((x << 2) | (x >> 6)) ^
            (uint8_t)((x << 3) | (x >> 5)) ^ (uint8_t)((x << 4) | (x >> 4)) ^ 0x63);
        SBOX[i] = y;
    }
    sbox_ready = true;
}

struct AesKey {
    uint8_t rk[11][16];
};

void expand_key(const uint8_t key[16], AesKey* ek) {
    init_sbox();
    std::memcpy(ek->rk[0], key, 16);
    uint8_t rcon = 1;
    for (int r = 1; r <= 10; r++) {
        uint8_t* prev = ek->rk[r - 1];
        uint8_t* cur = ek->rk[r];
        uint8_t t[4] = {SBOX[prev[13]], SBOX[prev[14]], SBOX[prev[15]], SBOX[prev[12]]};
        t[0] ^= rcon;
        rcon = xtime(rcon);
        for (int i = 0; i < 4; i++) cur[i] = prev[i] ^ t[i];
        for (int i = 4; i < 16; i++) cur[i] = prev[i] ^ cur[i - 4];
    }
}

void sub_shift(uint8_t s[16]) {
    uint8_t t[16];
    // SubBytes + ShiftRows fused (column-major state layout)
    static const int map[16] = {0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11};
    for (int i = 0; i < 16; i++) t[i] = SBOX[s[map[i]]];
    std::memcpy(s, t, 16);
}

void mix_columns(uint8_t s[16]) {
    for (int c = 0; c < 4; c++) {
        uint8_t* p = s + 4 * c;
        uint8_t a0 = p[0], a1 = p[1], a2 = p[2], a3 = p[3];
        uint8_t x = a0 ^ a1 ^ a2 ^ a3;
        p[0] = static_cast<uint8_t>(a0 ^ x ^ xtime(a0 ^ a1));
        p[1] = static_cast<uint8_t>(a1 ^ x ^ xtime(a1 ^ a2));
        p[2] = static_cast<uint8_t>(a2 ^ x ^ xtime(a2 ^ a3));
        p[3] = static_cast<uint8_t>(a3 ^ x ^ xtime(a3 ^ a0));
    }
}

void add_rk(uint8_t s[16], const uint8_t rk[16]) {
    for (int i = 0; i < 16; i++) s[i] ^= rk[i];
}

void encrypt_block(const AesKey* ek, const uint8_t in[16], uint8_t out[16]) {
    uint8_t s[16];
    std::memcpy(s, in, 16);
    add_rk(s, ek->rk[0]);
    for (int r = 1; r < 10; r++) {
        sub_shift(s);
        mix_columns(s);
        add_rk(s, ek->rk[r]);
    }
    sub_shift(s);
    add_rk(s, ek->rk[10]);
    std::memcpy(out, s, 16);
}

}  // namespace

extern "C" {

// Fill `out` with nblocks*16 keystream bytes: AES-128(key, nonce||counter),
// counter starting at start_block (big-endian in the last 8 nonce bytes).
void aes128_ctr_keystream(const uint8_t key[16], const uint8_t nonce[8],
                          uint64_t start_block, uint8_t* out, size_t nblocks) {
    AesKey ek;
    expand_key(key, &ek);
    uint8_t ctr_block[16];
    std::memcpy(ctr_block, nonce, 8);
    for (size_t i = 0; i < nblocks; i++) {
        uint64_t ctr = start_block + i;
        for (int b = 0; b < 8; b++)
            ctr_block[8 + b] = static_cast<uint8_t>(ctr >> (56 - 8 * b));
        encrypt_block(&ek, ctr_block, out + 16 * i);
    }
}

// Single-block AES-128 encryption (for test vectors).
void aes128_encrypt_block(const uint8_t key[16], const uint8_t in[16],
                          uint8_t out[16]) {
    AesKey ek;
    expand_key(key, &ek);
    encrypt_block(&ek, in, out);
}

}  // extern "C"
