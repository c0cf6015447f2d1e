// Measured stand-in for the reference's single-core build hot path.
//
// The image has no Rust toolchain, so ska.rust itself cannot be built and
// timed here. This program reproduces the reference's per-sample dictionary
// build loop faithfully enough to serve as the bench.py denominator:
//
//   * rolling split k-mer extraction, O(1) registers per base with
//     incremental forward and reverse-complement state and canonical
//     min(fwd, rc) selection   (split_kmer.rs:159-217, :281-295)
//   * per-base validity check  (bit_encoding.rs:52-54)
//   * hashmap insert with IUPAC merge on repeats (ska_dict.rs:76-113):
//     open-addressing swisstable-style flat map with an ahash-style
//     folded-multiply hash and doubling growth, i.e. the same data
//     structure class as hashbrown+ahash rather than a slower
//     std::unordered_map (which would flatter our ratio).
//
// Output: one line "<kmers> <seconds> <kmers_per_sec>".

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

static inline uint64_t ahash_mix(uint64_t x) {
    // folded multiply, the core of ahash's fallback path
    const unsigned __int128 m =
        (unsigned __int128)(x ^ 0x243f6a8885a308d3ull) * 0x13198a2e03707344ull;
    return (uint64_t)m ^ (uint64_t)(m >> 64);
}

// flat open-addressing map: u64 key -> u8 IUPAC ascii value
struct FlatMap {
    std::vector<uint64_t> keys;
    std::vector<uint8_t> vals;
    std::vector<uint8_t> used;
    size_t mask = 0, count = 0, limit = 0;

    explicit FlatMap(size_t cap0 = 1 << 10) { rehash(cap0); }

    void rehash(size_t cap) {
        std::vector<uint64_t> ok = std::move(keys);
        std::vector<uint8_t> ov = std::move(vals);
        std::vector<uint8_t> ou = std::move(used);
        keys.assign(cap, 0);
        vals.assign(cap, 0);
        used.assign(cap, 0);
        mask = cap - 1;
        limit = cap - cap / 4;  // 0.75 load factor
        count = 0;
        for (size_t i = 0; i < ou.size(); i++)
            if (ou[i]) insert_fresh(ok[i], ov[i]);
    }

    void insert_fresh(uint64_t k, uint8_t v) {
        size_t i = ahash_mix(k) & mask;
        while (used[i]) i = (i + 1) & mask;
        used[i] = 1;
        keys[i] = k;
        vals[i] = v;
        count++;
    }

    // returns pointer to the value slot (existing or fresh-initialized to 0)
    uint8_t* slot(uint64_t k, bool* fresh) {
        if (count >= limit) rehash((mask + 1) * 2);
        size_t i = ahash_mix(k) & mask;
        while (used[i]) {
            if (keys[i] == k) {
                *fresh = false;
                return &vals[i];
            }
            i = (i + 1) & mask;
        }
        used[i] = 1;
        keys[i] = k;
        count++;
        *fresh = true;
        return &vals[i];
    }
};

// IUPAC merge table: new 2-bit base code x existing ascii -> merged ascii
// (semantics of bit_encoding.rs:380-453: set union of bases)
static uint8_t IUPAC[4][256];
static const char* BASES = "ACTG";  // code order: A=00 C=01 T=10 G=11

static int set_of_ascii(uint8_t a) {
    switch (a) {
        case 'A': return 1; case 'C': return 2; case 'G': return 4; case 'T': return 8;
        case 'M': return 3; case 'R': return 5; case 'W': return 9; case 'S': return 6;
        case 'Y': return 10; case 'K': return 12; case 'V': return 7; case 'H': return 11;
        case 'D': return 13; case 'B': return 14; case 'N': return 15; default: return 0;
    }
}
static uint8_t ascii_of_set(int s) {
    static const char* t = "?ACMGRSVTWYHKDBN";
    return (uint8_t)t[s & 15];
}
static void init_iupac() {
    for (int code = 0; code < 4; code++) {
        int nb = set_of_ascii((uint8_t)BASES[code]);
        for (int a = 0; a < 256; a++) {
            int ex = set_of_ascii((uint8_t)a);
            IUPAC[code][a] = ex ? ascii_of_set(nb | ex) : ascii_of_set(nb);
        }
    }
}

int main(int argc, char** argv) {
    const int k = argc > 1 ? atoi(argv[1]) : 31;
    const long L = argc > 2 ? atol(argv[2]) : (4l << 20);
    const int S = argc > 3 ? atoi(argv[3]) : 2;
    const int h = (k - 1) / 2;

    init_iupac();

    // random ACGT genomes
    std::mt19937_64 rng(1);
    std::vector<std::vector<uint8_t>> genomes(S);
    const char* acgt = "ACGT";
    for (int s = 0; s < S; s++) {
        genomes[s].resize(L);
        for (long i = 0; i < L; i++) genomes[s][i] = (uint8_t)acgt[rng() & 3];
    }

    const uint64_t kmask = (k < 32) ? ((1ull << (2 * k)) - 1) : ~0ull;
    const uint64_t lowmask = (1ull << (2 * h)) - 1;
    long total_kmers = 0;

    auto t0 = std::chrono::steady_clock::now();
    for (int s = 0; s < S; s++) {
        FlatMap dict;
        const uint8_t* g = genomes[s].data();
        uint64_t fwd = 0, rc = 0;
        int have = 0;
        for (long i = 0; i < L; i++) {
            uint8_t c = g[i];
            if ((c & 0xF) == 14) { have = 0; fwd = rc = 0; continue; }  // N resets
            uint64_t code = (c >> 1) & 3;
            fwd = ((fwd << 2) | code) & kmask;
            rc = (rc >> 2) | ((code ^ 2) << (2 * (k - 1)));
            if (++have < k) continue;
            // split key: drop the middle base (bit group h of the k window)
            uint64_t fkey = ((fwd >> (2 * (h + 1))) << (2 * h)) | (fwd & lowmask);
            uint64_t rkey = ((rc >> (2 * (h + 1))) << (2 * h)) | (rc & lowmask);
            uint64_t fmid = (fwd >> (2 * h)) & 3;
            uint64_t rmid = (rc >> (2 * h)) & 3;
            uint64_t key, mid;
            if (rkey < fkey) { key = rkey; mid = rmid; }
            else { key = fkey; mid = fmid; }
            bool fresh;
            uint8_t* v = dict.slot(key, &fresh);
            *v = fresh ? (uint8_t)BASES[mid] : IUPAC[mid][*v];
            total_kmers++;
        }
        if (dict.count == 0) return 1;
    }
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    printf("%ld %.6f %.0f\n", total_kmers, dt, total_kmers / dt);
    return 0;
}
