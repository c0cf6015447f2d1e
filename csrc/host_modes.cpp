// Native host-mode engines for the dispatch-free .skf commands:
// `ska align` and `ska distance` as one C++ pass from the .skf bytes to
// the output file (reference generic_modes.rs:22-50 and :136-189).
//
// The host fallback previously paid ~0.3 s of CPython+numpy startup per
// command — more than the whole single-core reference command. These
// engines are called by the CLI (ska_tpu/host_cmds.py, ctypes only, no
// numpy import) BEFORE the python pipeline loads; any nonzero return
// (unfamiliar CBOR encoding, unsupported flag combination, allocation
// failure) falls back to the canonical python route, whose byte-exact
// equality with these engines is pinned by differential tests
// (tests/test_host_cmds.py).
//
// Semantics mirrored 1:1 from the python pipeline:
//   * .skf layout: CBOR map (any field order) inside a snappy frame
//     (io/skf.py; reference merge_ska_array.rs:108-126). split_kmers are
//     SKIPPED — neither command reads keys.
//   * update_counts(filter_ambig_as_missing) drops zero-count rows
//     (array.py:104-122, merge_ska_array.rs:139-163)
//   * site filters: threshold = ceil(S * min_freq), predicate per
//     filter_type (array.py:148-220, merge_ska_array.rs:289-402)
//   * align output: one FASTA record per sample, unwrapped single line
//     (array.py write_fasta, merge_ska_array.rs:499-517)
//   * distance: NoConst removed-count feeds the match denominator; the
//     per-pair stats are linear functionals of the 16x16 class
//     co-occurrence counts over deduplicated site rows (distance.py;
//     reference merge_ska_array.rs:416-438,587-632), printed as
//     "{:.2f}\t{:.5f}\t{}\t{}" (merge_ska_array.rs:57-65).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <new>
#include <string>
#include <zlib.h>
#include <thread>
#include <vector>

extern "C" {
long long ska_snappy_frame_decompress(const uint8_t* in, size_t n,
                                      uint8_t* out, size_t cap);
long long ska_cbor_encode_uints(const uint64_t* v, long long n, uint8_t* out);
long long ska_snappy_compress(const uint8_t* in, size_t n, uint8_t* out,
                              size_t out_cap);
uint32_t ska_crc32c(const uint8_t* data, size_t n);
}

namespace {

// ---- encoding tables (ska_tpu/encoding.py:46-106) --------------------------

// 16-entry 4-bit set -> ASCII IUPAC; bit order A=1, C=2, T=4, G=8
static const char SET_ASCII_TAB[17] = "-ACMTWYHGRSVKDBN";

struct Tables {
    uint8_t ascii_to_set[256];  // unknown -> 0; lowercase folded; U -> T
    uint8_t is_ambig[256];      // not in "acgtuACGTU-"
    uint8_t rc_iupac[256];      // IUPAC complement (encoding.py:83-90)
    Tables() {
        memset(ascii_to_set, 0, sizeof(ascii_to_set));
        for (int s = 1; s < 16; s++) {
            uint8_t a = (uint8_t)SET_ASCII_TAB[s];
            ascii_to_set[a] = (uint8_t)s;
            ascii_to_set[a | 0x20] = (uint8_t)s;
        }
        ascii_to_set['U'] = 4;
        ascii_to_set['u'] = 4;
        memset(is_ambig, 1, sizeof(is_ambig));
        for (const char* p = "acgtuACGTU-"; *p; p++)
            is_ambig[(uint8_t)*p] = 0;
        // set-algebra complement: bit order A=1,C=2,T=4,G=8, so the
        // complement swaps bits 0<->2 (A/T) and 1<->3 (C/G); everything
        // with an empty set (incl. '-') complements to '-'
        // (reference RC_IUPAC, bit_encoding.rs:475-508)
        memset(rc_iupac, '-', sizeof(rc_iupac));
        for (int a = 0; a < 256; a++) {
            int s = ascii_to_set[a];
            if (!s) continue;
            int rs = ((s & 1) << 2) | ((s >> 2) & 1) | ((s & 2) << 2) |
                     (((s >> 3) & 1) << 1);
            rc_iupac[a] = (uint8_t)SET_ASCII_TAB[rs];
        }
    }
};
static const Tables T;

// ---- CBOR reader (definite lengths only, as ciborium/io/cbor.py emit) ------

struct Cbor {
    const uint8_t* b;
    size_t n, p = 0;
    bool err = false;

    uint8_t peek() { return p < n ? b[p] : (err = true, 0xFF); }

    // reads one head; returns the argument value, sets major
    uint64_t head(int& major) {
        if (p >= n) { err = true; major = -1; return 0; }
        uint8_t ib = b[p++];
        major = ib >> 5;
        uint8_t ai = ib & 0x1F;
        if (ai < 24) return ai;
        int len = ai == 24 ? 1 : ai == 25 ? 2 : ai == 26 ? 4 : ai == 27 ? 8 : -1;
        if (len < 0 || p + (size_t)len > n) { err = true; return 0; }
        uint64_t v = 0;
        for (int i = 0; i < len; i++) v = (v << 8) | b[p++];
        return v;
    }

    bool text(std::string& out) {
        int m;
        uint64_t ln = head(m);
        if (err || m != 3 || p + ln > n) { err = true; return false; }
        out.assign((const char*)b + p, (size_t)ln);
        p += ln;
        return true;
    }

    void skip() {
        int m;
        uint64_t a = head(m);
        if (err) return;
        switch (m) {
            case 0: case 1: return;
            case 2: case 3:
                if (p + a > n) { err = true; return; }
                p += a;
                return;
            case 4:
                for (uint64_t i = 0; i < a && !err; i++) {
                    // bulk-skip runs of fixed-width uints: the skipped
                    // split_kmers field is 4M+ 0x1b/0x19/0x18 heads, and
                    // one strided scan beats a head() call per element
                    // (~40 ms at 4.4M rows on every align/distance load)
                    uint8_t ib = p < n ? b[p] : 0xFF;
                    int w = ib == 0x1b ? 9 : ib == 0x1a ? 5
                            : ib == 0x19 ? 3 : ib == 0x18 ? 2 : 0;
                    if (w) {
                        while (i + 1 < a && p + 2 * (size_t)w <= n &&
                               b[p + w] == ib) {
                            p += (size_t)w;
                            i++;
                        }
                    }
                    skip();
                }
                return;
            case 5:
                for (uint64_t i = 0; i < 2 * a && !err; i++) skip();
                return;
            case 6: skip(); return;
            case 7: return;  // argument already consumed by head()
            default: err = true; return;
        }
    }
};

struct HostArray {
    long long n = 0;  // sites
    int S = 0;        // samples
    std::vector<uint8_t> variants;  // n x S ASCII
    std::vector<int64_t> counts;    // n
    std::vector<std::string> names;
    // key fields, decoded only on request (ska map needs them; the
    // align/distance engines skip split_kmers entirely)
    std::vector<uint64_t> keys;  // n x W limbs, lex order = numeric order
    int W = 1;
    int64_t k = 0;
    int64_t k_bits = 64;
    int rc = 1;
    bool have_keys = false;
    bool keys_sorted = false;  // decided during the split_kmers decode
    std::string ska_version;
};

// decode a CBOR array of uints < 2^63 into out; false on anything else
static bool uint_array(Cbor& c, std::vector<int64_t>& out) {
    int m;
    uint64_t ln = c.head(m);
    if (c.err || m != 4) return false;
    out.clear();
    out.reserve(ln);
    for (uint64_t i = 0; i < ln; i++) {
        uint64_t v = c.head(m);
        if (c.err || m != 0) return false;
        out.push_back((int64_t)v);
    }
    return true;
}

// the variants field: {"v": 1, "dim": [r, c], "data": [u8...]} in any order
static bool variants_field(Cbor& c, HostArray& a) {
    int m;
    uint64_t nf = c.head(m);
    if (c.err || m != 5) return false;
    long long r = -1, s = -1;
    bool have_data = false;
    for (uint64_t f = 0; f < nf; f++) {
        std::string key;
        if (!c.text(key)) return false;
        if (key == "dim") {
            uint64_t dn = c.head(m);
            if (c.err || m != 4 || dn != 2) return false;
            r = (long long)c.head(m);
            if (c.err || m != 0) return false;
            s = (long long)c.head(m);
            if (c.err || m != 0) return false;
        } else if (key == "data") {
            uint64_t ln = c.head(m);
            if (c.err || m != 4) return false;
            a.variants.clear();
            try {
                a.variants.reserve(ln);
            } catch (const std::bad_alloc&) {
                return false;
            }
            // cells are ASCII (>= 24), i.e. 0x18 xx two-byte heads —
            // a strided read, with a general loop for anything else
            const uint8_t* b = c.b;
            size_t p = c.p, n = c.n;
            try {
                a.variants.resize(ln);
            } catch (const std::bad_alloc&) {
                return false;
            }
            uint8_t* out = a.variants.data();
            uint64_t i = 0;
            if (p + 2 * ln <= n) {
                // 4 cells per step: a run of 0x18-xx two-byte heads reads
                // as one u64 with 0x18 in every even byte — one compare
                // replaces four, ~2x on the 35 MB variants walk
                constexpr uint64_t M = 0x00FF00FF00FF00FFull;
                constexpr uint64_t V = 0x0018001800180018ull;
                for (; i + 4 <= ln; i += 4, p += 8) {
                    uint64_t x;
                    memcpy(&x, b + p, 8);
                    if ((x & M) != V) break;
                    out[i] = (uint8_t)(x >> 8);
                    out[i + 1] = (uint8_t)(x >> 24);
                    out[i + 2] = (uint8_t)(x >> 40);
                    out[i + 3] = (uint8_t)(x >> 56);
                }
                for (; i < ln && b[p] == 0x18; i++, p += 2) out[i] = b[p + 1];
            }
            for (; i < ln; i++) {
                if (p >= n) return false;
                uint8_t ib = b[p++];
                if (ib < 24) {
                    out[i] = ib;
                } else if (ib == 0x18) {
                    if (p >= n) return false;
                    out[i] = b[p++];
                } else {
                    return false;  // not a u8 cell
                }
            }
            c.p = p;
            have_data = true;
        } else {
            c.skip();
            if (c.err) return false;
        }
    }
    if (!have_data || r < 0 || s < 0 ||
        (long long)a.variants.size() != r * s || s > 0x7FFFFFFF)
        return false;
    a.n = r;
    a.S = (int)s;
    return true;
}

// split_kmers: CBOR array of uints and/or tag-2 positive bignums (<= 16
// bytes, big-endian) — exactly the two element forms ciborium and
// io/cbor.py emit for u64/u128 keys. Decoded as (hi, lo) limb pairs;
// width resolution happens after the whole map is read (k_bits is the
// LAST field in our writer's order).
static bool kmer_array(Cbor& c, std::vector<uint64_t>& hi,
                       std::vector<uint64_t>& lo, bool& sorted) {
    int m;
    uint64_t ln = c.head(m);
    if (c.err || m != 4) return false;
    try {
        hi.resize(ln);
        lo.resize(ln);
    } catch (const std::bad_alloc&) {
        return false;
    }
    // sortedness is decided during the decode (saved files store keys in
    // sorted order): host_map_impl then skips both the 35 MB re-scan and
    // the permutation sort in the common case
    sorted = true;
    uint64_t ph = 0, pl = 0;
    const uint8_t* b = c.b;
    size_t p = c.p, n = c.n;
    uint64_t i = 0;
    // fast path: a run of 0x1b 8-byte uints (every key >= 2^32, i.e. any
    // real k>=17 cohort) decodes as a strided big-endian load
    while (i < ln && p + 9 <= n && b[p] == 0x1b) {
        uint64_t v;
        memcpy(&v, b + p + 1, 8);
        v = __builtin_bswap64(v);
        hi[i] = 0;
        lo[i] = v;
        if (v < pl) sorted = false;
        pl = v;
        ph = 0;
        p += 9;
        i++;
    }
    c.p = p;
    for (; i < ln; i++) {
        uint64_t v = c.head(m);
        if (c.err) return false;
        uint64_t h_, l_;
        if (m == 0) {
            h_ = 0;
            l_ = v;
        } else if (m == 6 && v == 2) {  // positive bignum
            uint64_t bl = c.head(m);
            if (c.err || m != 2 || bl > 16 || c.p + bl > c.n) return false;
            h_ = 0;
            l_ = 0;
            for (uint64_t j = 0; j < bl; j++) {
                h_ = (h_ << 8) | (l_ >> 56);
                l_ = (l_ << 8) | c.b[c.p + j];
            }
            c.p += bl;
        } else {
            return false;
        }
        hi[i] = h_;
        lo[i] = l_;
        if (h_ < ph || (h_ == ph && l_ < pl)) sorted = false;
        ph = h_;
        pl = l_;
    }
    return true;
}

// load an .skf; 0 ok, nonzero = caller must fall back to python (which
// re-parses and raises its precise error)
static int load_skf(const char* path, HostArray& a, bool want_keys = false) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (sz <= 0) { fclose(f); return -1; }
    std::vector<uint8_t> raw;
    try {
        raw.resize((size_t)sz);
    } catch (const std::bad_alloc&) {
        fclose(f);
        return -1;
    }
    if (fread(raw.data(), 1, (size_t)sz, f) != (size_t)sz) { fclose(f); return -1; }
    fclose(f);

    long long total = ska_snappy_frame_decompress(raw.data(), raw.size(), nullptr, 0);
    if (total < 0) return -1;
    std::vector<uint8_t> buf;
    try {
        buf.resize((size_t)total);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    if (ska_snappy_frame_decompress(raw.data(), raw.size(), buf.data(),
                                    buf.size()) != total)
        return -1;

    Cbor c{buf.data(), buf.size()};
    int m;
    uint64_t nf = c.head(m);
    if (c.err || m != 5) return -1;
    bool have_v = false, have_c = false, have_n = false;
    std::vector<uint64_t> khi, klo;
    for (uint64_t f_i = 0; f_i < nf; f_i++) {
        std::string key;
        if (!c.text(key)) return -1;
        if (key == "k") {
            uint64_t v = c.head(m);
            if (c.err || m != 0) return -1;
            a.k = (int64_t)v;
        } else if (key == "rc") {
            uint64_t v = c.head(m);
            if (c.err || m != 7 || (v != 20 && v != 21)) return -1;
            a.rc = v == 21;
        } else if (key == "k_bits") {
            uint64_t v = c.head(m);
            if (c.err || m != 0) return -1;
            a.k_bits = (int64_t)v;
        } else if (key == "ska_version") {
            if (!c.text(a.ska_version)) return -1;
        } else if (key == "split_kmers" && want_keys) {
            khi.clear();
            klo.clear();  // duplicate map keys: last wins
            if (!kmer_array(c, khi, klo, a.keys_sorted)) return -1;
            a.have_keys = true;
        } else if (key == "names") {
            uint64_t ln = c.head(m);
            if (c.err || m != 4) return -1;
            a.names.clear();  // duplicate map keys: last wins (dict semantics)
            for (uint64_t i = 0; i < ln; i++) {
                std::string s;
                if (!c.text(s)) return -1;
                a.names.push_back(std::move(s));
            }
            have_n = true;
        } else if (key == "variants") {
            if (!variants_field(c, a)) return -1;
            have_v = true;
        } else if (key == "variant_count") {
            if (!uint_array(c, a.counts)) return -1;
            have_c = true;
        } else {
            c.skip();  // k, rc, k_bits, ska_version, split_kmers, unknown
            if (c.err) return -1;
        }
    }
    if (!have_v || !have_c || !have_n) return -1;
    if ((long long)a.counts.size() != a.n || (int)a.names.size() != a.S)
        return -1;
    if (a.have_keys) {
        // width from k_bits (io/skf.py:66-67, default 64); pack limbs
        // row-major so lex order over rows == numeric key order
        a.W = a.k_bits >= 128 ? 2 : 1;
        if ((long long)klo.size() != a.n) return -1;
        try {
            a.keys.resize((size_t)a.n * a.W);
        } catch (const std::bad_alloc&) {
            return -1;
        }
        if (a.W == 1) {
            memcpy(a.keys.data(), klo.data(), (size_t)a.n * 8);
        } else {
            for (long long i = 0; i < a.n; i++) {
                a.keys[2 * (size_t)i] = khi[i];
                a.keys[2 * (size_t)i + 1] = klo[i];
            }
        }
    }
    return 0;
}

// ---- filters (array.py:104-220) ---------------------------------------------

// recount non-missing per row (optionally ambig-as-missing) and drop
// zero-count rows in place
static void update_counts(HostArray& a, bool ambig_as_missing) {
    long long w = 0;
    for (long long i = 0; i < a.n; i++) {
        const uint8_t* row = &a.variants[(size_t)i * a.S];
        int64_t cnt = 0;
        for (int s = 0; s < a.S; s++) {
            uint8_t b = row[s];
            bool present = b != '-';
            if (ambig_as_missing && T.is_ambig[b]) present = false;
            cnt += present;
        }
        if (cnt > 0) {
            if (w != i) {
                memmove(&a.variants[(size_t)w * a.S], row, (size_t)a.S);
                if (a.have_keys)
                    memmove(&a.keys[(size_t)w * a.W],
                            &a.keys[(size_t)i * a.W], 8 * (size_t)a.W);
            }
            a.counts[w] = cnt;
            w++;
        }
    }
    a.n = w;
    a.variants.resize((size_t)w * a.S);
    a.counts.resize((size_t)w);
    if (a.have_keys) a.keys.resize((size_t)w * a.W);
}

// modes: 0 no-filter, 1 no-const, 2 no-ambig, 3 no-ambig-or-const
// (constants.py / io/native.py _FILTER_MODE). Returns rows removed,
// compacting variants+counts in place.
static long long filter_rows(HostArray& a, int64_t min_count, int mode,
                             bool ignore_const_gaps) {
    const int S = a.S;
    long long w = 0;
    for (long long i = 0; i < a.n; i++) {
        const uint8_t* row = &a.variants[(size_t)i * S];
        bool keep = a.counts[i] >= min_count;
        if (keep && mode != 0) {
            if (mode == 1) {
                int first = -1;
                bool two = false;
                for (int s = 0; s < S; s++) {
                    uint8_t b = row[s];
                    if (ignore_const_gaps && b == '-') continue;
                    if (first < 0) first = b;
                    else if (b != first) { two = true; break; }
                }
                keep = two;
            } else if (mode == 2) {
                bool amb = false;
                for (int s = 0; s < S; s++) amb |= T.is_ambig[row[s]] != 0;
                keep = !amb;
            } else {
                unsigned classes = 0;
                for (int s = 0; s < S; s++) {
                    switch (row[s]) {
                        case 'A': classes |= 1u; break;
                        case 'C': classes |= 2u; break;
                        case 'G': classes |= 4u; break;
                        case 'T': classes |= 8u; break;
                        case 'U': classes |= 16u; break;
                        case '-': if (!ignore_const_gaps) classes |= 32u;
                                  break;
                        default: break;
                    }
                }
                keep = __builtin_popcount(classes) > 1;
            }
        }
        if (keep) {
            if (w != i) {
                memmove(&a.variants[(size_t)w * S], row, (size_t)S);
                if (a.have_keys)
                    memmove(&a.keys[(size_t)w * a.W],
                            &a.keys[(size_t)i * a.W], 8 * (size_t)a.W);
            }
            a.counts[w] = a.counts[i];
            w++;
        }
    }
    long long removed = a.n - w;
    a.n = w;
    a.variants.resize((size_t)w * S);
    a.counts.resize((size_t)w);
    if (a.have_keys) a.keys.resize((size_t)w * a.W);
    return removed;
}

static FILE* open_out(const char* out) {
    if (!out || !*out || (out[0] == '-' && !out[1])) return stdout;
    return fopen(out, "wb");
}

}  // namespace

extern "C" {

// `ska align`: filters + unwrapped FASTA (api.py:94-107). 0 ok; nonzero
// = fall back to the python route. min_freq threshold = ceil(S * f)
// (generic_modes.rs:112-131).
static long long align_core(HostArray& a, const char* out_path,
                            double min_freq, int mode, int ambig_as_missing,
                            int ambig_mask, int ignore_const_gaps) {
    if (ambig_as_missing) update_counts(a, true);
    int64_t threshold = (int64_t)ceil((double)a.S * min_freq);
    filter_rows(a, threshold, mode, ignore_const_gaps != 0);

    uint8_t mask_tab[256];
    for (int i = 0; i < 256; i++)
        mask_tab[i] = (ambig_mask && T.is_ambig[i]) ? 'N' : (uint8_t)i;

    // transpose kept rows into per-sample lines in one sequential pass
    const int S = a.S;
    std::vector<uint8_t> lines;
    try {
        lines.resize((size_t)a.n * S);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    for (long long i = 0; i < a.n; i++) {
        const uint8_t* row = &a.variants[(size_t)i * S];
        for (int s = 0; s < S; s++)
            lines[(size_t)s * a.n + i] = mask_tab[row[s]];
    }

    FILE* out = open_out(out_path);
    if (!out) return -1;
    for (int s = 0; s < S; s++) {
        fputc('>', out);
        fwrite(a.names[s].data(), 1, a.names[s].size(), out);
        fputc('\n', out);
        if (a.n)  // every row filtered -> empty records (data() is null)
            fwrite(lines.data() + (size_t)s * a.n, 1, (size_t)a.n, out);
        fputc('\n', out);
    }
    if (out != stdout) fclose(out);
    else fflush(out);
    return 0;
}

static long long host_align_impl(
    const char* skf_path, const char* out_path, double min_freq, int mode,
    int ambig_as_missing, int ambig_mask, int ignore_const_gaps) {
    if (mode < 0 || mode > 3) return -1;
    HostArray a;
    if (load_skf(skf_path, a) != 0) return -1;
    return align_core(a, out_path, min_freq, mode, ambig_as_missing,
                      ambig_mask, ignore_const_gaps);
}

// `ska distance` (api.py:131-145). filt_ambig = NOT --allow-ambiguous.
static long long host_distance_impl(const char* skf_path,
                                    const char* out_path, double min_freq,
                                    int filt_ambig) {
    const bool tim = getenv("SKA_DIST_TIME") != nullptr;
    auto t0 = std::chrono::steady_clock::now();
    auto lap = [&](const char* what) {
        if (!tim) return;
        auto t1 = std::chrono::steady_clock::now();
        fprintf(stderr, "SKA_DIST_TIME %-10s %6.1f ms\n", what,
                std::chrono::duration<double, std::milli>(t1 - t0).count());
        t0 = t1;
    };
    HostArray a;
    if (load_skf(skf_path, a) != 0) return -1;
    lap("load");
    const int S = a.S;
    if (min_freq * (double)S >= 1.0) {
        int64_t threshold = (int64_t)ceil((double)S * min_freq);
        filter_rows(a, threshold, 0, false);
    }
    long long constant = filter_rows(a, 0, 1, false);  // NoConst
    lap("filters");

    // dedupe site rows on their 4-bit class codes (distance.py:153-177):
    // open-addressing map keyed by the class row
    std::vector<uint8_t> cls;
    try {
        cls.resize((size_t)a.n * S);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    for (size_t i = 0; i < cls.size(); i++)
        cls[i] = T.ascii_to_set[a.variants[i]];

    size_t cap = 64;
    while (cap < (size_t)a.n * 2) cap <<= 1;
    if (cap > (1u << 26)) cap = 1u << 26;  // rows dedupe heavily post-NoConst
    std::vector<int64_t> slot_row, slot_cnt;
    try {
        slot_row.assign(cap, -1);
        slot_cnt.assign(cap, 0);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    size_t mask = cap - 1, n_uniq = 0;
    for (long long i = 0; i < a.n; i++) {
        const uint8_t* row = &cls[(size_t)i * S];
        uint64_t h = 0xcbf29ce484222325ull;
        for (int s = 0; s < S; s++) h = (h ^ row[s]) * 0x100000001b3ull;
        h ^= h >> 33;
        size_t j = (size_t)h & mask;
        for (;;) {
            if (slot_row[j] < 0) {
                if (n_uniq >= cap - cap / 4) return -1;  // would degrade
                slot_row[j] = i;
                slot_cnt[j] = 1;
                n_uniq++;
                break;
            }
            if (memcmp(&cls[(size_t)slot_row[j] * S], row, (size_t)S) == 0) {
                slot_cnt[j]++;
                break;
            }
            j = (j + 1) & mask;
        }
    }
    lap("dedup");

    // per-pair 16x16 class co-occurrence counts (distance.py class_gram)
    const long long pairs = (long long)S * (S - 1) / 2;
    if ((double)n_uniq * (double)pairs > 2e8) return -1;  // python BLAS wins
    std::vector<int64_t> G;
    try {
        G.assign((size_t)pairs * 256, 0);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    for (size_t j = 0; j < cap; j++) {
        if (slot_row[j] < 0) continue;
        const uint8_t* row = &cls[(size_t)slot_row[j] * S];
        int64_t w = slot_cnt[j];
        int64_t* g = G.data();
        for (int x = 0; x < S; x++) {
            unsigned ax = row[x];
            for (int y = x + 1; y < S; y++, g += 256)
                g[ax * 16 + row[y]] += w;
        }
    }
    lap("gram");

    // coefficient tables (distance.py:52-69): probs over (A, C, T, G)
    double prob[16][4] = {};
    for (int s = 1; s < 15; s++) {
        int bits = __builtin_popcount((unsigned)s);
        for (int i = 0; i < 4; i++)
            if (s & (1 << i)) prob[s][i] = 1.0 / bits;
    }  // class 0 ('-') and 15 (N) stay zero vectors (bit_encoding.rs:65-85)
    double dist_c[16][16], match_c[16][16], mism_c[16][16];
    for (int x = 0; x < 16; x++)
        for (int y = 0; y < 16; y++) {
            double ov = 0.0;
            for (int i = 0; i < 4; i++) ov += prob[x][i] * prob[y][i];
            bool both = x > 0 && y > 0;
            bool one_gap = (x > 0) != (y > 0);
            if (filt_ambig) {
                bool ux = x == 1 || x == 2 || x == 4 || x == 8;
                bool uy = y == 1 || y == 2 || y == 4 || y == 8;
                dist_c[x][y] = (ux && uy && x != y) ? 1.0 : 0.0;
                match_c[x][y] = (ux && uy) ? 1.0 : 0.0;
            } else {
                dist_c[x][y] = both ? 1.0 - ov : 0.0;
                match_c[x][y] = (both && ov > 0.0) ? 1.0 : 0.0;
            }
            mism_c[x][y] = one_gap ? 1.0 : 0.0;
        }

    FILE* out = open_out(out_path);
    if (!out) return -1;
    fputs("Sample1\tSample2\tDistance\tMismatches (proportion)\t"
          "Match count\tMismatch count\n", out);
    const int64_t* g = G.data();
    for (int x = 0; x < S; x++) {
        for (int y = x + 1; y < S; y++, g += 256) {
            double D = 0.0, M = 0.0, X = 0.0;
            for (int ca = 0; ca < 16; ca++)
                for (int cb = 0; cb < 16; cb++) {
                    double v = (double)g[ca * 16 + cb];
                    D += v * dist_c[ca][cb];
                    M += v * match_c[ca][cb];
                    X += v * mism_c[ca][cb];
                }
            double matches = (double)constant + M;
            double denom = matches + X;
            double propd = denom != 0.0 ? X / denom : 0.0;
            fprintf(out, "%s\t%s\t%.2f\t%.5f\t%lld\t%lld\n",
                    a.names[x].c_str(), a.names[y].c_str(), D, propd,
                    (long long)matches, (long long)X);
        }
    }
    if (out != stdout) fclose(out);
    else fflush(out);
    return 0;
}

}  // extern "C"

namespace {

// split a NUL-separated blob into n views; short blobs yield empty tails
static std::vector<std::pair<const char*, size_t>> split_blob(
    const uint8_t* blob, long long blob_len, long long n_items) {
    std::vector<std::pair<const char*, size_t>> out;
    const uint8_t* p = blob;
    const uint8_t* end = blob + blob_len;
    for (long long i = 0; i < n_items; i++) {
        const uint8_t* z = (const uint8_t*)memchr(p, 0, end - p);
        size_t ln = z ? (size_t)(z - p) : (size_t)(end - p);
        out.emplace_back((const char*)p, ln);
        p += ln + (z ? 1 : 0);
    }
    return out;
}

// `.skf` save: the full CBOR encode + snappy framing in one pass,
// byte-identical to the python encoder (io/skf.py save + io/snappy.py
// frame_compress; reference merge_ska_array.rs:191-204). Field order,
// minimal-width heads, ciborium bignums and the 64 KiB framing chunks
// all match — tests/test_host_cmds.py pins equality. 0 ok, nonzero =
// caller falls back to the python encoder.
static long long save_impl(
    const char* path, const uint64_t* keys, long long n, int W,
    const uint8_t* variants, long long S, const uint64_t* counts,
    const std::vector<std::pair<const char*, size_t>>& names, int k,
    int rc, const uint8_t* version, long long version_len) {
    if (W != 1 && W != 2) return -1;
    long long n_names = (long long)names.size();
    size_t names_bytes = 0;
    for (const auto& nm : names) names_bytes += nm.second + 3;
    std::vector<uint8_t> buf;
    try {
        buf.reserve((size_t)n * (W == 1 ? 9 : 19) + (size_t)n * S * 2 +
                    (size_t)n * 9 + names_bytes + 256);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    auto head = [&](int major, uint64_t v) {
        uint8_t m = (uint8_t)(major << 5);
        if (v < 24) buf.push_back(m | (uint8_t)v);
        else if (v < 0x100) { buf.push_back(m | 24); buf.push_back((uint8_t)v); }
        else if (v < 0x10000) {
            buf.push_back(m | 25);
            buf.push_back((uint8_t)(v >> 8));
            buf.push_back((uint8_t)v);
        } else if (v < 0x100000000ULL) {
            buf.push_back(m | 26);
            for (int i = 3; i >= 0; i--) buf.push_back((uint8_t)(v >> (8 * i)));
        } else {
            buf.push_back(m | 27);
            for (int i = 7; i >= 0; i--) buf.push_back((uint8_t)(v >> (8 * i)));
        }
    };
    auto text = [&](const char* s_, size_t ln) {
        head(3, ln);
        buf.insert(buf.end(), (const uint8_t*)s_, (const uint8_t*)s_ + ln);
    };

    head(5, 8);  // same insertion order as io/skf.py save()
    text("k", 1); head(0, (uint64_t)k);
    text("rc", 2); buf.push_back(rc ? 0xF5 : 0xF4);
    text("names", 5);
    head(4, (uint64_t)n_names);
    for (const auto& nm : names) text(nm.first, nm.second);
    text("split_kmers", 11);
    head(4, (uint64_t)n);
    if (W == 1) {
        size_t base = buf.size();
        buf.resize(base + (size_t)n * 9);
        long long wrote = ska_cbor_encode_uints(keys, n, buf.data() + base);
        buf.resize(base + (size_t)wrote);
    } else {
        // ciborium u128s: plain uint when hi == 0, else tag-2 positive
        // bignum with minimal big-endian bytes (io/cbor.py U128s)
        for (long long i = 0; i < n; i++) {
            uint64_t hi = keys[2 * i], lo = keys[2 * i + 1];
            if (hi == 0) {
                head(0, lo);
            } else {
                buf.push_back(0xC2);
                int hbits = 64 - __builtin_clzll(hi);
                int nbytes = (64 + hbits + 7) / 8;
                head(2, (uint64_t)nbytes);
                for (int b = nbytes - 1; b >= 0; b--) {
                    uint64_t limb = b >= 8 ? hi : lo;
                    buf.push_back((uint8_t)(limb >> (8 * (b & 7))));
                }
            }
        }
    }
    text("variants", 8);
    head(5, 3);
    text("v", 1); head(0, 1);
    text("dim", 3);
    head(4, 2); head(0, (uint64_t)n); head(0, (uint64_t)S);
    text("data", 4);
    head(4, (uint64_t)(n * S));
    {
        const size_t cells = (size_t)(n * S);
        size_t base = buf.size();
        buf.resize(base + 2 * cells);
        uint8_t* o = buf.data() + base;
        for (size_t i = 0; i < cells; i++) {
            uint8_t c = variants[i];
            if (c < 24) {
                *o++ = c;
            } else {
                *o++ = 0x18;
                *o++ = c;
            }
        }
        buf.resize((size_t)(o - buf.data()));
    }
    text("variant_count", 13);
    head(4, (uint64_t)n);
    {
        size_t base = buf.size();
        buf.resize(base + (size_t)n * 9);
        long long wrote = ska_cbor_encode_uints(counts, n, buf.data() + base);
        buf.resize(base + (size_t)wrote);
    }
    text("ska_version", 11);
    text((const char*)version, (size_t)version_len);
    text("k_bits", 6); head(0, W == 1 ? 64u : 128u);

    // snappy framing, 64 KiB chunks (io/snappy.py frame_compress)
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    static const uint8_t MAGIC[10] = {0xFF, 0x06, 0x00, 0x00,
                                      's',  'N',  'a',  'P', 'p', 'Y'};
    fwrite(MAGIC, 1, 10, f);
    const size_t CH = 65536;
    std::vector<uint8_t> comp;
    try {
        comp.resize(32 + CH + CH / 6);
    } catch (const std::bad_alloc&) {
        fclose(f);
        return -1;
    }
    for (size_t pos = 0; pos < buf.size(); pos += CH) {
        size_t ln = buf.size() - pos < CH ? buf.size() - pos : CH;
        const uint8_t* chunk = buf.data() + pos;
        uint32_t crc = ska_crc32c(chunk, ln);
        uint32_t masked = ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
        long long cl = ska_snappy_compress(chunk, ln, comp.data(), comp.size());
        bool use_comp = cl > 0 && (size_t)cl < ln;
        size_t body = 4 + (use_comp ? (size_t)cl : ln);
        uint8_t hdr[4] = {use_comp ? (uint8_t)0x00 : (uint8_t)0x01,
                          (uint8_t)body, (uint8_t)(body >> 8),
                          (uint8_t)(body >> 16)};
        uint8_t crcb[4] = {(uint8_t)masked, (uint8_t)(masked >> 8),
                           (uint8_t)(masked >> 16), (uint8_t)(masked >> 24)};
        fwrite(hdr, 1, 4, f);
        fwrite(crcb, 1, 4, f);
        fwrite(use_comp ? comp.data() : chunk, 1, body - 4, f);
    }
    if (fclose(f) != 0) return -1;
    return 0;
}

// one FASTA file -> flat record batch with 0x00 separators, exactly as
// io/fastx.py read_fastx + build_batch produce it (headers dropped,
// '\n'/'\r' stripped, one separator byte between records). false =
// not plain FASTA (gz, FASTQ, empty) — caller falls back to python.
static bool parse_fasta(const char* path, std::vector<uint8_t>& out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (sz <= 0) { fclose(f); return false; }
    std::vector<uint8_t> raw;
    try {
        raw.resize((size_t)sz);
        out.reserve((size_t)sz);
    } catch (const std::bad_alloc&) {
        fclose(f);
        return false;
    }
    if (fread(raw.data(), 1, (size_t)sz, f) != (size_t)sz) {
        fclose(f);
        return false;
    }
    fclose(f);
    if (raw[0] != '>') return false;  // gz magic / FASTQ / junk
    bool first = true;
    size_t i = 0, n = raw.size();
    while (i < n) {
        if (raw[i] == '>') {  // loop top is always a line start
            while (i < n && raw[i] != '\n') i++;
            if (i < n) i++;
            if (!first) out.push_back(0);
            first = false;
        } else {
            while (i < n && raw[i] != '\n') {
                if (raw[i] != '\r') out.push_back(raw[i]);
                i++;
            }
            if (i < n) i++;
        }
    }
    return !first;
}

// multi-contig FASTA with contig names (first whitespace token of each
// header, ska_ref.rs:208-212 / ref.py:37); plain uncompressed only
static bool parse_fasta_named(const char* path,
                              std::vector<std::string>& names,
                              std::vector<std::vector<uint8_t>>& seqs) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (sz <= 0) { fclose(f); return false; }
    std::vector<uint8_t> raw;
    try {
        raw.resize((size_t)sz);
    } catch (const std::bad_alloc&) {
        fclose(f);
        return false;
    }
    if (fread(raw.data(), 1, (size_t)sz, f) != (size_t)sz) {
        fclose(f);
        return false;
    }
    fclose(f);
    if (raw[0] != '>') return false;
    size_t i = 0, n = raw.size();
    while (i < n) {
        if (raw[i] == '>') {
            i++;
            size_t b = i;
            while (i < n && raw[i] != '\n' && raw[i] != ' ' &&
                   raw[i] != '\t' && raw[i] != '\r')
                i++;
            if (i == b) return false;  // empty name: python raises there
            names.emplace_back((const char*)raw.data() + b, i - b);
            seqs.emplace_back();
            while (i < n && raw[i] != '\n') i++;
            if (i < n) i++;
        } else {
            while (i < n && raw[i] != '\n') {
                if (raw[i] != '\r') seqs.back().push_back(raw[i]);
                i++;
            }
            if (i < n) i++;
        }
    }
    return !seqs.empty();
}

// whole-buffer gunzip (1f 8b magic); false on any zlib error
static bool gunzip_buf(const std::vector<uint8_t>& in,
                       std::vector<uint8_t>& out) {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
    out.clear();
    try {
        out.resize(in.size() * 4 + (1 << 16));
    } catch (const std::bad_alloc&) {
        inflateEnd(&zs);
        return false;
    }
    zs.next_in = (Bytef*)in.data();
    zs.avail_in = (uInt)in.size();
    size_t opos = 0;
    for (;;) {
        zs.next_out = out.data() + opos;
        zs.avail_out = (uInt)(out.size() - opos);
        int r = inflate(&zs, Z_NO_FLUSH);
        opos = out.size() - zs.avail_out;
        if (r == Z_STREAM_END) {
            // concatenated gzip members (gzip.py handles them): restart
            if (zs.avail_in == 0) break;
            if (inflateReset2(&zs, 16 + MAX_WBITS) != Z_OK) {
                inflateEnd(&zs);
                return false;
            }
            continue;
        }
        if (r != Z_OK && r != Z_BUF_ERROR) {
            inflateEnd(&zs);
            return false;
        }
        if (zs.avail_out == 0) {
            try {
                out.resize(out.size() * 2);
            } catch (const std::bad_alloc&) {
                inflateEnd(&zs);
                return false;
            }
        } else if (r == Z_BUF_ERROR) {
            inflateEnd(&zs);
            return false;  // truncated stream
        }
    }
    inflateEnd(&zs);
    out.resize(opos);
    return true;
}

// parse one FASTA/FASTQ file (plain or gz) and APPEND its records'
// (seq, qual) pairs; FASTA records fill qual with 0xFF (always-pass,
// fastx.py build_batch). Mirrors io/fastx.py read_fastx exactly; any
// malformed record or seq/qual length mismatch declines.
static bool parse_fastx_records(
    const char* path, std::vector<std::vector<uint8_t>>& seqs,
    std::vector<std::vector<uint8_t>>& quals, bool& is_fastq_first,
    bool set_format) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (sz <= 0) { fclose(f); return false; }
    std::vector<uint8_t> raw;
    try {
        raw.resize((size_t)sz);
    } catch (const std::bad_alloc&) {
        fclose(f);
        return false;
    }
    if (fread(raw.data(), 1, (size_t)sz, f) != (size_t)sz) {
        fclose(f);
        return false;
    }
    fclose(f);
    std::vector<uint8_t> inflated;
    if (raw.size() >= 2 && raw[0] == 0x1F && raw[1] == 0x8B) {
        if (!gunzip_buf(raw, inflated)) return false;
        raw.swap(inflated);
        if (raw.empty()) return false;
    }
    if (raw[0] == '>') {
        if (set_format) is_fastq_first = false;
        size_t i = 0, n = raw.size();
        bool any = false;
        while (i < n) {
            if (raw[i] == '>') {
                while (i < n && raw[i] != '\n') i++;
                if (i < n) i++;
                seqs.emplace_back();
                quals.emplace_back();  // filled with 0xFF at batch time
                any = true;
            } else {
                if (seqs.empty()) return false;
                while (i < n && raw[i] != '\n') {
                    if (raw[i] != '\r') seqs.back().push_back(raw[i]);
                    i++;
                }
                if (i < n) i++;
            }
        }
        return any;
    }
    if (raw[0] != '@') return false;
    if (set_format) is_fastq_first = true;
    // 4-line FASTQ records (read_fastx: strict @ check, \r-stripped)
    size_t i = 0;
    const size_t n = raw.size();
    bool any = false;
    auto read_line = [&](std::vector<uint8_t>* dst) -> bool {
        size_t b = i;
        while (i < n && raw[i] != '\n') i++;
        size_t e = i;
        if (e > b && raw[e - 1] == '\r') e--;
        if (dst) dst->assign(raw.begin() + b, raw.begin() + e);
        bool had = i < n || e > b;
        if (i < n) i++;
        return had;
    };
    while (i < n) {
        std::vector<uint8_t> hdr;
        if (!read_line(&hdr)) break;
        if (hdr.empty()) break;
        if (hdr[0] != '@') return false;
        std::vector<uint8_t> s, plus, q;
        if (!read_line(&s)) return false;
        if (!read_line(&plus)) return false;
        if (!read_line(&q)) return false;
        if (q.size() != s.size()) return false;  // misaligned: python route
        // 0xFF is the no-qual sentinel; a real PHRED byte can't be 0xFF
        for (uint8_t qb : q)
            if (qb == 0xFF) return false;
        seqs.push_back(std::move(s));
        quals.push_back(std::move(q));
        any = true;
    }
    return any;
}

}  // namespace

extern "C" {

long long ska_host_build(int n_samples, const uint8_t** seqs,
                         const long long* lens, int k, int rc);
void ska_host_build_release();
const uint64_t* ska_host_build_keys_ptr();
const uint8_t* ska_host_build_variants_ptr();
const int64_t* ska_host_build_counts_ptr();

long long ska_host_build_fastq(int n_samples, const uint8_t** seqs,
                               const long long* lens,
                               const uint8_t** quals,
                               const uint8_t* is_reads, int k, int rc,
                               int qf_mode, int min_qual,
                               unsigned min_count);
// host_build.cpp: positional ref scan + fused lookup/gather (ska map)
long long ska_host_ref_scan(const uint8_t* seq, long long L, int k, int rc);
void ska_host_ref_scan_release();
const uint64_t* ska_host_ref_scan_keys_ptr();
const int64_t* ska_host_ref_scan_pos_ptr();
const uint8_t* ska_host_ref_scan_rc_ptr();
long long ska_map_gather(const uint64_t* sorted, long long n,
                         const uint64_t* needles, long long m, int W,
                         const uint8_t* krc, const int64_t* perm,
                         const uint8_t* variants, int S,
                         const uint8_t* rc_tab,
                         int64_t* out_hit, uint8_t* out_rows);
// merge_batches.cpp: B-way sorted union merge (ska merge)
int64_t ska_merge_batches(const uint64_t* keys_cat, const int64_t* n_off,
                          const uint8_t* var_cat, const int64_t* v_off,
                          const int64_t* col_off, int64_t B, int64_t W,
                          uint64_t* out_keys, uint8_t* out_var,
                          int64_t* out_counts, int64_t s_total);
// skanative.cpp: the AlnWriter state machine (one sample per call)
int ska_aln_write(const uint8_t* ref_seq, const int64_t* chrom_len,
                  int64_t n_chrom, const int32_t* m_chrom,
                  const int64_t* m_pos, const uint8_t* bases, int64_t n_hits,
                  int64_t half, const uint8_t* is_ambig, int mask_ambig,
                  const int64_t* repeat_coors, int64_t n_repeats,
                  uint8_t* out);

// every extern entry catches everything: a bad_alloc (or any other
// exception) crossing the C ABI would terminate() the host process —
// the contract is nonzero = fall back to the python pipeline
long long ska_host_align(const char* skf_path, const char* out_path,
                         double min_freq, int mode, int ambig_as_missing,
                         int ambig_mask, int ignore_const_gaps) {
    try {
        return host_align_impl(skf_path, out_path, min_freq, mode,
                               ambig_as_missing, ambig_mask,
                               ignore_const_gaps);
    } catch (...) {
        return -3;
    }
}

long long ska_host_distance(const char* skf_path, const char* out_path,
                            double min_freq, int filt_ambig) {
    try {
        return host_distance_impl(skf_path, out_path, min_freq, filt_ambig);
    } catch (...) {
        return -3;
    }
}

// `ska map` as one C++ pass (api.py map_mode / ref.py RefSka; reference
// generic_modes.rs:56-84 + ska_ref.rs). Pipeline: .skf load (with keys)
// -> positional ref scan (host_build.cpp, same emission semantics as the
// build extractor) -> fused prefix-bucketed lookup + variants gather +
// RC_IUPAC strand translation (ska_map_gather) -> AlnWriter per sample
// (skanative.cpp) -> aln records or VCF. vcf: 0 = aln, 1 = vcf. 0 ok;
// nonzero = fall back to python (incl. the zero-hit case, where the
// python route raises the reference's "No split k-mers mapped" error).
static long long map_core(HostArray& a, const char* ref_path,
                          const char* out_path, int vcf, int ambig_mask,
                          int repeat_mask,
                          const std::function<void(const char*)>& lap);

static long long host_map_impl(const char* ref_path, const char* skf_path,
                               const char* out_path, int vcf,
                               int ambig_mask, int repeat_mask) {
    const bool tim = getenv("SKA_MAP_TIME") != nullptr;
    auto t0 = std::chrono::steady_clock::now();
    auto lap = [&](const char* what) {
        if (!tim) return;
        auto t1 = std::chrono::steady_clock::now();
        fprintf(stderr, "SKA_MAP_TIME %-12s %7.1f ms\n", what,
                std::chrono::duration<double, std::milli>(t1 - t0).count());
        t0 = t1;
    };
    HostArray a;
    if (load_skf(skf_path, a, /*want_keys=*/true) != 0) return -1;
    lap("load_skf");
    return map_core(a, ref_path, out_path, vcf, ambig_mask, repeat_mask,
                    lap);
}

static long long map_core(HostArray& a, const char* ref_path,
                          const char* out_path, int vcf, int ambig_mask,
                          int repeat_mask,
                          const std::function<void(const char*)>& lap) {
    if (!a.have_keys || a.n <= 0 || a.n > 0x7fffffffLL) return -1;
    if (a.k < 5 || a.k > 63 || (a.k & 1) == 0) return -1;
    const int W = a.k <= 31 ? 1 : 2;
    if (W != a.W) return -1;
    const int S = a.S;
    const int64_t h = (a.k - 1) / 2;

    std::vector<std::string> cnames;
    std::vector<std::vector<uint8_t>> cseqs;
    if (!parse_fasta_named(ref_path, cnames, cseqs)) return -1;
    const long long n_chrom = (long long)cseqs.size();
    size_t total = 0;
    for (auto& s : cseqs) total += s.size();
    if (!total) return -1;

    // flat 0x00-separated batch for the scan; separator-free concat for
    // the writers; starts[] recovers (chrom, pos) from flat offsets
    std::vector<uint8_t> flat, ref_concat;
    std::vector<int64_t> starts(n_chrom), chrom_len(n_chrom);
    try {
        flat.reserve(total + (size_t)n_chrom);
        ref_concat.reserve(total);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    for (long long ci = 0; ci < n_chrom; ci++) {
        if (ci) flat.push_back(0);
        starts[ci] = (int64_t)flat.size();
        flat.insert(flat.end(), cseqs[ci].begin(), cseqs[ci].end());
        ref_concat.insert(ref_concat.end(), cseqs[ci].begin(),
                          cseqs[ci].end());
        chrom_len[ci] = (int64_t)cseqs[ci].size();
    }

    lap("fasta+flat");
    long long nk = ska_host_ref_scan(flat.data(), (long long)flat.size(),
                                     (int)a.k, a.rc);
    if (nk <= 0) return -1;
    lap("ref_scan");
    // zero-copy views into the retained scan; released after the gather
    struct ScanGuard {
        ~ScanGuard() { ska_host_ref_scan_release(); }
    } scan_guard;
    const uint64_t* rkeys = ska_host_ref_scan_keys_ptr();
    const int64_t* wpos = ska_host_ref_scan_pos_ptr();
    const uint8_t* rrc = ska_host_ref_scan_rc_ptr();
    if (!rkeys || !wpos || !rrc) return -1;

    // (chrom, pos) per window: wpos and starts both ascend — two-pointer
    // walk replaces the python searchsorted (ref.py:73-75)
    std::vector<int32_t> kchrom;
    std::vector<int64_t> kpos;
    try {
        kchrom.resize((size_t)nk);
        kpos.resize((size_t)nk);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    {
        long long ci = 0;
        for (long long i = 0; i < nk; i++) {
            while (ci + 1 < n_chrom && wpos[i] >= starts[ci + 1]) ci++;
            kchrom[i] = (int32_t)ci;
            kpos[i] = wpos[i] - starts[ci] + h;
        }
    }

    // sorted key view (array.py sorted_view): saved .skf files are
    // already sorted, so the common case is zero-copy; otherwise build
    // the permutation the gather indexes variants through
    const uint64_t* sorted = a.keys.data();
    const int64_t* perm = nullptr;
    std::vector<uint64_t> skeys;
    std::vector<int64_t> permv;
    if (!a.keys_sorted) {
        try {
            permv.resize((size_t)a.n);
            skeys.resize((size_t)a.n * W);
        } catch (const std::bad_alloc&) {
            return -1;
        }
        for (long long i = 0; i < a.n; i++) permv[i] = i;
        const uint64_t* kd = a.keys.data();
        std::sort(permv.begin(), permv.end(), [kd, W](int64_t x, int64_t y) {
            const uint64_t* px = kd + (size_t)x * W;
            const uint64_t* py = kd + (size_t)y * W;
            if (W == 1) return px[0] < py[0];
            return px[0] < py[0] || (px[0] == py[0] && px[1] < py[1]);
        });
        for (long long i = 0; i < a.n; i++)
            memcpy(&skeys[(size_t)i * W], kd + (size_t)permv[i] * W,
                   8 * (size_t)W);
        sorted = skeys.data();
        perm = permv.data();
    }

    std::vector<int64_t> hits;
    std::vector<uint8_t> rows;
    try {
        hits.resize((size_t)nk);
        rows.resize((size_t)nk * S);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    lap("sort_view");
    long long nh = ska_map_gather(sorted, a.n, rkeys, nk, W,
                                  rrc, perm, a.variants.data(), S,
                                  T.rc_iupac, hits.data(), rows.data());
    if (nh <= 0) return -1;
    lap("map_gather");

    std::vector<int32_t> mchrom;
    std::vector<int64_t> mpos;
    try {
        mchrom.resize((size_t)nh);
        mpos.resize((size_t)nh);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    for (long long j = 0; j < nh; j++) {
        mchrom[j] = kchrom[(size_t)hits[j]];
        mpos[j] = kpos[(size_t)hits[j]];
    }

    // repeat spans: duplicate ref k-mers mask [pos-h, pos+h], clipped by
    // the previous interval's RAW end, with the reference's
    // chrom-offset-at-transition quirk (ska_ref.rs:261-298, ref.py:201-241)
    std::vector<int64_t> reps;
    if (repeat_mask) {
        bool any_rep = false;
        std::vector<uint8_t> is_rep;
        try {
            is_rep.assign((size_t)nk, 0);
            if (W == 1) {
                std::vector<uint64_t> sk(rkeys, rkeys + nk);
                std::sort(sk.begin(), sk.end());
                std::vector<uint64_t> dups;
                for (long long i = 1; i < nk; i++)
                    if (sk[i] == sk[i - 1] &&
                        (dups.empty() || dups.back() != sk[i]))
                        dups.push_back(sk[i]);
                for (long long i = 0; i < nk; i++)
                    if (std::binary_search(dups.begin(), dups.end(),
                                           rkeys[i]))
                        is_rep[i] = 1, any_rep = true;
            } else {
                std::vector<unsigned __int128> sk((size_t)nk);
                for (long long i = 0; i < nk; i++)
                    sk[i] = ((unsigned __int128)rkeys[2 * i] << 64) |
                            rkeys[2 * i + 1];
                std::vector<unsigned __int128> sorted_sk(sk);
                std::sort(sorted_sk.begin(), sorted_sk.end());
                std::vector<unsigned __int128> dups;
                for (long long i = 1; i < nk; i++)
                    if (sorted_sk[i] == sorted_sk[i - 1] &&
                        (dups.empty() || dups.back() != sorted_sk[i]))
                        dups.push_back(sorted_sk[i]);
                for (long long i = 0; i < nk; i++)
                    if (std::binary_search(dups.begin(), dups.end(), sk[i]))
                        is_rep[i] = 1, any_rep = true;
            }
        } catch (const std::bad_alloc&) {
            return -1;
        }
        if (any_rep) {
            // offset grows by len(seq[prev]) only at chrom TRANSITIONS in
            // k-mer order; absent chromosomes are skipped in the sum
            std::vector<int64_t> offmap(n_chrom, 0);
            {
                std::vector<int32_t> present;
                for (long long i = 0; i < nk; i++)
                    if (present.empty() || present.back() != kchrom[i])
                        present.push_back(kchrom[i]);
                std::vector<int32_t> chain;
                if (present[0] != 0) chain.push_back(0);
                chain.insert(chain.end(), present.begin(), present.end());
                int64_t acc = 0;
                for (size_t j = 1; j < chain.size(); j++) {
                    acc += chrom_len[chain[j - 1]];
                    offmap[chain[j]] = acc;
                }
            }
            int64_t prev_end = 0;
            for (long long i = 0; i < nk; i++) {
                if (!is_rep[i]) continue;
                int64_t gpos = kpos[i] + offmap[kchrom[i]];
                int64_t start = gpos - h, end = gpos + h;
                int64_t eff =
                    (start > prev_end || start == 0) ? start : prev_end + 1;
                for (int64_t p = eff; p <= end; p++) reps.push_back(p);
                prev_end = end;
            }
        }
    }

    // all S pseudoalignments BEFORE any output byte (python's
    // pseudoalignment() materializes the same S x total matrix, and a
    // partially-written stdout cannot be retracted on failure)
    std::vector<uint8_t> mat;
    try {
        mat.assign((size_t)S * total, '-');
    } catch (const std::bad_alloc&) {
        return -1;
    }
    int T_ = 1;
    if (const char* t = getenv("SKA_THREADS")) {
        int v = atoi(t);
        if (v > 1) T_ = v > 64 ? 64 : v;
    }
    if (T_ > S) T_ = S;
    std::atomic<int> fail{0};
    auto fill = [&](int s0, int s1) {
        std::vector<uint8_t> bases;
        try {
            bases.resize((size_t)nh);
        } catch (const std::bad_alloc&) {
            fail.store(1);
            return;
        }
        for (int s = s0; s < s1 && !fail.load(std::memory_order_relaxed);
             s++) {
            for (long long j = 0; j < nh; j++)
                bases[j] = rows[(size_t)j * S + s];
            if (ska_aln_write(ref_concat.data(), chrom_len.data(), n_chrom,
                              mchrom.data(), mpos.data(), bases.data(), nh,
                              h, T.is_ambig, ambig_mask, reps.data(),
                              (int64_t)reps.size(),
                              mat.data() + (size_t)s * total) != 0)
                fail.store(1);
        }
    };
    if (T_ <= 1) {
        fill(0, S);
    } else {
        std::vector<std::thread> ths;
        int step = (S + T_ - 1) / T_;
        for (int t = 0; t < T_; t++) {
            int s0 = t * step, s1 = s0 + step < S ? s0 + step : S;
            if (s0 >= s1) break;
            ths.emplace_back(fill, s0, s1);
        }
        for (auto& th : ths) th.join();
    }
    if (fail.load()) return -1;
    lap("aln_fill");

    FILE* out = open_out(out_path);
    if (!out) return -1;
    if (!vcf) {
        for (int s = 0; s < S; s++) {
            fputc('>', out);
            fwrite(a.names[s].data(), 1, a.names[s].size(), out);
            fputc('\n', out);
            fwrite(mat.data() + (size_t)s * total, 1, total, out);
            fputc('\n', out);
        }
    } else {
        // header (ref.py write_vcf / ska_ref.rs:672-705)
        fputs("##fileformat=VCFv4.4\n", out);
        for (auto& cn : cnames)
            fprintf(out, "##contig=<ID=%s>\n", cn.c_str());
        fputs("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT", out);
        for (auto& nm : a.names) {
            fputc('\t', out);
            fwrite(nm.data(), 1, nm.size(), out);
        }
        fputc('\n', out);

        // variant columns: any sample byte != ref byte, found with a
        // 64-bit-stride XOR sweep per sample into one column bitmap
        std::vector<uint64_t> diff((total + 63) / 64, 0);
        for (int s = 0; s < S; s++) {
            const uint8_t* row = mat.data() + (size_t)s * total;
            size_t col = 0;
            for (; col + 8 <= total; col += 8) {
                uint64_t x, r;
                memcpy(&x, row + col, 8);
                memcpy(&r, ref_concat.data() + col, 8);
                uint64_t d = x ^ r;
                if (!d) continue;
                for (int b = 0; b < 8; b++)
                    if ((d >> (8 * b)) & 0xFF)
                        diff[(col + b) >> 6] |= 1ull << ((col + b) & 63);
            }
            for (; col < total; col++)
                if (row[col] != ref_concat[col])
                    diff[col >> 6] |= 1ull << (col & 63);
        }
        std::vector<int64_t> chrom_start(n_chrom, 0);
        for (long long ci = 1; ci < n_chrom; ci++)
            chrom_start[ci] = chrom_start[ci - 1] + chrom_len[ci - 1];
        auto vcf_base = [](uint8_t b) -> char {
            return (b == 'A' || b == 'C' || b == 'G' || b == 'T') ? (char)b
                                                                  : 'N';
        };
        std::string line;
        long long ci = 0;
        for (size_t w = 0; w < diff.size(); w++) {
            uint64_t bits = diff[w];
            while (bits) {
                size_t col = (w << 6) + (size_t)__builtin_ctzll(bits);
                bits &= bits - 1;
                while (ci + 1 < n_chrom &&
                       (int64_t)col >= chrom_start[ci + 1])
                    ci++;
                uint8_t ref_base = ref_concat[col];
                char ref_allele = vcf_base(ref_base);
                // first-occurrence ALT ordering (ska_ref.rs:707-750)
                char alts[16];  // distinct vcf_base values: A/C/G/T/N <= 5
                int n_alt = 0;
                std::string gt_str;
                for (int s = 0; s < S; s++) {
                    uint8_t mb = mat[(size_t)s * total + col];
                    gt_str.push_back('\t');
                    if (mb == ref_base) {
                        gt_str.push_back('0');
                    } else if (mb == '-') {
                        gt_str.push_back('.');
                    } else {
                        char ab = vcf_base(mb);
                        int gi = -1;
                        for (int t2 = 0; t2 < n_alt; t2++)
                            if (alts[t2] == ab) { gi = t2; break; }
                        if (gi < 0) {
                            if (n_alt >= 16) return -1;  // can't happen: <=5 alleles
                            alts[n_alt] = ab;
                            gi = n_alt++;
                        }
                        gt_str += std::to_string(gi + 1);
                    }
                }
                line.clear();
                line += cnames[(size_t)ci];
                line += '\t';
                line += std::to_string((long long)(col - chrom_start[ci]) + 1);
                line += "\t.\t";
                line += ref_allele;
                line += '\t';
                if (n_alt == 0) {
                    line += '.';
                } else {
                    for (int t2 = 0; t2 < n_alt; t2++) {
                        if (t2) line += ',';
                        line += alts[t2];
                    }
                }
                line += "\t.\t.\t.\tGT";
                line += gt_str;
                line += '\n';
                fwrite(line.data(), 1, line.size(), out);
            }
        }
    }
    if (out != stdout) fclose(out);
    else fflush(out);
    lap("write");
    return 0;
}

// `ska nk` (array.py nk_display/nk_full_info; reference
// merge_ska_array.rs Display + lib.rs nk mode): metadata + per-sample
// k-mer counts, and with full=1 the complete k-mer/variants dump
// (upper-half bases \t lower-half bases \t comma-joined sample bases).
// Trailing newlines reproduce python's print() calls exactly.
static long long host_nk_impl(const char* skf_path, int full) {
    HostArray a;
    if (load_skf(skf_path, a, full != 0) != 0) return -1;
    long long wdisp = a.k_bits / 64;
    if (wdisp < 1) wdisp = 1;
    if (full) {
        if (!a.have_keys || a.k < 5 || a.k > 63) return -1;
        if (wdisp != a.W) return -1;  // exotic k_bits: python route
    }
    std::vector<long long> sk((size_t)a.S, 0);
    for (long long i = 0; i < a.n; i++) {
        const uint8_t* row = &a.variants[(size_t)i * a.S];
        for (int s = 0; s < a.S; s++) sk[s] += row[s] != '-';
    }
    FILE* out = stdout;
    fprintf(out,
            "ska_version=%s\nk=%lld\nk_bits=%lld\nrc=%s\nk-mers=%lld\n"
            "samples=%d\nsample_names=[",
            a.ska_version.c_str(), (long long)a.k, 64 * wdisp,
            a.rc ? "true" : "false", a.n, a.S);
    for (int s = 0; s < a.S; s++) {
        if (s) fputs(", ", out);
        fputc('"', out);
        fwrite(a.names[s].data(), 1, a.names[s].size(), out);
        fputc('"', out);
    }
    fputs("]\nsample_kmers=[", out);
    for (int s = 0; s < a.S; s++) {
        if (s) fputs(", ", out);
        fprintf(out, "%lld", sk[s]);
    }
    fputs("]\n\n", out);  // display ends \n; print() adds one more
    if (full) {
        if (a.n == 0) {
            fputc('\n', out);  // print("")
            fflush(out);
            return 0;
        }
        const int kb = (int)a.k - 1;
        const int half = kb / 2;
        const int S = a.S;
        static const char LET[5] = "ACTG";  // 2-bit code -> ASCII
        const int width = kb + 2 + (2 * S - 1) + 1;
        std::vector<uint8_t> line((size_t)width);
        for (long long i = 0; i < a.n; i++) {
            uint64_t hi = a.W == 2 ? a.keys[2 * (size_t)i] : 0;
            uint64_t lo = a.keys[(size_t)i * a.W + (a.W - 1)];
            uint8_t* o = line.data();
            for (int j = 0; j < kb; j++) {
                int bits = 2 * (kb - 1 - j);
                unsigned code;
                if (bits >= 64)
                    code = (unsigned)((hi >> (bits - 64)) & 3);
                else if (bits > 0)
                    code = (unsigned)(((lo >> bits) | (hi << (64 - bits))) & 3);
                else
                    code = (unsigned)(lo & 3);
                uint8_t ch = (uint8_t)LET[code];
                if (j < half) o[j] = ch;
                else o[j + 1] = ch;
            }
            o[half] = '\t';
            o[kb + 1] = '\t';
            const uint8_t* row = &a.variants[(size_t)i * S];
            for (int s = 0; s < S; s++) {
                o[kb + 2 + 2 * s] = row[s];
                if (s + 1 < S) o[kb + 3 + 2 * s] = ',';
            }
            o[width - 1] = '\n';
            fwrite(o, 1, (size_t)width, out);
        }
        fputc('\n', out);  // print()'s trailing newline
    }
    fflush(out);
    return 0;
}

long long ska_host_nk(const char* skf_path, int full) {
    try {
        return host_nk_impl(skf_path, full);
    } catch (...) {
        return -3;
    }
}

// shared head for the .skf-rewriting commands (weed/delete): load with
// keys and validate width so the row compactions can carry keys through
static int load_with_keys(const char* skf_path, HostArray& a) {
    if (load_skf(skf_path, a, /*want_keys=*/true) != 0) return -1;
    if (!a.have_keys) return -1;
    if (a.k < 5 || a.k > 63 || (a.k & 1) == 0) return -1;
    if ((a.k <= 31 ? 1 : 2) != a.W) return -1;
    return 0;
}

static long long save_array(const HostArray& a, const char* out_path) {
    std::string names_blob;
    for (size_t i = 0; i < a.names.size(); i++) {
        if (i) names_blob.push_back('\0');
        names_blob += a.names[i];
    }
    auto names = split_blob((const uint8_t*)names_blob.data(),
                            (long long)names_blob.size(),
                            (long long)a.names.size());
    return save_impl(out_path, a.keys.data(), a.n, a.W, a.variants.data(),
                     a.S, (const uint64_t*)a.counts.data(), names, (int)a.k,
                     a.rc, (const uint8_t*)a.ska_version.data(),
                     (long long)a.ska_version.size());
}

static void mask_ambig_cells(HostArray& a) {
    for (size_t i = 0; i < a.variants.size(); i++)
        if (T.is_ambig[a.variants[i]]) a.variants[i] = 'N';
}

// `ska weed` (api.py weed_mode; reference generic_modes.rs:214-267):
// drop (or keep-only, with reverse) the rows whose key appears in the
// weed FASTA's split k-mers, then the optional site filters, then save
// to the EXACT output path (no .skf suffixing). mode = filter_type as
// in host_align. Nonzero = fall back (incl. a weed FASTA yielding no
// k-mers, where python raises RefSka's "no valid sequence" error).
static long long host_weed_impl(const char* skf_path, const char* weed_fa,
                                int reverse, double min_freq, int mode,
                                int ambig_as_missing, int ambig_mask,
                                int ignore_const_gaps,
                                const char* out_path) {
    if (mode < 0 || mode > 3) return -1;
    HostArray a;
    if (load_with_keys(skf_path, a) != 0) return -1;
    if (weed_fa && *weed_fa) {
        std::vector<uint8_t> flat;
        if (!parse_fasta(weed_fa, flat)) return -1;
        long long nw = ska_host_ref_scan(flat.data(), (long long)flat.size(),
                                         (int)a.k, a.rc);
        if (nw <= 0) return -1;
        const uint64_t* wk = ska_host_ref_scan_keys_ptr();
        std::vector<uint64_t> weed;
        try {
            weed.assign(wk, wk + (size_t)nw * a.W);
        } catch (const std::bad_alloc&) {
            ska_host_ref_scan_release();
            return -1;
        }
        ska_host_ref_scan_release();
        // unique sorted weed set (array.py weed: np.unique axis=0)
        long long nu;
        if (a.W == 1) {
            std::sort(weed.begin(), weed.end());
            weed.erase(std::unique(weed.begin(), weed.end()), weed.end());
            nu = (long long)weed.size();
        } else {
            std::vector<unsigned __int128> w2((size_t)nw);
            for (long long i = 0; i < nw; i++)
                w2[i] = ((unsigned __int128)weed[2 * i] << 64) |
                        weed[2 * i + 1];
            std::sort(w2.begin(), w2.end());
            w2.erase(std::unique(w2.begin(), w2.end()), w2.end());
            nu = (long long)w2.size();
            weed.resize((size_t)nu * 2);
            for (long long i = 0; i < nu; i++) {
                weed[2 * i] = (uint64_t)(w2[i] >> 64);
                weed[2 * i + 1] = (uint64_t)w2[i];
            }
        }
        // membership + row compaction (keys/variants/counts together)
        long long w = 0;
        for (long long i = 0; i < a.n; i++) {
            bool member;
            if (a.W == 1) {
                member = std::binary_search(weed.begin(), weed.end(),
                                            a.keys[(size_t)i]);
            } else {
                unsigned __int128 q =
                    ((unsigned __int128)a.keys[2 * (size_t)i] << 64) |
                    a.keys[2 * (size_t)i + 1];
                long long lo = 0, hi = nu;
                while (lo < hi) {
                    long long mid = (lo + hi) >> 1;
                    unsigned __int128 v =
                        ((unsigned __int128)weed[2 * mid] << 64) |
                        weed[2 * mid + 1];
                    if (v < q) lo = mid + 1;
                    else hi = mid;
                }
                member = lo < nu && weed[2 * lo] == a.keys[2 * (size_t)i] &&
                         weed[2 * lo + 1] == a.keys[2 * (size_t)i + 1];
            }
            bool keep = reverse ? member : !member;
            if (keep) {
                if (w != i) {
                    memmove(&a.variants[(size_t)w * a.S],
                            &a.variants[(size_t)i * a.S], (size_t)a.S);
                    memmove(&a.keys[(size_t)w * a.W],
                            &a.keys[(size_t)i * a.W], 8 * (size_t)a.W);
                }
                a.counts[w] = a.counts[i];
                w++;
            }
        }
        a.n = w;
        a.variants.resize((size_t)w * a.S);
        a.counts.resize((size_t)w);
        a.keys.resize((size_t)w * a.W);
    }
    int64_t threshold = (int64_t)floor((double)a.S * min_freq);
    if (threshold > 0 || mode != 0 || ambig_mask || ignore_const_gaps) {
        if (ambig_as_missing) update_counts(a, true);
        filter_rows(a, threshold, mode, ignore_const_gaps != 0);
        if (ambig_mask) mask_ambig_cells(a);
    }
    return save_array(a, out_path);
}

long long ska_host_weed(const char* skf_path, const char* weed_fa,
                        int reverse, double min_freq, int mode,
                        int ambig_as_missing, int ambig_mask,
                        int ignore_const_gaps, const char* out_path) {
    try {
        return host_weed_impl(skf_path, weed_fa, reverse, min_freq, mode,
                              ambig_as_missing, ambig_mask,
                              ignore_const_gaps, out_path);
    } catch (...) {
        return -3;
    }
}

// Implicit build (io_utils.rs:60-93 / api.py load_array): a multi-FASTA
// input list to `ska align` / `ska map` builds an in-memory array with
// DEFAULTS (k=31, both strands) and never touches disk. paths/names are
// NUL-separated blobs; any parse failure or empty sample declines.
static long long build_to_array(const uint8_t* paths_blob,
                                long long paths_len,
                                const uint8_t* names_blob,
                                long long names_len, long long n_files,
                                HostArray& a) {
    if (n_files < 2 || n_files > 0x7FFFFFFF) return -1;
    auto paths = split_blob(paths_blob, paths_len, n_files);
    auto names = split_blob(names_blob, names_len, n_files);
    std::vector<std::vector<uint8_t>> batches((size_t)n_files);
    std::vector<const uint8_t*> ptrs((size_t)n_files);
    std::vector<long long> lens((size_t)n_files);
    for (long long i = 0; i < n_files; i++) {
        std::string p(paths[i].first, paths[i].second);
        if (!parse_fasta(p.c_str(), batches[i])) return -1;
        ptrs[i] = batches[i].data();
        lens[i] = (long long)batches[i].size();
    }
    const int k = 31;  // DEFAULT_KMER; implicit builds always use defaults
    long long R = ska_host_build((int)n_files, ptrs.data(), lens.data(),
                                 k, /*rc=*/1);
    if (R <= 0) return -1;
    const uint8_t* var = ska_host_build_variants_ptr();
    const uint64_t* keys = ska_host_build_keys_ptr();
    const int64_t* counts = ska_host_build_counts_ptr();
    std::vector<uint8_t> present((size_t)n_files, 0);
    for (long long r_i = 0; r_i < R; r_i++) {
        const uint8_t* row = var + (size_t)r_i * n_files;
        for (long long s = 0; s < n_files; s++) present[s] |= row[s] != '-';
    }
    for (long long s = 0; s < n_files; s++)
        if (!present[s]) { ska_host_build_release(); return -1; }
    try {
        a.n = R;
        a.S = (int)n_files;
        a.W = 1;
        a.k = k;
        a.k_bits = 64;
        a.rc = 1;
        a.have_keys = true;
        a.keys_sorted = true;  // the build engine emits sorted rows
        a.keys.assign(keys, keys + (size_t)R);
        a.variants.assign(var, var + (size_t)R * n_files);
        a.counts.assign(counts, counts + (size_t)R);
        for (long long i = 0; i < n_files; i++)
            a.names.emplace_back(names[i].first, names[i].second);
    } catch (const std::bad_alloc&) {
        ska_host_build_release();
        return -1;
    }
    ska_host_build_release();
    return 0;
}

long long ska_host_align_fasta(const uint8_t* paths_blob,
                               long long paths_len,
                               const uint8_t* names_blob,
                               long long names_len, long long n_files,
                               const char* out_path, double min_freq,
                               int mode, int ambig_as_missing,
                               int ambig_mask, int ignore_const_gaps) {
    try {
        if (mode < 0 || mode > 3) return -1;
        HostArray a;
        if (build_to_array(paths_blob, paths_len, names_blob, names_len,
                           n_files, a) != 0)
            return -1;
        return align_core(a, out_path, min_freq, mode, ambig_as_missing,
                          ambig_mask, ignore_const_gaps);
    } catch (...) {
        return -3;
    }
}

long long ska_host_map_fasta(const char* ref_path,
                             const uint8_t* paths_blob, long long paths_len,
                             const uint8_t* names_blob, long long names_len,
                             long long n_files, const char* out_path,
                             int vcf, int ambig_mask, int repeat_mask) {
    try {
        HostArray a;
        if (build_to_array(paths_blob, paths_len, names_blob, names_len,
                           n_files, a) != 0)
            return -1;
        return map_core(a, ref_path, out_path, vcf, ambig_mask, repeat_mask,
                        [](const char*) {});
    } catch (...) {
        return -3;
    }
}

// `ska merge` (api.py merge_mode / merge.py extend_arrays; reference
// MergeSkaDict::extend, merge_ska_dict.rs:160-193): union of k-mers
// across files, concatenated sample columns, '-' where a file lacks the
// k-mer; result version = the CURRENT tool version (python: SkaArray
// default), passed in by the caller. paths_blob = NUL-separated .skf
// paths. Nonzero = fall back (k/rc mismatches raise python's errors).
static long long host_merge_impl(const uint8_t* paths_blob,
                                 long long paths_len, long long n_files,
                                 const char* out_path,
                                 const uint8_t* version,
                                 long long version_len) {
    if (n_files < 2) return -1;
    auto paths = split_blob(paths_blob, paths_len, n_files);
    std::vector<HostArray> arrs((size_t)n_files);
    for (long long f = 0; f < n_files; f++) {
        std::string p(paths[f].first, paths[f].second);
        if (load_with_keys(p.c_str(), arrs[f]) != 0) return -1;
        if (arrs[f].k != arrs[0].k || arrs[f].rc != arrs[0].rc ||
            arrs[f].W != arrs[0].W)
            return -1;  // python raises the canonical mismatch errors
        if (!arrs[f].keys_sorted) {
            // reference-written files keep hashmap row order: per-array
            // sort before the linear union (merge.py _sorted_rows)
            HostArray& a = arrs[f];
            const int W = a.W, S = a.S;
            std::vector<int64_t> perm((size_t)a.n);
            for (long long i = 0; i < a.n; i++) perm[i] = i;
            const uint64_t* kd = a.keys.data();
            std::stable_sort(perm.begin(), perm.end(),
                             [kd, W](int64_t x, int64_t y) {
                const uint64_t* px = kd + (size_t)x * W;
                const uint64_t* py = kd + (size_t)y * W;
                if (W == 1) return px[0] < py[0];
                return px[0] < py[0] ||
                       (px[0] == py[0] && px[1] < py[1]);
            });
            std::vector<uint64_t> nk((size_t)a.n * W);
            std::vector<uint8_t> nv((size_t)a.n * S);
            std::vector<int64_t> nc((size_t)a.n);
            for (long long i = 0; i < a.n; i++) {
                memcpy(&nk[(size_t)i * W], kd + (size_t)perm[i] * W,
                       8 * (size_t)W);
                memcpy(&nv[(size_t)i * S],
                       &a.variants[(size_t)perm[i] * S], (size_t)S);
                nc[i] = a.counts[(size_t)perm[i]];
            }
            a.keys.swap(nk);
            a.variants.swap(nv);
            a.counts.swap(nc);
        }
    }
    const int W = arrs[0].W;
    long long total_n = 0, s_total = 0;
    for (auto& a : arrs) {
        total_n += a.n;
        s_total += a.S;
    }
    std::vector<uint64_t> keys_cat;
    std::vector<uint8_t> var_cat;
    std::vector<int64_t> n_off((size_t)n_files + 1, 0),
        v_off((size_t)n_files + 1, 0), col_off((size_t)n_files + 1, 0);
    std::vector<uint64_t> out_keys;
    std::vector<uint8_t> out_var;
    std::vector<int64_t> out_counts;
    try {
        keys_cat.reserve((size_t)total_n * W);
        var_cat.reserve((size_t)0);
        out_keys.resize((size_t)total_n * W);
        out_var.assign((size_t)total_n * (size_t)s_total, '-');
        out_counts.resize((size_t)total_n);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    size_t vbytes = 0;
    for (auto& a : arrs) vbytes += a.variants.size();
    try {
        var_cat.reserve(vbytes);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    for (long long f = 0; f < n_files; f++) {
        HostArray& a = arrs[(size_t)f];
        keys_cat.insert(keys_cat.end(), a.keys.begin(), a.keys.end());
        var_cat.insert(var_cat.end(), a.variants.begin(), a.variants.end());
        n_off[f + 1] = n_off[f] + a.n;
        v_off[f + 1] = v_off[f] + (int64_t)a.variants.size();
        col_off[f + 1] = col_off[f] + a.S;
    }
    int64_t r = ska_merge_batches(keys_cat.data(), n_off.data(),
                                  var_cat.data(), v_off.data(),
                                  col_off.data(), n_files, W,
                                  out_keys.data(), out_var.data(),
                                  out_counts.data(), s_total);
    if (r < 0) return -1;
    HostArray m;
    m.n = r;
    m.S = (int)s_total;
    m.W = W;
    m.k = arrs[0].k;
    m.rc = arrs[0].rc;
    m.have_keys = true;
    m.ska_version.assign((const char*)version, (size_t)version_len);
    out_keys.resize((size_t)r * W);
    out_var.resize((size_t)r * (size_t)s_total);
    out_counts.resize((size_t)r);
    m.keys.swap(out_keys);
    m.variants.swap(out_var);
    m.counts.swap(out_counts);
    for (auto& a : arrs)
        for (auto& nm : a.names) m.names.push_back(nm);
    return save_array(m, out_path);
}

long long ska_host_merge(const uint8_t* paths_blob, long long paths_len,
                         long long n_files, const char* out_path,
                         const uint8_t* version, long long version_len) {
    try {
        return host_merge_impl(paths_blob, paths_len, n_files, out_path,
                               version, version_len);
    } catch (...) {
        return -3;
    }
}

// `ska delete` (api.py delete_mode / array.py delete_samples; reference
// merge_ska_array.rs:231-271): remove named sample columns (a delete
// name removes only the FIRST matching sample — set-discard quirk),
// recount, drop empty rows, save (caller appends .skf). del_blob =
// NUL-separated names. Nonzero = fall back (python raises the
// canonical errors for 0/all/missing names).
static long long host_delete_impl(const char* skf_path,
                                  const uint8_t* del_blob,
                                  long long del_len, long long n_del,
                                  const char* out_path) {
    HostArray a;
    if (load_with_keys(skf_path, a) != 0) return -1;
    if (n_del <= 0) return -1;
    auto del_list = split_blob(del_blob, del_len, n_del);
    // python set semantics: duplicate delete names collapse
    std::vector<std::string> dels;
    for (auto& d : del_list) {
        std::string s(d.first, d.second);
        bool dup = false;
        for (auto& e : dels) dup |= e == s;
        if (!dup) dels.push_back(std::move(s));
    }
    if ((long long)dels.size() >= a.S) return -1;  // removes every sample
    std::vector<int> keep_cols;
    std::vector<std::string> new_names;
    for (int s = 0; s < a.S; s++) {
        bool drop = false;
        for (size_t d = 0; d < dels.size(); d++) {
            if (dels[d] == a.names[s]) {
                drop = true;
                dels.erase(dels.begin() + d);  // first match only
                break;
            }
        }
        if (!drop) {
            keep_cols.push_back(s);
            new_names.push_back(a.names[s]);
        }
    }
    if (!dels.empty()) return -1;  // not found: python raises
    const int S2 = (int)keep_cols.size();
    std::vector<uint8_t> nv;
    try {
        nv.resize((size_t)a.n * S2);
    } catch (const std::bad_alloc&) {
        return -1;
    }
    for (long long i = 0; i < a.n; i++) {
        const uint8_t* row = &a.variants[(size_t)i * a.S];
        uint8_t* orow = &nv[(size_t)i * S2];
        for (int s = 0; s < S2; s++) orow[s] = row[keep_cols[s]];
    }
    a.variants.swap(nv);
    a.S = S2;
    a.names.swap(new_names);
    update_counts(a, false);
    return save_array(a, out_path);
}

long long ska_host_delete(const char* skf_path, const uint8_t* del_blob,
                          long long del_len, long long n_del,
                          const char* out_path) {
    try {
        return host_delete_impl(skf_path, del_blob, del_len, n_del,
                                out_path);
    } catch (...) {
        return -3;
    }
}

long long ska_host_map(const char* ref_path, const char* skf_path,
                       const char* out_path, int vcf, int ambig_mask,
                       int repeat_mask) {
    try {
        return host_map_impl(ref_path, skf_path, out_path, vcf, ambig_mask,
                             repeat_mask);
    } catch (...) {
        return -3;
    }
}

// ctypes wrapper for save_impl: names_blob = NUL-separated utf-8 names
long long ska_host_save(const char* path, const uint64_t* keys,
                        long long n, int W, const uint8_t* variants,
                        long long S, const uint64_t* counts,
                        const uint8_t* names_blob, long long names_len,
                        long long n_names, int k, int rc,
                        const uint8_t* version, long long version_len) {
    try {
        return save_impl(path, keys, n, W, variants, S, counts,
                         split_blob(names_blob, names_len, n_names), k, rc,
                         version, version_len);
    } catch (...) {
        return -3;
    }
}

// `ska build` for a FASTA cohort, end to end: parse every input, run
// the native build engine (host_build.cpp — byte-identical to the
// device pipeline), verify every sample contributed k-mers (the
// reference panics on an empty sample, ska_dict.rs:374-376; we decline
// so the python route raises its exact error), and write the .skf.
// 0 ok; nonzero = caller falls back to the python pipeline.
// FASTQ-capable cohort build: per sample one or two files (p2 entry
// empty = single), plain or gzipped, FASTA or FASTQ (is_reads = first
// file's format, ska_dict.rs:357-366); quality modes + min-count as in
// the device pipeline. Writes the .skf; nonzero = python route.
long long ska_host_build_files2(
    const char* out_path, const uint8_t* p1_blob, long long p1_len,
    const uint8_t* p2_blob, long long p2_len, long long n_files,
    const uint8_t* names_blob, long long names_len, int k, int rc,
    int qf_mode, int min_qual, long long min_count,
    const uint8_t* version, long long version_len) {
    if (n_files <= 0 || n_files > 0x7FFFFFFF) return -1;
    if (min_count < 1 || min_count > 0x7FFFFFFF) return -1;
    try {
        auto p1 = split_blob(p1_blob, p1_len, n_files);
        auto p2 = split_blob(p2_blob, p2_len, n_files);
        auto names = split_blob(names_blob, names_len, n_files);
        std::vector<std::vector<uint8_t>> bseq((size_t)n_files);
        std::vector<std::vector<uint8_t>> bqual((size_t)n_files);
        std::vector<uint8_t> reads((size_t)n_files, 0);
        for (long long s = 0; s < n_files; s++) {
            std::vector<std::vector<uint8_t>> rs, rq;
            bool is_fq = false;
            std::string f1(p1[s].first, p1[s].second);
            if (!parse_fastx_records(f1.c_str(), rs, rq, is_fq, true))
                return -1;
            if (p2[s].second) {
                std::string f2(p2[s].first, p2[s].second);
                bool dummy = false;
                if (!parse_fastx_records(f2.c_str(), rs, rq, dummy, false))
                    return -1;
            }
            reads[s] = is_fq ? 1 : 0;
            // flat batch: records 0x00-separated, qual aligned
            // (fastx.py build_batch; FASTA records fill 0xFF)
            size_t total = 0;
            for (auto& r : rs) total += r.size() + 1;
            if (total) total -= 1;
            bseq[s].reserve(total);
            bqual[s].reserve(total);
            for (size_t r = 0; r < rs.size(); r++) {
                if (r) {
                    bseq[s].push_back(0);
                    bqual[s].push_back(0);
                }
                bseq[s].insert(bseq[s].end(), rs[r].begin(), rs[r].end());
                if (rq[r].empty() && !rs[r].empty()) {
                    bqual[s].resize(bqual[s].size() + rs[r].size(), 0xFF);
                } else {
                    bqual[s].insert(bqual[s].end(), rq[r].begin(),
                                    rq[r].end());
                }
            }
        }
        std::vector<const uint8_t*> sp((size_t)n_files),
            qp((size_t)n_files);
        std::vector<long long> lens((size_t)n_files);
        for (long long s = 0; s < n_files; s++) {
            sp[s] = bseq[s].data();
            qp[s] = bqual[s].data();
            lens[s] = (long long)bseq[s].size();
        }
        long long R = ska_host_build_fastq(
            (int)n_files, sp.data(), lens.data(), qp.data(), reads.data(),
            k, rc, qf_mode, min_qual, (unsigned)min_count);
        if (R <= 0) return -1;
        const uint8_t* var = ska_host_build_variants_ptr();
        std::vector<uint8_t> present((size_t)n_files, 0);
        for (long long r_i = 0; r_i < R; r_i++) {
            const uint8_t* row = var + (size_t)r_i * n_files;
            for (long long s = 0; s < n_files; s++)
                present[s] |= row[s] != '-';
        }
        for (long long s = 0; s < n_files; s++)
            if (!present[s]) { ska_host_build_release(); return -1; }
        int W = k <= 31 ? 1 : 2;
        long long rcv = save_impl(
            out_path, ska_host_build_keys_ptr(), R, W, var, n_files,
            (const uint64_t*)ska_host_build_counts_ptr(), names, k, rc,
            version, version_len);
        ska_host_build_release();
        return rcv;
    } catch (...) {
        ska_host_build_release();
        return -3;
    }
}

long long ska_host_build_files(const char* out_path,
                               const uint8_t* paths_blob,
                               long long paths_len, long long n_files,
                               const uint8_t* names_blob,
                               long long names_len, int k, int rc,
                               const uint8_t* version,
                               long long version_len) {
    if (n_files <= 0 || n_files > 0x7FFFFFFF) return -1;
    try {
    auto paths = split_blob(paths_blob, paths_len, n_files);
    auto names = split_blob(names_blob, names_len, n_files);
    std::vector<std::vector<uint8_t>> batches((size_t)n_files);
    std::vector<const uint8_t*> ptrs((size_t)n_files);
    std::vector<long long> lens((size_t)n_files);
    for (long long i = 0; i < n_files; i++) {
        std::string p(paths[i].first, paths[i].second);
        if (!parse_fasta(p.c_str(), batches[i])) return -1;
        ptrs[i] = batches[i].data();
        lens[i] = (long long)batches[i].size();
    }
    long long R = ska_host_build((int)n_files, ptrs.data(), lens.data(),
                                 k, rc);
    if (R < 0) return -1;
    const uint8_t* var = ska_host_build_variants_ptr();
    std::vector<uint8_t> present((size_t)n_files, 0);
    for (long long r_i = 0; r_i < R; r_i++) {
        const uint8_t* row = var + (size_t)r_i * n_files;
        for (long long s = 0; s < n_files; s++) present[s] |= row[s] != '-';
    }
    for (long long s = 0; s < n_files; s++)
        if (!present[s]) { ska_host_build_release(); return -1; }
    int W = k <= 31 ? 1 : 2;
    long long rcv = save_impl(
        out_path, ska_host_build_keys_ptr(), R, W, var, n_files,
        (const uint64_t*)ska_host_build_counts_ptr(), names, k, rc,
        version, version_len);
    ska_host_build_release();
    return rcv;
    } catch (...) {
        ska_host_build_release();
        return -3;
    }
}

}  // extern "C"
