// Measured stand-in for the reference's single-core build hot path, plus
// (mode "e2e") whole-command proxies for build/align/map/distance.
//
// The image has no Rust toolchain, so ska.rust itself cannot be built and
// timed here. The default mode reproduces the reference's per-sample
// dictionary build loop faithfully enough to serve as the bench.py
// denominator:
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
//
// Mode "e2e" (scripts/bench_cmds.py denominators): end-to-end command
// proxies over the SAME FASTA files the CLI bench reads, all single
// threaded (this host has 1 core; the reference defaults to 1 thread):
//
//   build    = FASTA parse -> per-sample dicts -> merged
//              HashMap<kmer, Vec<u8>> appends (merge_ska_dict.rs:77-109,
//              serial path of build_and_merge :354-417) -> array
//              conversion (merge_ska_array.rs:166-186) -> CBOR encode +
//              snappy frame write (merge_ska_array.rs:191-204).
//   align    = .skf load (frame decode + CBOR) -> update_counts +
//              min_freq ceil(0.9*S) + NoConst row filter
//              (generic_modes.rs:22-50,112-131) -> transpose + FASTA out.
//   map_aln  = .skf load -> positional ref k-mer scan (ska_ref.rs:189-311)
//              -> to_dict hashmap build (merge_ska_array.rs:209-221) ->
//              per-ref-kmer lookup (ska_ref.rs:508-533) -> per-sample
//              pseudoalignment fill + write. The overhang state machine
//              (aln_writer.rs:95-158) is simplified to a last-written
//              high-water fill — same O(genome) cost class per sample.
//   distance = .skf load -> NoConst constant-site count -> per-pair
//              per-site walk via a 256x256 (dist, match, mismatch) LUT
//              (merge_ska_array.rs:416-438,587-632) -> TSV out.
//
// e2e output: one JSON line {"ref_build_s":..,"ref_align_s":..,
// "ref_map_aln_s":..,"ref_distance_s":..,"n_kmers":..}.
// Reuses the snappy/CRC/CBOR primitives from skanative.cpp (link both).

#include <algorithm>
#include <array>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <unordered_map>
#include <unordered_set>
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

// ---------------------------------------------------------------------------
// e2e command proxies
// ---------------------------------------------------------------------------

extern "C" {
uint32_t ska_crc32c(const uint8_t* data, size_t n);
long long ska_snappy_compress(const uint8_t* in, size_t n, uint8_t* out, size_t out_cap);
long long ska_snappy_uncompress(const uint8_t* in, size_t n, uint8_t* out, size_t out_cap);
long long ska_snappy_uncompressed_length(const uint8_t* in, size_t n);
}

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

// FASTA -> uppercase sequence bytes; records separated by 'N' (k-mer reset,
// matching the reference's per-record iterator restart).
static std::vector<uint8_t> read_fasta(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw(sz);
    if (sz && fread(raw.data(), 1, sz, f) != (size_t)sz) { fclose(f); exit(1); }
    fclose(f);
    std::vector<uint8_t> seq;
    seq.reserve(sz);
    size_t i = 0;
    bool first = true;
    while (i < raw.size()) {
        if (raw[i] == '>') {  // header line
            if (!first) seq.push_back('N');
            first = false;
            while (i < raw.size() && raw[i] != '\n') i++;
            i++;
            continue;
        }
        while (i < raw.size() && raw[i] != '\n') {
            uint8_t c = raw[i++];
            seq.push_back(c >= 'a' ? c - 32 : c);
        }
        i++;
    }
    return seq;
}

// Merged dictionary: kmer -> row index into a (rows x S) column store
// (MergeSkaDict's HashMap<IntT, Vec<u8>>, merge_ska_dict.rs:28-39).
struct MergedMap {
    std::vector<uint64_t> keys;
    std::vector<uint32_t> rows;
    std::vector<uint8_t> used;
    size_t mask = 0, count = 0, limit = 0;
    explicit MergedMap(size_t cap0 = 1 << 12) { rehash(cap0); }
    void rehash(size_t cap) {
        std::vector<uint64_t> ok = std::move(keys);
        std::vector<uint32_t> orow = std::move(rows);
        std::vector<uint8_t> ou = std::move(used);
        keys.assign(cap, 0);
        rows.assign(cap, 0);
        used.assign(cap, 0);
        mask = cap - 1;
        limit = cap - cap / 4;
        count = 0;
        for (size_t i = 0; i < ou.size(); i++)
            if (ou[i]) {
                size_t j = ahash_mix(ok[i]) & mask;
                while (used[j]) j = (j + 1) & mask;
                used[j] = 1; keys[j] = ok[i]; rows[j] = orow[i]; count++;
            }
    }
    // returns row index, assigning next_row on first sight
    uint32_t row_for(uint64_t kq, uint32_t next_row, bool* fresh) {
        if (count >= limit) rehash((mask + 1) * 2);
        size_t i = ahash_mix(kq) & mask;
        while (used[i]) {
            if (keys[i] == kq) { *fresh = false; return rows[i]; }
            i = (i + 1) & mask;
        }
        used[i] = 1; keys[i] = kq; rows[i] = next_row; count++;
        *fresh = true;
        return next_row;
    }
    // lookup only; returns row or UINT32_MAX
    uint32_t find(uint64_t kq) const {
        size_t i = ahash_mix(kq) & mask;
        while (used[i]) {
            if (keys[i] == kq) return rows[i];
            i = (i + 1) & mask;
        }
        return UINT32_MAX;
    }
};

// CBOR primitive emitters (ciborium-compatible minimal-width heads)
static inline void cb_head(std::vector<uint8_t>& o, uint8_t major, uint64_t v) {
    uint8_t m = major << 5;
    if (v < 24) o.push_back(m | (uint8_t)v);
    else if (v < 0x100) { o.push_back(m | 24); o.push_back((uint8_t)v); }
    else if (v < 0x10000) {
        o.push_back(m | 25); o.push_back((uint8_t)(v >> 8)); o.push_back((uint8_t)v);
    } else if (v < 0x100000000ull) {
        o.push_back(m | 26);
        for (int i = 3; i >= 0; i--) o.push_back((uint8_t)(v >> (8 * i)));
    } else {
        o.push_back(m | 27);
        for (int i = 7; i >= 0; i--) o.push_back((uint8_t)(v >> (8 * i)));
    }
}
static inline void cb_text(std::vector<uint8_t>& o, const char* s) {
    size_t n = strlen(s);
    cb_head(o, 3, n);
    o.insert(o.end(), (const uint8_t*)s, (const uint8_t*)s + n);
}

// snappy frame encode to file (snap::write::FrameEncoder: 64KB chunks,
// masked crc32c of the uncompressed data per chunk)
static void snappy_frame_write(FILE* f, const std::vector<uint8_t>& data) {
    static const uint8_t ident[] = {0xFF, 6, 0, 0, 's', 'N', 'a', 'P', 'p', 'Y'};
    fwrite(ident, 1, sizeof(ident), f);
    std::vector<uint8_t> comp(32 + 65536 + 65536 / 6);
    for (size_t pos = 0; pos < data.size(); pos += 65536) {
        size_t n = data.size() - pos < 65536 ? data.size() - pos : 65536;
        uint32_t crc = ska_crc32c(data.data() + pos, n);
        uint32_t masked = ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
        long long cn = ska_snappy_compress(data.data() + pos, n, comp.data(), comp.size());
        bool use_comp = cn > 0 && (size_t)cn < n;
        uint32_t body = 4 + (uint32_t)(use_comp ? cn : n);
        uint8_t hdr[8] = {use_comp ? (uint8_t)0x00 : (uint8_t)0x01,
                          (uint8_t)body, (uint8_t)(body >> 8), (uint8_t)(body >> 16),
                          (uint8_t)masked, (uint8_t)(masked >> 8),
                          (uint8_t)(masked >> 16), (uint8_t)(masked >> 24)};
        fwrite(hdr, 1, 8, f);
        fwrite(use_comp ? comp.data() : data.data() + pos, 1, use_comp ? cn : n, f);
    }
}

// snappy frame decode of a whole file
static std::vector<uint8_t> snappy_frame_read(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw(sz);
    if (sz && fread(raw.data(), 1, sz, f) != (size_t)sz) { fclose(f); exit(1); }
    fclose(f);
    std::vector<uint8_t> out;
    out.reserve(sz * 3);
    size_t i = 0;
    while (i + 4 <= raw.size()) {
        uint8_t type = raw[i];
        uint32_t len = raw[i + 1] | (raw[i + 2] << 8) | ((uint32_t)raw[i + 3] << 16);
        i += 4;
        if (type == 0xFF) { i += len; continue; }        // ident
        if (type == 0x01) {                              // uncompressed
            out.insert(out.end(), raw.begin() + i + 4, raw.begin() + i + len);
        } else if (type == 0x00) {                       // compressed
            const uint8_t* body = raw.data() + i + 4;
            size_t bn = len - 4;
            long long un = ska_snappy_uncompressed_length(body, bn);
            size_t base = out.size();
            out.resize(base + un);
            ska_snappy_uncompress(body, bn, out.data() + base, un);
        }
        i += len;
    }
    return out;
}

// CBOR uint decode walk (for the load proxy)
static inline uint64_t cb_read_uint(const std::vector<uint8_t>& b, size_t& p) {
    uint8_t h = b[p++] & 0x1F;
    if (h < 24) return h;
    int n = h == 24 ? 1 : h == 25 ? 2 : h == 26 ? 4 : 8;
    uint64_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 8) | b[p++];
    return v;
}

struct E2EArray {
    int k = 0, S = 0;
    uint64_t n = 0;
    std::vector<uint64_t> kmers;
    std::vector<uint8_t> variants;  // n x S
    std::vector<uint64_t> counts;
    std::vector<std::string> names;
};

static void e2e_save(const E2EArray& a, const char* path) {
    std::vector<uint8_t> buf;
    buf.reserve(a.n * 6 + a.n * a.S + 64);
    cb_head(buf, 5, 8);  // struct map, 8 fields (merge_ska_array.rs:108-126)
    cb_text(buf, "ska_version"); cb_text(buf, "ref-proxy");
    cb_text(buf, "k_bits"); cb_head(buf, 0, 64);
    cb_text(buf, "k"); cb_head(buf, 0, a.k);
    cb_text(buf, "rc"); buf.push_back(0xF5);
    cb_text(buf, "names"); cb_head(buf, 4, a.names.size());
    for (auto& s : a.names) cb_text(buf, s.c_str());
    cb_text(buf, "split_kmers"); cb_head(buf, 4, a.n);
    for (uint64_t i = 0; i < a.n; i++) cb_head(buf, 0, a.kmers[i]);
    cb_text(buf, "variants");
    cb_head(buf, 5, 2);  // ndarray-serde-ish {dim, data}
    cb_text(buf, "dim"); cb_head(buf, 4, 2);
    cb_head(buf, 0, a.n); cb_head(buf, 0, a.S);
    cb_text(buf, "data"); cb_head(buf, 4, a.n * a.S);
    for (size_t i = 0; i < a.variants.size(); i++) cb_head(buf, 0, a.variants[i]);
    cb_text(buf, "variant_count"); cb_head(buf, 4, a.n);
    for (uint64_t i = 0; i < a.n; i++) cb_head(buf, 0, a.counts[i]);
    FILE* f = fopen(path, "wb");
    if (!f) { fprintf(stderr, "cannot write %s\n", path); exit(1); }
    snappy_frame_write(f, buf);
    fclose(f);
}

static E2EArray e2e_load(const char* path) {
    std::vector<uint8_t> buf = snappy_frame_read(path);
    E2EArray a;
    size_t p = 0;
    cb_read_uint(buf, p);  // struct map head
    auto skip_text = [&](void) {
        uint64_t n = cb_read_uint(buf, p);
        p += n;
    };
    skip_text(); skip_text();                  // ska_version: str
    skip_text(); cb_read_uint(buf, p);         // k_bits
    skip_text(); a.k = (int)cb_read_uint(buf, p);
    skip_text(); p++;                          // rc bool
    skip_text();
    uint64_t nn = cb_read_uint(buf, p);        // names
    for (uint64_t i = 0; i < nn; i++) {
        uint64_t ln = cb_read_uint(buf, p);
        a.names.emplace_back((const char*)buf.data() + p, ln);
        p += ln;
    }
    a.S = (int)nn;
    skip_text();
    a.n = cb_read_uint(buf, p);                // split_kmers
    a.kmers.resize(a.n);
    for (uint64_t i = 0; i < a.n; i++) a.kmers[i] = cb_read_uint(buf, p);
    skip_text(); cb_read_uint(buf, p);         // variants struct map
    skip_text(); cb_read_uint(buf, p);         // dim array
    cb_read_uint(buf, p); cb_read_uint(buf, p);
    skip_text();
    uint64_t cells = cb_read_uint(buf, p);
    a.variants.resize(cells);
    for (uint64_t i = 0; i < cells; i++) a.variants[i] = (uint8_t)cb_read_uint(buf, p);
    skip_text(); cb_read_uint(buf, p);         // variant_count
    a.counts.resize(a.n);
    for (uint64_t i = 0; i < a.n; i++) a.counts[i] = cb_read_uint(buf, p);
    return a;
}

// rolling scan emitting (canonical split key, canonical mid ascii, rc flag)
// per window, in positional order; cb(pos_of_window_start, key, mid, rc)
template <class F>
static void scan_windows(const std::vector<uint8_t>& g, int k, F&& cb) {
    const int h = (k - 1) / 2;
    const uint64_t kmask = (k < 32) ? ((1ull << (2 * k)) - 1) : ~0ull;
    const uint64_t lowmask = (1ull << (2 * h)) - 1;
    uint64_t fwd = 0, rc = 0;
    long have = 0;
    for (size_t i = 0; i < g.size(); i++) {
        uint8_t c = g[i];
        if ((c & 0xF) == 14) { have = 0; fwd = rc = 0; continue; }
        uint64_t code = (c >> 1) & 3;
        fwd = ((fwd << 2) | code) & kmask;
        rc = (rc >> 2) | ((code ^ 2) << (2 * (k - 1)));
        if (++have < k) continue;
        uint64_t fkey = ((fwd >> (2 * (h + 1))) << (2 * h)) | (fwd & lowmask);
        uint64_t rkey = ((rc >> (2 * (h + 1))) << (2 * h)) | (rc & lowmask);
        bool is_rc = rkey < fkey;
        uint64_t key = is_rc ? rkey : fkey;
        uint64_t mid = is_rc ? (rc >> (2 * h)) & 3 : (fwd >> (2 * h)) & 3;
        cb(i + 1 - k, key, (uint8_t)BASES[mid], is_rc);
    }
}

// ---------------------------------------------------------------------------
// skalo (`ska lo`) single-core proxy — reproduces the reference pipeline
// (src/skalo/) with the same data-structure class: hashbrown/ahash-style
// flat maps and sets, per-path cloned visited sets, explicit-stack DFS
// (read_graph.rs:19-157), chain compaction (compaction.rs), dedup-ordered
// SNP calling (process_variants.rs:20-225) and reference positioning
// (positioning.rs). Single-threaded like the 1-core bench environment.
// Sample sets use one u64 mask (proxy supports S <= 64; the command bench
// runs 4 or 32 samples) where the reference uses BitSet — same O(1)
// compare/lookup class. Outputs the same three/four files so the IO cost
// is included; byte-parity with the reference is NOT claimed (hashmap
// iteration order differs), this is a wall-clock denominator.
// ---------------------------------------------------------------------------

static inline uint64_t rc_kmer(uint64_t x, int n) {
    // reverse 2-bit base groups of the low 2n bits, complement each
    // (A=00<->T=10, C=01<->G=11: code ^ 2)
    x = ((x & 0x3333333333333333ull) << 2) | ((x >> 2) & 0x3333333333333333ull);
    x = ((x & 0x0F0F0F0F0F0F0F0Full) << 4) | ((x >> 4) & 0x0F0F0F0F0F0F0F0Full);
    x = __builtin_bswap64(x);
    x >>= (64 - 2 * n);
    return x ^ (0xAAAAAAAAAAAAAAAAull >> (64 - 2 * n));
}

// open-addressing u64 set (hashbrown::HashSet class); clonable for the
// per-path visited sets the reference clones at each branch
struct Set64 {
    std::vector<uint64_t> keys;
    std::vector<uint8_t> used;
    size_t mask = 0, count = 0, limit = 0;
    explicit Set64(size_t cap0 = 16) { rehash(cap0); }
    void rehash(size_t cap) {
        std::vector<uint64_t> ok = std::move(keys);
        std::vector<uint8_t> ou = std::move(used);
        keys.assign(cap, 0);
        used.assign(cap, 0);
        mask = cap - 1;
        limit = cap - cap / 4;
        count = 0;
        for (size_t i = 0; i < ou.size(); i++)
            if (ou[i]) insert(ok[i]);
    }
    void insert(uint64_t k) {
        if (count >= limit) rehash((mask + 1) * 2);
        size_t i = ahash_mix(k) & mask;
        while (used[i]) {
            if (keys[i] == k) return;
            i = (i + 1) & mask;
        }
        used[i] = 1;
        keys[i] = k;
        count++;
    }
    bool contains(uint64_t k) const {
        size_t i = ahash_mix(k) & mask;
        while (used[i]) {
            if (keys[i] == k) return true;
            i = (i + 1) & mask;
        }
        return false;
    }
};

static const char* CODE2ASCII = "ACTG";  // code order 00,01,10,11

static std::string decode_kmer_str(uint64_t x, int n) {
    std::string s(n, 'A');
    for (int i = n - 1; i >= 0; i--) {
        s[i] = CODE2ASCII[x & 3];
        x >>= 2;
    }
    return s;
}
static uint64_t encode_kmer_str(const char* s, int n) {
    uint64_t x = 0;
    for (int i = 0; i < n; i++) x = (x << 2) | ((s[i] >> 1) & 3);
    return x;
}

struct LoVariant {
    std::string seq;
    std::vector<uint32_t> snps;
};
struct LoGroup {
    uint64_t entry, exit;
    std::vector<LoVariant> vars;
};

static double run_lo(const E2EArray& a, const char* ref_path,
                     const char* out_prefix) {
    if (a.k > 31 || a.S > 64) return -1.0;  // proxy envelope
    double t0 = now_s();
    const int k = a.k, kg = k - 1, h = (k - 1) / 2;
    const uint64_t lowmask = (1ull << (2 * h)) - 1;
    const uint64_t nodemask = (1ull << (2 * kg)) - 1;

    // ---- build_graph (input.rs:18-125) ------------------------------------
    MergedMap node_idx;               // (k-1)-mer -> adj index
    std::vector<std::vector<uint64_t>> adj;
    MergedMap full_idx;               // k-mer -> sample-mask index
    std::vector<uint64_t> full_mask;  // set-once (or_insert_with semantics)
    auto add_edge = [&](uint64_t n1, uint64_t n2) {
        bool fresh;
        uint32_t r = node_idx.row_for(n1, (uint32_t)adj.size(), &fresh);
        if (fresh) adj.emplace_back();
        adj[r].push_back(n2);
    };
    auto set_samples = [&](uint64_t full, uint64_t m) {
        bool fresh;
        full_idx.row_for(full, (uint32_t)full_mask.size(), &fresh);
        if (fresh) full_mask.push_back(m);  // first wins
    };
    for (uint64_t r = 0; r < a.n; r++) {
        uint64_t key = a.kmers[r];
        uint64_t left = key >> (2 * h), right = key & lowmask;
        // middle-base -> sample mask via the degenerate code
        uint64_t per_code[4] = {0, 0, 0, 0};
        for (int s = 0; s < a.S; s++) {
            int st = set_of_ascii(a.variants[r * a.S + s]);
            if (!st) continue;  // '-'
            if (st & 1) per_code[0] |= 1ull << s;  // A
            if (st & 2) per_code[1] |= 1ull << s;  // C
            if (st & 4) per_code[3] |= 1ull << s;  // G (code 11)
            if (st & 8) per_code[2] |= 1ull << s;  // T (code 10)
        }
        for (int code = 0; code < 4; code++) {
            if (!per_code[code]) continue;
            uint64_t full = (left << (2 * (h + 1))) | ((uint64_t)code << (2 * h)) | right;
            uint64_t n1 = full >> 2, n2 = full & nodemask;
            add_edge(n1, n2);
            add_edge(rc_kmer(n2, kg), rc_kmer(n1, kg));
            set_samples(full, per_code[code]);
            set_samples(rc_kmer(full, k), per_code[code]);
        }
    }

    // ---- extremities (extremities.rs:10-51) --------------------------------
    Set64 start_kmers, end_kmers;
    for (size_t i = 0; i <= node_idx.mask; i++) {
        if (!node_idx.used[i]) continue;
        const std::vector<uint64_t>& nx = adj[node_idx.rows[i]];
        if (nx.size() < 2) continue;
        uint64_t kmer = node_idx.keys[i];
        bool found = false;
        for (size_t p = 0; p < nx.size() && !found; p++)
            for (size_t q = p + 1; q < nx.size() && !found; q++) {
                uint64_t f1 = (kmer << 2 | (nx[p] & 3)) & ((nodemask << 2) | 3);
                uint64_t f2 = (kmer << 2 | (nx[q] & 3)) & ((nodemask << 2) | 3);
                uint64_t m1 = full_mask[full_idx.find(f1)];
                uint64_t m2 = full_mask[full_idx.find(f2)];
                if (m1 != m2) found = true;
            }
        if (found) {
            start_kmers.insert(kmer);
            end_kmers.insert(rc_kmer(kmer, kg));
        }
    }
    if (start_kmers.count == 0) return now_s() - t0;  // no variants

    // ---- compaction (compaction.rs:10-117) ---------------------------------
    MergedMap comp_idx;
    std::vector<std::vector<uint64_t>> comp_chains;
    auto compact_from = [&](const Set64& extrem) {
        for (size_t i = 0; i <= extrem.mask; i++) {
            if (!extrem.used[i]) continue;
            uint32_t r0 = node_idx.find(extrem.keys[i]);
            if (r0 == UINT32_MAX) continue;
            std::vector<uint64_t> starters = adj[r0];  // snapshot
            for (uint64_t starting : starters) {
                uint64_t cur = starting;
                Set64 visited;
                std::vector<uint64_t> vec;
                while (true) {
                    uint32_t rr = node_idx.find(cur);
                    if (rr == UINT32_MAX) break;
                    const std::vector<uint64_t>& nx = adj[rr];
                    if (nx.size() != 1 || visited.contains(nx[0])) break;
                    cur = nx[0];
                    vec.push_back(cur);
                    visited.insert(cur);
                    if (end_kmers.contains(cur) || start_kmers.contains(cur)) break;
                }
                if (vec.size() > 1) {
                    bool fresh;
                    uint32_t ci = comp_idx.row_for(starting, (uint32_t)comp_chains.size(), &fresh);
                    if (fresh) comp_chains.emplace_back(std::move(vec));
                    else comp_chains[ci] = std::move(vec);  // DashMap insert overwrites
                }
            }
        }
    };
    compact_from(start_kmers);
    compact_from(end_kmers);
    // rewire the graph and trim chains (compaction.rs:95-117)
    for (size_t i = 0; i <= comp_idx.mask; i++) {
        if (!comp_idx.used[i]) continue;
        uint64_t starting = comp_idx.keys[i];
        std::vector<uint64_t>& vec = comp_chains[comp_idx.rows[i]];
        auto retain_not = [&](uint64_t from, uint64_t drop) {
            uint32_t rr = node_idx.find(from);
            if (rr == UINT32_MAX) return;
            std::vector<uint64_t>& v = adj[rr];
            v.erase(std::remove(v.begin(), v.end(), drop), v.end());
        };
        retain_not(starting, vec[0]);
        for (size_t w = 0; w + 1 < vec.size() - 1; w++) retain_not(vec[w], vec[w + 1]);
        bool fresh;
        uint32_t rr = node_idx.row_for(starting, (uint32_t)adj.size(), &fresh);
        if (fresh) adj.emplace_back();
        adj[rr].push_back(vec.back());
        vec.pop_back();
    }

    // ---- traversal (read_graph.rs:19-272) -----------------------------------
    const int max_depth = 4;  // cli.rs:33 default
    std::vector<LoGroup> groups, indel_groups;
    struct PathState {
        uint64_t cur;
        Set64 visited;
        std::vector<uint64_t> vec;
        int depth;
    };
    for (size_t ei = 0; ei <= start_kmers.mask; ei++) {
        if (!start_kmers.used[ei]) continue;
        uint64_t entry = start_kmers.keys[ei];
        uint32_t er = node_idx.find(entry);
        if (er == UINT32_MAX) continue;
        MergedMap exit_idx;
        std::vector<std::vector<std::vector<uint64_t>>> exit_paths;
        auto save_path = [&](uint64_t exitk, const std::vector<uint64_t>& v) {
            bool fresh;
            uint32_t xi = exit_idx.row_for(exitk, (uint32_t)exit_paths.size(), &fresh);
            if (fresh) exit_paths.emplace_back();
            exit_paths[xi].push_back(v);
        };
        std::vector<uint64_t> good_next;
        for (uint64_t starting : adj[er]) {
            Set64 visited;
            visited.insert(entry);
            visited.insert(starting);
            std::vector<uint64_t> vecv = {entry, starting};
            uint32_t ci = comp_idx.find(starting);
            if (ci != UINT32_MAX)
                vecv.insert(vecv.end(), comp_chains[ci].begin(), comp_chains[ci].end());
            std::vector<PathState> stack;
            stack.push_back({starting, visited, vecv, 0});
            while (!stack.empty()) {
                PathState st = std::move(stack.back());
                stack.pop_back();
                if (st.depth > max_depth) continue;
                bool walking = true;
                while (walking) {
                    good_next.clear();
                    uint32_t rr = node_idx.find(st.cur);
                    if (rr != UINT32_MAX)
                        for (uint64_t k2 : adj[rr])
                            if (!st.visited.contains(k2)) good_next.push_back(k2);
                    if (good_next.size() == 1) {
                        uint64_t next = good_next[0];
                        st.visited.insert(next);
                        st.vec.push_back(next);
                        st.cur = next;
                        uint32_t c2 = comp_idx.find(next);
                        if (c2 != UINT32_MAX)
                            st.vec.insert(st.vec.end(), comp_chains[c2].begin(),
                                          comp_chains[c2].end());
                        if (end_kmers.contains(next)) save_path(next, st.vec);
                    } else if (good_next.size() > 1) {
                        for (uint64_t next : good_next) {
                            Set64 nv = st.visited;  // clone, as the reference does
                            nv.insert(next);
                            std::vector<uint64_t> nvec = st.vec;
                            nvec.push_back(next);
                            uint32_t c2 = comp_idx.find(next);
                            if (c2 != UINT32_MAX)
                                nvec.insert(nvec.end(), comp_chains[c2].begin(),
                                            comp_chains[c2].end());
                            if (end_kmers.contains(next)) save_path(next, nvec);
                            stack.push_back({next, std::move(nv), std::move(nvec),
                                             st.depth + 1});
                        }
                        walking = false;
                    } else {
                        walking = false;
                    }
                }
            }
        }
        // check-filter-build variant groups (read_graph.rs:161-220)
        for (size_t xi2 = 0; xi2 <= exit_idx.mask; xi2++) {
            if (!exit_idx.used[xi2]) continue;
            std::vector<std::vector<uint64_t>>& paths = exit_paths[exit_idx.rows[xi2]];
            if (paths.size() < 2) continue;
            Set64 second, second_last;
            for (auto& v : paths) {
                second.insert(v[1]);
                second_last.insert(v[v.size() - 2]);
            }
            if (second.count < 2 || second_last.count < 2) continue;
            // most-common length (ties: any — hashmap order in the reference)
            std::vector<size_t> lens;
            for (auto& v : paths) lens.push_back(v.size());
            std::sort(lens.begin(), lens.end());
            size_t best_len = lens[0], best_cnt = 0, run = 1;
            for (size_t i2 = 1; i2 <= lens.size(); i2++) {
                if (i2 < lens.size() && lens[i2] == lens[i2 - 1]) run++;
                else {
                    if (run > best_cnt) { best_cnt = run; best_len = lens[i2 - 1]; }
                    run = 1;
                }
            }
            LoGroup g;
            g.entry = entry;
            g.exit = exit_idx.keys[xi2];
            for (auto& v : paths) {
                if (paths.size() != 2 && v.size() != best_len) continue;
                LoVariant var;
                var.seq = decode_kmer_str(entry, kg);
                var.seq.reserve(v.size() + kg);
                for (size_t i2 = 1; i2 < v.size(); i2++)
                    var.seq.push_back(CODE2ASCII[v[i2] & 3]);
                for (size_t i2 = 0; i2 < v.size(); i2++) {
                    if (start_kmers.contains(v[i2]) && i2 + kg <= v.size())
                        var.snps.push_back((uint32_t)(i2 + kg));
                    else if (end_kmers.contains(v[i2]) && i2 >= 1)
                        var.snps.push_back((uint32_t)(i2 - 1));
                }
                g.vars.push_back(std::move(var));
            }
            if (g.vars.size() < 2) continue;
            // indel split (read_graph.rs:236-262)
            if (g.vars.size() == 2 && g.vars[0].seq.size() != g.vars[1].seq.size() &&
                (g.vars[0].seq.size() <= (size_t)(2 * kg) ||
                 g.vars[1].seq.size() <= (size_t)(2 * kg)))
                indel_groups.push_back(std::move(g));
            else
                groups.push_back(std::move(g));
        }
    }

    // ---- indels: dereplicate + minimal VCF (process_indels.rs) -------------
    Set64 entries_indels;
    {
        std::vector<std::pair<size_t, size_t>> order;  // (total_len, idx)
        for (size_t i = 0; i < indel_groups.size(); i++) {
            size_t tl = 0;
            for (auto& v : indel_groups[i].vars) tl += v.seq.size();
            order.push_back({tl, i});
        }
        std::sort(order.begin(), order.end(), [&](auto& x, auto& y) {
            if (x.first != y.first) return x.first < y.first;
            return indel_groups[x.second].entry < indel_groups[y.second].entry;
        });
        std::string vcf = std::string(out_prefix) + "_indels.vcf";
        FILE* f = fopen(vcf.c_str(), "wb");
        fprintf(f, "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                   "FILTER\tINFO\tFORMAT\n");
        for (auto& [tl, gi] : order) {
            LoGroup& g = indel_groups[gi];
            if (entries_indels.contains(g.entry)) continue;
            entries_indels.insert(g.entry);
            entries_indels.insert(rc_kmer(g.entry, kg));
            entries_indels.insert(g.exit);
            entries_indels.insert(rc_kmer(g.exit, kg));
            // sample masks of the two branch-first k-mers; missing filter
            uint64_t m0 = 0, m1 = 0;
            uint32_t i0 = full_idx.find(encode_kmer_str(g.vars[0].seq.c_str(), kg + 1));
            uint32_t i1 = full_idx.find(encode_kmer_str(g.vars[1].seq.c_str(), kg + 1));
            if (i0 != UINT32_MAX) m0 = full_mask[i0];
            if (i1 != UINT32_MAX) m1 = full_mask[i1];
            int missing = 0;
            bool refp = false, altp = false;
            for (int s = 0; s < a.S; s++) {
                bool r0 = (m0 >> s) & 1, r1 = (m1 >> s) & 1;
                if (r0 == r1) missing++;
                else if (r0) refp = true;
                else altp = true;
            }
            if ((float)missing / a.S <= 0.1f && refp && altp)
                fprintf(f, ".\t.\t.\t%s\t%s\t.\t.\t.\tGT\n",
                        g.vars[0].seq.c_str() + kg, g.vars[1].seq.c_str() + kg);
        }
        fclose(f);
    }

    // ---- filter internal-indel paths (process_variants.rs:49-60) -----------
    for (auto& g : groups) {
        size_t i = 0;
        while (i < g.vars.size()) {
            int nb = 0;
            const std::string& s = g.vars[i].seq;
            // "slow but working" per-kmer scan, as the reference does
            for (size_t p = 0; p + kg <= s.size() && nb <= 2; p++)
                if (entries_indels.count &&
                    entries_indels.contains(encode_kmer_str(s.c_str() + p, kg)))
                    nb++;
            if (nb > 2) g.vars.erase(g.vars.begin() + i);  // max_indel_kmers default
            else i++;
        }
    }

    // ---- sort groups by n_paths/len desc (process_variants.rs:66-77) -------
    std::sort(groups.begin(), groups.end(), [](const LoGroup& x, const LoGroup& y) {
        double rx = x.vars.empty() ? 0 : (double)x.vars.size() / x.vars[0].seq.size();
        double ry = y.vars.empty() ? 0 : (double)y.vars.size() / y.vars[0].seq.size();
        return rx > ry;
    });

    // ---- reference genome k-mer index (positioning.rs:16-95) ---------------
    bool do_pos = ref_path != nullptr;
    MergedMap gk_idx;
    std::vector<std::array<uint32_t, 4>> gk_pos;  // [count, p0, p1, p2]; 255=overflow
    std::vector<uint8_t> genome;
    if (do_pos) {
        genome = read_fasta(ref_path);
        for (size_t n2 = 0; n2 + kg <= genome.size(); n2++) {
            bool ok = true;
            for (int j = 0; j < kg && ok; j++)
                ok = (genome[n2 + j] & 0xF) != 14 && genome[n2 + j] != 'N';
            if (!ok) continue;
            uint64_t e = encode_kmer_str((const char*)genome.data() + n2, kg);
            bool fresh;
            uint32_t r = gk_idx.row_for(e, (uint32_t)gk_pos.size(), &fresh);
            if (fresh) gk_pos.push_back(std::array<uint32_t, 4>{0, 0, 0, 0});
            auto& rec = gk_pos[r];
            // reference keeps the FIRST 3 positions of a repeated k-mer
            // (positioning.rs:78-88: push only while len < 3, so the
            // "overflow" removal branch is unreachable — quirk preserved)
            if (rec[0] < 3) {
                rec[0]++;
                rec[rec[0]] = (uint32_t)(n2 + kg);
            }
        }
    }

    // ---- SNP processing (process_variants.rs:88-225) ------------------------
    Set64 entries_done;
    std::vector<std::pair<uint32_t, std::string>> final_snps;
    Set64 pos_taken;
    uint32_t counter = 0;
    std::vector<uint32_t> vote_f, vote_r;
    for (auto& g : groups) {
        if (entries_indels.count &&
            (entries_indels.contains(g.entry) ||
             entries_indels.contains(rc_kmer(g.exit, kg))))
            continue;
        if (g.vars.size() < 2) continue;
        // potential SNP positions: >= 2 distinct ACGT at the position
        Set64 cand;
        for (auto& v : g.vars)
            for (uint32_t p : v.snps) cand.insert(p);
        std::vector<std::pair<uint32_t, std::string>> found;
        Set64 kmers_to_save;
        for (size_t ci2 = 0; ci2 <= cand.mask; ci2++) {
            if (!cand.used[ci2]) continue;
            uint32_t pos = (uint32_t)cand.keys[ci2];
            int pres = 0;
            for (auto& v : g.vars)
                if (pos < v.seq.size()) {
                    switch (v.seq[pos]) {
                        case 'A': pres |= 1; break; case 'C': pres |= 2; break;
                        case 'G': pres |= 4; break; case 'T': pres |= 8; break;
                    }
                }
            if (__builtin_popcount(pres) < 2) continue;
            std::string col(a.S, '-');
            Set64 tmp_kmers;
            bool new_snp = true;
            for (auto& v : g.vars) {
                if (pos >= v.seq.size() || pos < (uint32_t)kg) { continue; }
                uint64_t before = encode_kmer_str(v.seq.c_str() + pos - kg, kg + 1);
                uint64_t after = pos + kg + 1 <= v.seq.size()
                    ? encode_kmer_str(v.seq.c_str() + pos, kg + 1) : 0;
                uint64_t rc_after = after ? rc_kmer(after, kg + 1) : 0;
                if (!entries_done.contains(before) &&
                    (!after || !entries_done.contains(rc_after))) {
                    char last = v.seq[pos];
                    uint32_t fi = full_idx.find(before);
                    if (fi != UINT32_MAX) {
                        uint64_t m = full_mask[fi];
                        for (int s = 0; s < a.S; s++)
                            if ((m >> s) & 1)
                                col[s] = (col[s] == '-' || col[s] == last) ? last : 'N';
                    }
                    tmp_kmers.insert(before);
                    tmp_kmers.insert(rc_kmer(before, kg + 1));
                    if (after) { tmp_kmers.insert(after); tmp_kmers.insert(rc_after); }
                } else {
                    new_snp = false;
                }
            }
            if (!new_snp) continue;
            int pres2 = 0, missing = 0;
            for (char c : col) switch (c) {
                case 'A': pres2 |= 1; break; case 'C': pres2 |= 2; break;
                case 'G': pres2 |= 4; break; case 'T': pres2 |= 8; break;
                default: missing++; }
            if (__builtin_popcount(pres2) >= 2 && (float)missing / a.S <= 0.1f) {
                for (size_t ti = 0; ti <= tmp_kmers.mask; ti++)
                    if (tmp_kmers.used[ti]) kmers_to_save.insert(tmp_kmers.keys[ti]);
                found.push_back({pos, col});
            }
        }
        for (size_t ti = 0; ti <= kmers_to_save.mask; ti++)
            if (kmers_to_save.used[ti]) entries_done.insert(kmers_to_save.keys[ti]);
        if (found.empty()) continue;
        if (do_pos) {
            // positioning vote (positioning.rs:129-255)
            vote_f.clear(); vote_r.clear();
            for (auto& v : g.vars) {
                std::string rcs(v.seq.rbegin(), v.seq.rend());
                for (auto& c2 : rcs) c2 = c2 == 'A' ? 'T' : c2 == 'T' ? 'A'
                                        : c2 == 'C' ? 'G' : c2 == 'G' ? 'C' : c2;
                for (size_t p = 0; p + kg <= v.seq.size(); p++) {
                    uint32_t r = gk_idx.find(encode_kmer_str(v.seq.c_str() + p, kg));
                    if (r != UINT32_MAX)
                        for (uint32_t j = 1; j <= gk_pos[r][0]; j++)
                            vote_f.push_back(gk_pos[r][j] - (uint32_t)p);
                }
                for (size_t p = 0; p + kg <= rcs.size(); p++) {
                    uint32_t r = gk_idx.find(encode_kmer_str(rcs.c_str() + p, kg));
                    if (r != UINT32_MAX)
                        for (uint32_t j = 1; j <= gk_pos[r][0]; j++)
                            vote_r.push_back(gk_pos[r][j] - (uint32_t)p);
                }
            }
            auto best_of = [](std::vector<uint32_t>& v) -> std::pair<uint32_t, size_t> {
                if (v.empty()) return {0, 0};
                std::sort(v.begin(), v.end());
                uint32_t bp = 0; size_t bc = 0, run = 1; bool tie = false;
                for (size_t i2 = 1; i2 <= v.size(); i2++) {
                    if (i2 < v.size() && v[i2] == v[i2 - 1]) run++;
                    else {
                        if (run > bc) { bc = run; bp = v[i2 - 1]; tie = false; }
                        else if (run == bc) tie = true;
                        run = 1;
                    }
                }
                if (tie || bc < 10) return {0, 0};
                return {bp, bc};
            };
            auto [pf, cf] = best_of(vote_f);
            auto [pr, cr] = best_of(vote_r);
            bool fwd;
            uint32_t position;
            if (cf && cr) {
                if (cf == cr) continue;
                fwd = cf > cr; position = fwd ? pf : pr;
            } else if (cf) { fwd = true; position = pf; }
            else if (cr) { fwd = false; position = pr; }
            else continue;
            size_t seq_len = g.vars[0].seq.size();
            for (auto& [pos, col] : found) {
                uint32_t fp = fwd ? position + (pos - kg)
                                  : position + (uint32_t)(seq_len - pos - kg - 1);
                if (pos_taken.contains(fp)) continue;
                pos_taken.insert(fp);
                std::string fc = col;
                if (!fwd)
                    for (auto& c2 : fc) c2 = c2 == 'A' ? 'T' : c2 == 'T' ? 'A'
                                           : c2 == 'C' ? 'G' : c2 == 'G' ? 'C' : c2;
                final_snps.push_back({fp, fc});
            }
        } else {
            for (auto& [pos, col] : found) final_snps.push_back({++counter, col});
        }
    }

    // ---- outputs (output_snps.rs:10-151) ------------------------------------
    std::sort(final_snps.begin(), final_snps.end(),
              [](auto& x, auto& y) { return x.first < y.first; });
    {
        std::string fn = std::string(out_prefix) + "_snps.fas";
        FILE* f = fopen(fn.c_str(), "wb");
        std::string row(final_snps.size(), '-');
        for (int s = 0; s < a.S; s++) {
            for (size_t i = 0; i < final_snps.size(); i++) row[i] = final_snps[i].second[s];
            fprintf(f, ">%s\n%s\n", a.names[s].c_str(), row.c_str());
        }
        fclose(f);
    }
    if (do_pos && !genome.empty()) {
        // pseudo-genome alignment + VCF (same O(S*G) string building)
        std::string fn = std::string(out_prefix) + "_pseudo_genomes.fas";
        FILE* f = fopen(fn.c_str(), "wb");
        std::vector<uint8_t> gclean = genome;
        for (auto& b : gclean)
            if (b != 'A' && b != 'T' && b != 'G' && b != 'C' && b != 'N') b = 'N';
        std::vector<uint8_t> row(gclean.size());
        for (int s = 0; s < a.S; s++) {
            memcpy(row.data(), gclean.data(), gclean.size());
            for (auto& [pos, col] : final_snps)
                if (pos < row.size() && col[s] != '-') row[pos] = col[s];
            fprintf(f, ">%s\n", a.names[s].c_str());
            fwrite(row.data(), 1, row.size(), f);
            fputc('\n', f);
        }
        fclose(f);
        std::string vn = std::string(out_prefix) + "_snps.vcf";
        FILE* vf = fopen(vn.c_str(), "wb");
        fprintf(vf, "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                    "FILTER\tINFO\tFORMAT\n");
        for (auto& [pos, col] : final_snps)
            if (pos < gclean.size())
                fprintf(vf, "ref\t%u\t.\t%c\t.\t.\t.\t.\tGT\n", pos + 1,
                        gclean[pos]);
        fclose(vf);
    }
    return now_s() - t0;
}

static int run_e2e(int k, const char* ref_path, const char* out_prefix,
                   char** sample_paths, int S, const char* only) {
    // `only`: NULL = every command; otherwise a comma list ("build,align").
    // build always runs (every other proxy loads the .skf it writes) but
    // is only REPORTED when selected or when running the full suite.
    auto want = [&](const char* c) {
        if (!only) return true;
        const char* p = strstr(only, c);
        return p != nullptr;
    };
    init_iupac();
    std::string skf = std::string(out_prefix) + ".ref_proxy.skf";

    // ---- build -----------------------------------------------------------
    double t0 = now_s();
    MergedMap merged;
    std::vector<uint8_t> store;  // rows x S, '-' filled
    long total_kmers = 0;
    E2EArray arr;
    arr.k = k; arr.S = S;
    for (int s = 0; s < S; s++) {
        std::vector<uint8_t> g = read_fasta(sample_paths[s]);
        FlatMap dict;  // per-sample SkaDict (ska_dict.rs:333-378)
        scan_windows(g, k, [&](size_t, uint64_t key, uint8_t base, bool) {
            bool fresh;
            uint8_t* v = dict.slot(key, &fresh);
            int code = 0;
            switch (base) { case 'A': code = 0; break; case 'C': code = 1; break;
                            case 'T': code = 2; break; default: code = 3; }
            *v = fresh ? base : IUPAC[code][*v];
            total_kmers++;
        });
        // append into the merged dict (merge_ska_dict.rs:77-109)
        uint32_t next_row = (uint32_t)(store.size() / S);
        for (size_t i = 0; i <= dict.mask; i++) {
            if (!dict.used[i]) continue;
            bool fresh;
            uint32_t row = merged.row_for(dict.keys[i], next_row, &fresh);
            if (fresh) {
                store.resize(store.size() + S, '-');
                next_row++;
            }
            store[(size_t)row * S + s] = dict.vals[i];
        }
        std::string nm(sample_paths[s]);
        size_t slash = nm.find_last_of('/');
        arr.names.push_back(slash == std::string::npos ? nm : nm.substr(slash + 1));
    }
    // array conversion (merge_ska_array.rs:166-186): hashmap iteration order
    arr.n = store.size() / S;
    arr.kmers.resize(arr.n);
    arr.counts.assign(arr.n, 0);
    for (size_t i = 0; i <= merged.mask; i++)
        if (merged.used[i]) arr.kmers[merged.rows[i]] = merged.keys[i];
    arr.variants = std::move(store);
    for (uint64_t r = 0; r < arr.n; r++) {
        uint64_t c = 0;
        for (int s = 0; s < S; s++) c += arr.variants[r * S + s] != '-';
        arr.counts[r] = c;
    }
    e2e_save(arr, skf.c_str());
    double t_build = now_s() - t0;

    // ---- align -----------------------------------------------------------
    t0 = now_s();
    if (want("align")) {
        E2EArray a = e2e_load(skf.c_str());
        uint64_t thresh = (uint64_t)ceil(0.9 * a.S);
        std::string out = std::string(out_prefix) + ".ref_proxy.aln";
        std::vector<uint32_t> keep;
        keep.reserve(a.n);
        for (uint64_t r = 0; r < a.n; r++) {
            if (a.counts[r] < thresh) continue;
            const uint8_t* row = a.variants.data() + r * a.S;
            uint8_t first = row[0];
            bool varies = false;
            for (int s = 1; s < a.S; s++) varies |= row[s] != first;
            if (varies) keep.push_back((uint32_t)r);
        }
        FILE* f = fopen(out.c_str(), "wb");
        std::vector<uint8_t> line(keep.size());
        for (int s = 0; s < a.S; s++) {
            fprintf(f, ">%s\n", a.names[s].c_str());
            for (size_t i = 0; i < keep.size(); i++)
                line[i] = a.variants[(size_t)keep[i] * a.S + s];
            fwrite(line.data(), 1, line.size(), f);
            fputc('\n', f);
        }
        fclose(f);
    }
    double t_align = now_s() - t0;

    // ---- map (aln) --------------------------------------------------------
    t0 = now_s();
    if (want("map_aln")) {
        E2EArray a = e2e_load(skf.c_str());
        std::vector<uint8_t> ref = read_fasta(ref_path);
        // to_dict (merge_ska_array.rs:209-221)
        MergedMap dict;
        for (uint64_t r = 0; r < a.n; r++) {
            bool fresh;
            dict.row_for(a.kmers[r], (uint32_t)r, &fresh);
        }
        // positional scan + lookup (ska_ref.rs:508-533)
        struct Hit { uint32_t pos, row; uint8_t rc; };
        std::vector<Hit> hits;
        hits.reserve(ref.size());
        scan_windows(ref, k, [&](size_t pos, uint64_t key, uint8_t, bool is_rc) {
            uint32_t row = dict.find(key);
            if (row != UINT32_MAX)
                hits.push_back({(uint32_t)pos, row, (uint8_t)is_rc});
        });
        // pseudoalignment fill per sample (aln_writer.rs cost class)
        std::string out = std::string(out_prefix) + ".ref_proxy.map.aln";
        FILE* f = fopen(out.c_str(), "wb");
        const int hh = (k - 1) / 2;
        std::vector<uint8_t> row(ref.size());
        for (int s = 0; s < a.S; s++) {
            memset(row.data(), '-', row.size());
            size_t written = 0;
            for (const Hit& ht : hits) {
                uint8_t base = a.variants[(size_t)ht.row * a.S + s];
                if (base == '-') continue;
                size_t start = ht.pos > written ? ht.pos : written;
                for (size_t p2 = start; p2 < ht.pos + (size_t)k && p2 < row.size(); p2++)
                    row[p2] = ref[p2];
                row[ht.pos + hh] = base;
                written = ht.pos + k;
            }
            fprintf(f, ">%s\n", a.names[s].c_str());
            fwrite(row.data(), 1, row.size(), f);
            fputc('\n', f);
        }
        fclose(f);
    }
    double t_map = now_s() - t0;

    // ---- map (vcf) ---------------------------------------------------------
    // pseudoalignment for every sample + variant-site column walk + VCF
    // records (ska_ref.rs:672-752: transpose + IdxCheck walk,
    // first-occurrence ALT ordering, '.' for missing)
    t0 = now_s();
    if (want("map_vcf")) {
        E2EArray a = e2e_load(skf.c_str());
        std::vector<uint8_t> ref = read_fasta(ref_path);
        MergedMap dict;
        for (uint64_t r = 0; r < a.n; r++) {
            bool fresh;
            dict.row_for(a.kmers[r], (uint32_t)r, &fresh);
        }
        struct Hit { uint32_t pos, row; uint8_t rc; };
        std::vector<Hit> hits;
        scan_windows(ref, k, [&](size_t pos, uint64_t key, uint8_t, bool is_rc) {
            uint32_t row = dict.find(key);
            if (row != UINT32_MAX)
                hits.push_back({(uint32_t)pos, row, (uint8_t)is_rc});
        });
        const int hh = (k - 1) / 2;
        // all S pseudoalignment rows in memory (the VCF walk transposes)
        std::vector<std::vector<uint8_t>> rows(a.S,
                                               std::vector<uint8_t>(ref.size(), '-'));
        for (int s = 0; s < a.S; s++) {
            size_t written = 0;
            for (const Hit& ht : hits) {
                uint8_t base = a.variants[(size_t)ht.row * a.S + s];
                if (base == '-') continue;
                size_t start = ht.pos > written ? ht.pos : written;
                for (size_t p2 = start; p2 < ht.pos + (size_t)k && p2 < ref.size(); p2++)
                    rows[s][p2] = ref[p2];
                rows[s][ht.pos + hh] = base;
                written = ht.pos + k;
            }
        }
        std::string out = std::string(out_prefix) + ".ref_proxy.map.vcf";
        FILE* f = fopen(out.c_str(), "wb");
        fprintf(f, "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                   "FILTER\tINFO\tFORMAT");
        for (auto& nm : a.names) fprintf(f, "\t%s", nm.c_str());
        fputc('\n', f);
        std::vector<uint8_t> alts;
        std::vector<int> gt(a.S);
        for (size_t p = 0; p < ref.size(); p++) {
            uint8_t rb = ref[p];
            bool any = false;
            for (int s = 0; s < a.S && !any; s++)
                any = rows[s][p] != '-' && rows[s][p] != rb;
            if (!any) continue;
            alts.clear();
            for (int s = 0; s < a.S; s++) {
                uint8_t b = rows[s][p];
                if (b == '-') { gt[s] = -1; continue; }
                if (b == rb) { gt[s] = 0; continue; }
                size_t j = 0;
                while (j < alts.size() && alts[j] != b) j++;
                if (j == alts.size()) alts.push_back(b);  // first occurrence order
                gt[s] = (int)j + 1;
            }
            if (alts.empty()) continue;
            fprintf(f, "ref\t%zu\t.\t%c\t", p + 1, rb);
            for (size_t j = 0; j < alts.size(); j++)
                fprintf(f, "%s%c", j ? "," : "", alts[j]);
            fprintf(f, "\t.\t.\t.\tGT");
            for (int s = 0; s < a.S; s++)
                if (gt[s] < 0) fprintf(f, "\t.");
                else fprintf(f, "\t%d", gt[s]);
            fputc('\n', f);
        }
        fclose(f);
    }
    double t_vcf = now_s() - t0;

    // ---- lo (skalo) ---------------------------------------------------------
    double t_lo = -1.0;
    if (want("lo")) {
        double tl0 = now_s();
        E2EArray a = e2e_load(skf.c_str());
        std::string lp = std::string(out_prefix) + ".ref_proxy.lo";
        double dt = run_lo(a, ref_path, lp.c_str());
        t_lo = dt < 0 ? -1.0 : now_s() - tl0;
    }

    // ---- distance ---------------------------------------------------------
    t0 = now_s();
    if (want("distance")) {
        E2EArray a = e2e_load(skf.c_str());
        // NoConst constant-site count (generic_modes.rs:136-189)
        std::vector<uint32_t> var_rows;
        var_rows.reserve(a.n);
        uint64_t constant = 0;
        for (uint64_t r = 0; r < a.n; r++) {
            const uint8_t* row = a.variants.data() + r * a.S;
            uint8_t first = row[0];
            bool varies = false;
            for (int s = 1; s < a.S; s++) varies |= row[s] != first;
            if (varies) var_rows.push_back((uint32_t)r);
            else constant++;
        }
        // per-site pair tables (merge_ska_array.rs:587-632 semantics)
        static float DT[256][256];
        static uint8_t MT[256][256], XT[256][256];
        const char* letters = "ACGTMRWSYKVHDBN-";
        auto setbits = [&](uint8_t ch) -> int {
            switch (ch) { case 'A': return 1; case 'C': return 2; case 'G': return 4;
                case 'T': return 8; case 'M': return 3; case 'R': return 5;
                case 'W': return 9; case 'S': return 6; case 'Y': return 10;
                case 'K': return 12; case 'V': return 7; case 'H': return 11;
                case 'D': return 13; case 'B': return 14; case 'N': return 15;
                default: return 0; }
        };
        for (int i = 0; letters[i]; i++)
            for (int j = 0; letters[j]; j++) {
                uint8_t x = letters[i], y = letters[j];
                int sx = setbits(x), sy = setbits(y);
                if (!sx || !sy) {
                    if (sx != sy) XT[x][y] = 1;
                    continue;
                }
                int nx = __builtin_popcount(sx), ny = __builtin_popcount(sy);
                int nov = __builtin_popcount(sx & sy);
                double overlap = (double)nov / (nx * ny);
                DT[x][y] = (float)(1.0 - overlap);
                MT[x][y] = overlap > 0.0;
            }
        std::string out = std::string(out_prefix) + ".ref_proxy.dist.tsv";
        FILE* f = fopen(out.c_str(), "wb");
        fprintf(f, "Sample1\tSample2\tDistance\tMismatches\n");
        for (int i = 0; i < a.S; i++)
            for (int j = i + 1; j < a.S; j++) {
                double d = 0; uint64_t m = 0, x = 0;
                for (uint32_t r : var_rows) {
                    uint8_t va = a.variants[(size_t)r * a.S + i];
                    uint8_t vb = a.variants[(size_t)r * a.S + j];
                    d += DT[va][vb]; m += MT[va][vb]; x += XT[va][vb];
                }
                fprintf(f, "%s\t%s\t%.2f\t%llu/%llu\n", a.names[i].c_str(),
                        a.names[j].c_str(), d,
                        (unsigned long long)x, (unsigned long long)(m + constant));
            }
        fclose(f);
    }
    double t_dist = now_s() - t0;

    // only report what actually ran: a skipped command's ~0 s timing
    // must not reach the bench's best-of reducer
    std::string js = "{";
    char buf[96];
    auto add = [&](const char* key, double v) {
        snprintf(buf, sizeof buf, "%s\"%s\": %.3f", js.size() > 1 ? ", " : "",
                 key, v);
        js += buf;
    };
    if (want("build")) add("ref_build_s", t_build);
    if (want("align")) add("ref_align_s", t_align);
    if (want("map_aln")) add("ref_map_aln_s", t_map);
    if (want("map_vcf")) add("ref_map_vcf_s", t_vcf);
    if (want("lo") && t_lo >= 0) add("ref_lo_s", t_lo);
    if (want("distance")) add("ref_distance_s", t_dist);
    snprintf(buf, sizeof buf, ", \"n_kmers\": %llu, \"total_windows\": %ld}",
             (unsigned long long)arr.n, total_kmers);
    js += buf;
    printf("%s\n", js.c_str());
    return 0;
}

int main(int argc, char** argv) {
    if (argc > 1 && strncmp(argv[1], "e2e", 3) == 0) {
        // ref_baseline e2e[:cmd,cmd] <k> <ref.fa> <out_prefix> <sample.fa>...
        if (argc < 6) {
            fprintf(stderr,
                    "usage: %s e2e[:build,align,...] <k> <ref.fa> <out_prefix>"
                    " <sample.fa>...\n",
                    argv[0]);
            return 2;
        }
        const char* only = argv[1][3] == ':' ? argv[1] + 4 : nullptr;
        return run_e2e(atoi(argv[2]), argv[3], argv[4], argv + 5, argc - 5, only);
    }
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
