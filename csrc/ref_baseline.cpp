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

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
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

static int run_e2e(int k, const char* ref_path, const char* out_prefix,
                   char** sample_paths, int S) {
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
    {
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
    {
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

    // ---- distance ---------------------------------------------------------
    t0 = now_s();
    {
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

    printf("{\"ref_build_s\": %.3f, \"ref_align_s\": %.3f, \"ref_map_aln_s\": %.3f, "
           "\"ref_distance_s\": %.3f, \"n_kmers\": %llu, \"total_windows\": %ld}\n",
           t_build, t_align, t_map, t_dist, (unsigned long long)arr.n, total_kmers);
    return 0;
}

int main(int argc, char** argv) {
    if (argc > 1 && strcmp(argv[1], "e2e") == 0) {
        // ref_baseline e2e <k> <ref.fa> <out_prefix> <sample.fa>...
        if (argc < 6) {
            fprintf(stderr, "usage: %s e2e <k> <ref.fa> <out_prefix> <sample.fa>...\n",
                    argv[0]);
            return 2;
        }
        return run_e2e(atoi(argv[2]), argv[3], argv[4], argv + 5, argc - 5);
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
