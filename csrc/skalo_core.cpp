// skalo graph core: colored-De-Bruijn extremity detection, chain
// compaction, and bounded-depth bubble traversal, operating on flat edge
// arrays handed over by ska_tpu/skalo/graph.py.
//
// Semantics mirror the reference (src/skalo/{extremities,compaction,
// read_graph}.rs) exactly as reproduced by the python implementation in
// ska_tpu/skalo/{graph,traverse}.py: edge lists keep insertion order
// (including duplicates), compacted chains collapse single-successor
// corridors between extremities, the DFS corridor-walks with per-branch
// visited-set copies, records every pass over an exit node, and groups
// filter on distinct second / second-to-last nodes plus most-common path
// length. The python DFS costs minutes at genome scale (4M k-mers,
// ~8M steps, 1.85M kept paths); this core runs it at C++ speed.
//
// Node keys are (k-1)-mers of up to 62 bases packed 2-bit as (hi, lo)
// uint64 pairs.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Key {
    uint64_t hi, lo;
    bool operator==(const Key& o) const { return hi == o.hi && lo == o.lo; }
};

struct KeyHash {
    size_t operator()(const Key& k) const {
        uint64_t x = k.lo * 0x9E3779B97F4A7C15ULL ^ (k.hi + 0x9E3779B97F4A7C15ULL);
        x ^= x >> 29; x *= 0xBF58476D1CE4E5B9ULL; x ^= x >> 32;
        return (size_t)x;
    }
};

static inline uint64_t rev64(uint64_t x) {
    x = ((x >> 2) & 0x3333333333333333ULL) | ((x & 0x3333333333333333ULL) << 2);
    x = ((x >> 4) & 0x0F0F0F0F0F0F0F0FULL) | ((x & 0x0F0F0F0F0F0F0F0FULL) << 4);
    x = ((x >> 8) & 0x00FF00FF00FF00FFULL) | ((x & 0x00FF00FF00FF00FFULL) << 8);
    x = ((x >> 16) & 0x0000FFFF0000FFFFULL) | ((x & 0x0000FFFF0000FFFFULL) << 16);
    return (x >> 32) | (x << 32);
}

static inline Key rev_comp(const Key& k, int n_bases) {
    const uint64_t C = 0xAAAAAAAAAAAAAAAAULL;
    uint64_t rhi = rev64(k.lo) ^ C;
    uint64_t rlo = rev64(k.hi) ^ C;
    int s = 128 - 2 * n_bases;
    Key r;
    if (s == 0) { r.hi = rhi; r.lo = rlo; }
    else if (s < 64) { r.lo = (rlo >> s) | (rhi << (64 - s)); r.hi = rhi >> s; }
    else if (s == 64) { r.lo = rhi; r.hi = 0; }
    else { r.lo = rhi >> (s - 64); r.hi = 0; }
    return r;
}

struct Edge {
    Key dst;
    int32_t dst_id;   // node id if dst is also a source, else -1
    int32_t mask_id;  // content id of the full k-mer's sample set
};

struct Chain {
    std::vector<Key> nodes;       // chain after its start node (last popped)
    std::vector<uint8_t> codes;   // node & 3 per node
    // (rel index, in_start, in_end) marks for nodes in either set
    std::vector<int32_t> mark_rel;
    std::vector<uint8_t> mark_se;  // bit0 = in_start, bit1 = in_end
};

// cons path node
struct PNode {
    int32_t parent;   // index into arena, -1 for root
    int32_t chain;    // >= 0: chain id payload; -1: single key payload
    Key single;       // valid when chain == -1
    Key single2;      // root payload carries two keys (entry, starting)
    uint8_t is_root;
    int64_t length;   // total nodes up to and including this payload
    Key prev_last, last;
};

struct Record {
    int32_t path;     // arena index
    Key second;       // starting_kmer
};

struct Result {
    // per kept path
    std::vector<uint64_t> ent_hi, ent_lo, ex_hi, ex_lo;
    std::vector<int64_t> path_len, codes_off, snps_off;
    std::vector<uint8_t> codes;     // concatenated node codes (ALL nodes)
    std::vector<int64_t> snps;      // concatenated vec_snps values
    int64_t n_entries = 0;
};

struct Core {
    int k_graph;
    int max_depth;
    std::unordered_map<Key, int32_t, KeyHash> node_id;
    std::vector<Key> node_key;
    std::vector<std::vector<Edge>> adj;
    std::unordered_set<Key, KeyHash> starts, ends;
    std::vector<int32_t> start_order;  // entry node ids, discovery order
    std::unordered_map<Key, int32_t, KeyHash> chain_of;  // start node -> chain
    std::vector<Chain> chains;
    Result res;
};

static void build_nodes(Core& c, const uint64_t* shi, const uint64_t* slo,
                        const uint64_t* dhi, const uint64_t* dlo,
                        const int32_t* emask, int64_t E) {
    c.node_id.reserve((size_t)E);
    for (int64_t i = 0; i < E; i++) {
        Key s{shi[i], slo[i]};
        auto it = c.node_id.find(s);
        int32_t id;
        if (it == c.node_id.end()) {
            id = (int32_t)c.node_key.size();
            c.node_id.emplace(s, id);
            c.node_key.push_back(s);
            c.adj.emplace_back();
        } else {
            id = it->second;
        }
        c.adj[id].push_back(Edge{Key{dhi[i], dlo[i]}, -1, emask[i]});
    }
    for (auto& lst : c.adj)
        for (auto& e : lst) {
            auto it = c.node_id.find(e.dst);
            e.dst_id = it == c.node_id.end() ? -1 : it->second;
        }
}

// extremities.rs:10-51: >= 2 out-edges whose sample sets differ
static bool find_extremities(Core& c) {
    int64_t n = (int64_t)c.node_key.size();
    for (int64_t id = 0; id < n; id++) {
        auto& lst = c.adj[id];
        if (lst.size() < 2) continue;
        bool entry = false;
        for (size_t i = 0; i + 1 < lst.size() && !entry; i++)
            for (size_t j = i + 1; j < lst.size(); j++)
                if (lst[i].mask_id != lst[j].mask_id) { entry = true; break; }
        if (entry) {
            c.starts.insert(c.node_key[id]);
            c.start_order.push_back((int32_t)id);
            c.ends.insert(rev_comp(c.node_key[id], c.k_graph));
        }
    }
    return !c.start_order.empty();
}

// compaction.rs:10-117 (walks first, then rewiring; order-independent)
static void compact(Core& c) {
    auto walk_from = [&](int32_t id) {
        // snapshot: python iterates list(all_kmers[kmer])
        std::vector<Key> dsts;
        for (auto& e : c.adj[id]) dsts.push_back(e.dst);
        for (const Key& starting : dsts) {
            Key current = starting;
            auto cit = c.node_id.find(current);
            std::unordered_set<Key, KeyHash> visited;
            std::vector<Key> vec;
            while (true) {
                if (cit == c.node_id.end()) break;
                auto& nxt = c.adj[cit->second];
                if (nxt.size() != 1) break;
                const Key& d = nxt[0].dst;
                if (visited.count(d)) break;
                current = d;
                vec.push_back(current);
                visited.insert(current);
                if (c.ends.count(current) || c.starts.count(current)) break;
                cit = c.node_id.find(current);
            }
            if (vec.size() > 1 && !c.chain_of.count(starting)) {
                // python dict assignment overwrites; values are identical
                // for repeated walks (graph unmodified during walks), so
                // first-wins is equivalent
                int32_t cid = (int32_t)c.chains.size();
                c.chains.push_back(Chain{});
                c.chains.back().nodes = vec;
                c.chain_of.emplace(starting, cid);
            }
        }
    };
    for (int32_t id : c.start_order) walk_from(id);
    for (int32_t id : c.start_order) {
        Key rc = rev_comp(c.node_key[id], c.k_graph);
        auto it = c.node_id.find(rc);
        if (it != c.node_id.end()) walk_from(it->second);
    }

    // rewiring: remove the chain from the graph, bridge start -> chain end
    for (auto& kv : c.chain_of) {
        const Key& sk = kv.first;
        Chain& ch = c.chains[kv.second];
        auto it = c.node_id.find(sk);
        const Key& first = ch.nodes[0];
        if (it != c.node_id.end()) {
            auto& lst = c.adj[it->second];
            std::vector<Edge> kept;
            for (auto& e : lst)
                if (!(e.dst == first)) kept.push_back(e);
            lst = std::move(kept);
        } else {
            // python: all_kmers.setdefault(starting_kmer, []) creates it
            int32_t id = (int32_t)c.node_key.size();
            c.node_id.emplace(sk, id);
            c.node_key.push_back(sk);
            c.adj.emplace_back();
            it = c.node_id.find(sk);
        }
        // interiors (all but the final node) had exactly one edge: clear
        for (size_t i = 0; i + 2 < ch.nodes.size() + 0u; i++) {
            auto ii = c.node_id.find(ch.nodes[i]);
            if (ii != c.node_id.end()) c.adj[ii->second].clear();
        }
        // bridge to the chain end, then pop it from the stored chain
        Key endk = ch.nodes.back();
        auto eit = c.node_id.find(endk);
        c.adj[it->second].push_back(
            Edge{endk, eit == c.node_id.end() ? -1 : eit->second, -1});
        ch.nodes.pop_back();
    }

    // precompute chain codes + extremity marks
    for (auto& ch : c.chains) {
        ch.codes.reserve(ch.nodes.size());
        for (size_t i = 0; i < ch.nodes.size(); i++) {
            ch.codes.push_back((uint8_t)(ch.nodes[i].lo & 3));
            bool is = c.starts.count(ch.nodes[i]);
            bool ie = c.ends.count(ch.nodes[i]);
            if (is || ie) {
                ch.mark_rel.push_back((int32_t)i);
                ch.mark_se.push_back((uint8_t)((is ? 1 : 0) | (ie ? 2 : 0)));
            }
        }
    }
}

// read_graph.rs:19-272 via the cons-path formulation of traverse.py
static void traverse(Core& c) {
    std::vector<PNode> arena;
    arena.reserve(1 << 20);

    auto mk_root = [&](const Key& a, const Key& b) -> int32_t {
        PNode p;
        p.parent = -1; p.chain = -1; p.is_root = 1;
        p.single = a; p.single2 = b;
        p.length = 2; p.prev_last = a; p.last = b;
        arena.push_back(p);
        return (int32_t)arena.size() - 1;
    };
    auto mk_append = [&](int32_t par, const Key& item) -> int32_t {
        PNode p;
        p.parent = par; p.chain = -1; p.is_root = 0;
        p.single = item;
        p.length = arena[par].length + 1;
        p.prev_last = arena[par].last; p.last = item;
        arena.push_back(p);
        return (int32_t)arena.size() - 1;
    };
    auto mk_extend = [&](int32_t par, int32_t cid) -> int32_t {
        Chain& ch = c.chains[cid];
        if (ch.nodes.empty()) return par;
        PNode p;
        p.parent = par; p.chain = cid; p.is_root = 0;
        p.length = arena[par].length + (int64_t)ch.nodes.size();
        p.prev_last = ch.nodes.size() >= 2 ? ch.nodes[ch.nodes.size() - 2]
                                           : arena[par].last;
        p.last = ch.nodes.back();
        arena.push_back(p);
        return (int32_t)arena.size() - 1;
    };

    struct Frame {
        Key current;
        int32_t cur_id;
        std::unordered_set<Key, KeyHash> visited;
        int32_t path;
        int32_t depth;
    };

    Result& R = c.res;

    auto decode_path = [&](int32_t pidx, const Key& entry, const Key& exitk) {
        // collect segments root -> leaf
        std::vector<int32_t> segs;
        int64_t n = arena[pidx].length;
        for (int32_t q = pidx; q != -1; q = arena[q].parent) segs.push_back(q);
        R.ent_hi.push_back(entry.hi); R.ent_lo.push_back(entry.lo);
        R.ex_hi.push_back(exitk.hi); R.ex_lo.push_back(exitk.lo);
        R.path_len.push_back(n);
        R.codes_off.push_back((int64_t)R.codes.size());
        R.snps_off.push_back((int64_t)R.snps.size());
        int64_t off = 0;
        int64_t cutoff = n - c.k_graph;
        for (auto si = segs.rbegin(); si != segs.rend(); ++si) {
            PNode& p = arena[*si];
            if (p.is_root) {
                for (const Key* kk : {&p.single, &p.single2}) {
                    R.codes.push_back((uint8_t)(kk->lo & 3));
                    bool is = c.starts.count(*kk), ie = c.ends.count(*kk);
                    if (is && off <= cutoff) R.snps.push_back(off + c.k_graph);
                    else if (ie) R.snps.push_back(off - 1);
                    off++;
                }
            } else if (p.chain >= 0) {
                Chain& ch = c.chains[p.chain];
                R.codes.insert(R.codes.end(), ch.codes.begin(), ch.codes.end());
                for (size_t m = 0; m < ch.mark_rel.size(); m++) {
                    int64_t i = off + ch.mark_rel[m];
                    if ((ch.mark_se[m] & 1) && i <= cutoff)
                        R.snps.push_back(i + c.k_graph);
                    else if (ch.mark_se[m] & 2)
                        R.snps.push_back(i - 1);
                }
                off += (int64_t)ch.codes.size();
            } else {
                R.codes.push_back((uint8_t)(p.single.lo & 3));
                bool is = c.starts.count(p.single), ie = c.ends.count(p.single);
                if (is && off <= cutoff) R.snps.push_back(off + c.k_graph);
                else if (ie) R.snps.push_back(off - 1);
                off++;
            }
        }
    };

    for (int32_t entry_id : c.start_order) {
        const Key entry = c.node_key[entry_id];
        // tmp_container: exit key -> records, insertion-ordered
        std::vector<std::pair<Key, std::vector<Record>>> tmp;
        std::unordered_map<Key, size_t, KeyHash> tmp_idx;
        arena.clear();

        auto record = [&](const Key& exitk, int32_t path, const Key& second) {
            auto it = tmp_idx.find(exitk);
            size_t gi;
            if (it == tmp_idx.end()) {
                gi = tmp.size();
                tmp.emplace_back(exitk, std::vector<Record>{});
                tmp_idx.emplace(exitk, gi);
            } else gi = it->second;
            tmp[gi].second.push_back(Record{path, second});
        };

        for (auto& e0 : c.adj[entry_id]) {
            const Key starting = e0.dst;
            Frame f;
            f.current = starting;
            f.cur_id = e0.dst_id;
            f.visited.insert(entry);
            f.visited.insert(starting);
            f.path = mk_root(entry, starting);
            {
                auto cit = c.chain_of.find(starting);
                if (cit != c.chain_of.end()) f.path = mk_extend(f.path, cit->second);
            }
            f.depth = 0;

            std::vector<Frame> stack;
            stack.push_back(std::move(f));
            while (!stack.empty()) {
                Frame fr = std::move(stack.back());
                stack.pop_back();
                if (fr.depth > c.max_depth) continue;

                bool walking = true;
                while (walking) {
                    std::vector<const Edge*> good;
                    if (fr.cur_id >= 0)
                        for (auto& e : c.adj[fr.cur_id])
                            if (!fr.visited.count(e.dst)) good.push_back(&e);
                    if (good.size() == 1) {
                        const Key nxt = good[0]->dst;
                        fr.visited.insert(nxt);
                        fr.path = mk_append(fr.path, nxt);
                        fr.current = nxt;
                        fr.cur_id = good[0]->dst_id;
                        auto cit = c.chain_of.find(nxt);
                        if (cit != c.chain_of.end())
                            fr.path = mk_extend(fr.path, cit->second);
                        if (c.ends.count(nxt)) record(nxt, fr.path, starting);
                    } else if (good.size() > 1) {
                        for (auto* ep : good) {
                            Frame nf;
                            nf.current = ep->dst;
                            nf.cur_id = ep->dst_id;
                            nf.visited = fr.visited;
                            nf.visited.insert(ep->dst);
                            nf.path = mk_append(fr.path, ep->dst);
                            auto cit = c.chain_of.find(ep->dst);
                            if (cit != c.chain_of.end())
                                nf.path = mk_extend(nf.path, cit->second);
                            if (c.ends.count(ep->dst))
                                record(ep->dst, nf.path, starting);
                            nf.depth = fr.depth + 1;
                            stack.push_back(std::move(nf));
                        }
                        walking = false;
                    } else {
                        walking = false;
                    }
                }
            }
        }

        bool any_multi = false;
        for (auto& g : tmp)
            if (g.second.size() > 1) { any_multi = true; break; }
        if (!any_multi) continue;

        for (auto& g : tmp) {
            auto& recs = g.second;
            // distinct seconds and second-to-lasts (read_graph.rs:166-172)
            std::unordered_set<Key, KeyHash> seconds, prevs;
            for (auto& r : recs) {
                seconds.insert(r.second);
                prevs.insert(arena[r.path].prev_last);
            }
            if (seconds.size() < 2 || prevs.size() < 2) continue;
            // most common length, first-encountered wins ties
            std::vector<std::pair<int64_t, int64_t>> counts;  // (len, count)
            for (auto& r : recs) {
                int64_t L = arena[r.path].length;
                bool found = false;
                for (auto& kv : counts)
                    if (kv.first == L) { kv.second++; found = true; break; }
                if (!found) counts.emplace_back(L, 1);
            }
            int64_t mcl = counts[0].first, best = counts[0].second;
            for (auto& kv : counts)
                if (kv.second > best) { best = kv.second; mcl = kv.first; }
            if (recs.size() == 2) {
                for (auto& r : recs) decode_path(r.path, entry, g.first);
            } else {
                for (auto& r : recs)
                    if (arena[r.path].length == mcl)
                        decode_path(r.path, entry, g.first);
            }
        }
    }
}

}  // namespace

extern "C" {

void* skalo_core_run(
    const uint64_t* esrc_hi, const uint64_t* esrc_lo,
    const uint64_t* edst_hi, const uint64_t* edst_lo,
    const int32_t* emask, int64_t E,
    int64_t k_graph, int64_t max_depth
) {
    Core* c = new Core();
    c->k_graph = (int)k_graph;
    c->max_depth = (int)max_depth;
    const bool tim = getenv("SKALO_CORE_TIME") != nullptr;
    auto now = [] { return std::chrono::steady_clock::now(); };
    auto secs = [](auto a, auto b) {
        return std::chrono::duration<double>(b - a).count();
    };
    auto t0 = now();
    build_nodes(*c, esrc_hi, esrc_lo, edst_hi, edst_lo, emask, E);
    auto t1 = now();
    if (!find_extremities(*c)) {
        delete c;
        return nullptr;  // no entry node: caller raises like the reference
    }
    auto t2 = now();
    compact(*c);
    auto t3 = now();
    traverse(*c);
    auto t4 = now();
    if (tim)
        fprintf(stderr,
                "[skalo_core] nodes %.1fs extrem %.1fs compact %.1fs "
                "traverse %.1fs (codes %zu MB)\n",
                secs(t0, t1), secs(t1, t2), secs(t2, t3), secs(t3, t4),
                c->res.codes.size() >> 20);
    return c;
}

int64_t skalo_core_n_paths(void* h) { return (int64_t)((Core*)h)->res.path_len.size(); }
int64_t skalo_core_codes_len(void* h) { return (int64_t)((Core*)h)->res.codes.size(); }
int64_t skalo_core_snps_len(void* h) { return (int64_t)((Core*)h)->res.snps.size(); }

void skalo_core_fill(
    void* h,
    uint64_t* ent_hi, uint64_t* ent_lo, uint64_t* ex_hi, uint64_t* ex_lo,
    int64_t* path_len, int64_t* codes_off, int64_t* snps_off,
    uint8_t* codes, int64_t* snps
) {
    Result& r = ((Core*)h)->res;
    size_t n = r.path_len.size();
    memcpy(ent_hi, r.ent_hi.data(), n * 8);
    memcpy(ent_lo, r.ent_lo.data(), n * 8);
    memcpy(ex_hi, r.ex_hi.data(), n * 8);
    memcpy(ex_lo, r.ex_lo.data(), n * 8);
    memcpy(path_len, r.path_len.data(), n * 8);
    memcpy(codes_off, r.codes_off.data(), n * 8);
    memcpy(snps_off, r.snps_off.data(), n * 8);
    memcpy(codes, r.codes.data(), r.codes.size());
    memcpy(snps, r.snps.data(), r.snps.size() * 8);
}

void skalo_core_free(void* h) { delete (Core*)h; }

}  // extern "C"
