"""SNP calling over variant groups (reference src/skalo/process_variants.rs)."""

import logging
from typing import Dict, List, Set, Tuple

from .indels import process_indels
from .kmer_utils import encode_str, last_nucl, rev_comp_int
from .output import create_fasta_and_vcf
from .positioning import extract_genomic_kmers, scan_variants

log = logging.getLogger("ska_tpu.skalo")


def find_internal_indels(variant, entries_indels, k_graph):
    """process_variants.rs:227-245 (rolling 2-bit encode; re-encoding every
    window costs O(len * k) and dominated whole runs at genome scale)."""
    if not entries_indels:
        return 0
    seq = variant.sequence
    n = len(seq)
    if n <= k_graph:  # reference iterates windows 0 .. n-k_graph-1
        return 0
    nb = 0
    mask = (1 << (2 * k_graph)) - 1
    enc = encode_str(seq[:k_graph])
    if enc in entries_indels:
        nb += 1
    for i in range(k_graph, n - 1):
        enc = ((enc << 2) | ((ord(seq[i]) >> 1) & 3)) & mask
        if enc in entries_indels:
            nb += 1
    return nb


def get_potential_snp(vec_variant):
    """process_variants.rs:247-281: positions where >1 distinct ACGT."""
    snps_set = set()
    for variant in vec_variant:
        snps_set.update(variant.vec_snps)
    actual = set()
    for pos in snps_set:
        # pos == -1 encodes the reference's `i - 1` usize wrap at i == 0
        # (read_graph.rs:205, release mode): usize::MAX is never < len,
        # so it can never become a real SNP position.
        if pos < 0:
            continue
        present = set()
        for variant in vec_variant:
            if pos < len(variant.sequence):
                c = variant.sequence[pos]
                if c in "ACGT":
                    present.add(c)
        if len(present) > 1:
            actual.add(pos)
    return actual


def check_missing_data(nb_total, snp_column):
    """process_variants.rs:283-305."""
    present = set()
    missing = 0
    for c in snp_column:
        if c in "ATGC":
            present.add(c)
        else:
            missing += 1
    return len(present) >= 2, missing / nb_total


def complement_snp(column):
    comp = {"A": "T", "T": "A", "C": "G", "G": "C", "-": "-", "N": "N"}
    return [comp[c] for c in column]


def _native_snps(
    sorted_keys, variant_groups, entries_indels, kmer_samples, kmer_map,
    do_positioning, config, k_graph, sample_names, path_store=None,
):
    """C++ SNP stage (csrc/skalo_snps.cpp), any k_graph <= 62 (two-limb
    window encodes and a two-limb genome map for 32 < k_graph). Returns
    (final_snps dict, not_positioned) or None when the native path does
    not apply (no toolchain, or python-dict kmer_samples from the
    fallback graph path)."""
    import os

    if os.environ.get("SKA_SKALO_CORE", "native") == "python":
        return None
    from .core import KmerSamplesArrays

    if not isinstance(kmer_samples, KmerSamplesArrays):
        return None
    from .kmer_utils import LazySeq
    from .positioning import _KmerMap

    if do_positioning and not isinstance(kmer_map, _KmerMap):
        return None
    try:
        import ctypes

        import numpy as np

        from ..io.native import _lib as lib
    except Exception:
        return None

    _u64p = ctypes.POINTER(ctypes.c_uint64)
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _u8p = ctypes.POINTER(ctypes.c_uint8)
    if not hasattr(lib, "_snps_bound"):
        lib.skalo_snps_new.restype = ctypes.c_void_p
        lib.skalo_snps_new.argtypes = [
            _u64p, _u64p, _u64p, ctypes.c_int64, ctypes.c_int64,
            _u64p, _u64p, _u8p, _i64p, _i64p, _i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ]
        lib.skalo_snps_group.restype = ctypes.c_int64
        lib.skalo_snps_group.argtypes = [
            ctypes.c_void_p, _u8p, _i64p, _i64p, _i64p, ctypes.c_int64,
        ]
        lib.skalo_snps_count.restype = ctypes.c_int64
        lib.skalo_snps_count.argtypes = [ctypes.c_void_p]
        lib.skalo_snps_not_positioned.restype = ctypes.c_int64
        lib.skalo_snps_not_positioned.argtypes = [ctypes.c_void_p]
        lib.skalo_snps_fill.restype = None
        lib.skalo_snps_fill.argtypes = [ctypes.c_void_p, _i64p, _u8p]
        lib.skalo_snps_free.restype = None
        lib.skalo_snps_free.argtypes = [ctypes.c_void_p]
        _i32p = ctypes.POINTER(ctypes.c_int32)
        lib.skalo_snps_run_paths.restype = ctypes.c_int64
        lib.skalo_snps_run_paths.argtypes = [
            ctypes.c_void_p, _i32p, _i64p, _i64p, _u8p, _u64p, _u64p,
            _i64p, _i64p, _i64p, _i64p, ctypes.c_int64,
        ]
        lib._snps_bound = True

    if do_positioning:
        gm_lo = np.ascontiguousarray(kmer_map._lo)
        gm_hi = (
            np.ascontiguousarray(kmer_map._hi)
            if kmer_map._hi is not None
            else np.zeros(0, np.uint64)
        )
        gm_keep = np.ascontiguousarray(kmer_map._keep.astype(np.uint8))
        gm_starts = np.ascontiguousarray(kmer_map._starts.astype(np.int64))
        gm_counts = np.ascontiguousarray(kmer_map._counts.astype(np.int64))
        gm_pos = np.ascontiguousarray(kmer_map._pos.astype(np.int64))
    else:
        gm_lo = gm_hi = np.zeros(0, np.uint64)
        gm_keep = np.zeros(0, np.uint8)
        gm_starts = gm_counts = gm_pos = np.zeros(0, np.int64)

    ks_hi = kmer_samples.hi_or_none()
    h = lib.skalo_snps_new(
        # narrow export: hi limbs all zero, pass NULL (ks_find treats it as 0)
        ks_hi.ctypes.data_as(_u64p) if ks_hi is not None else None,
        kmer_samples.lo.ctypes.data_as(_u64p),
        kmer_samples.masks.ctypes.data_as(_u64p),
        len(kmer_samples.lo), kmer_samples.masks.shape[1],
        gm_hi.ctypes.data_as(_u64p),
        gm_lo.ctypes.data_as(_u64p), gm_keep.ctypes.data_as(_u8p),
        gm_starts.ctypes.data_as(_i64p), gm_counts.ctypes.data_as(_i64p),
        gm_pos.ctypes.data_as(_i64p), len(gm_lo),
        1 if do_positioning else 0, k_graph, len(sample_names),
        float(config.max_missing),
    )
    # Bulk path: when the native traversal core built the groups, every
    # variant is a row of its master buffers (PathStore); one C++ call
    # walks the groups in order with zero per-group python marshaling.
    use_bulk = path_store is not None
    pidx: List[int] = []
    grp_off: List[int] = [0]
    if use_bulk:
        for key, _ratio in sorted_keys:
            if (
                key[0] in entries_indels
                or rev_comp_int(key[1], k_graph) in entries_indels
            ):
                continue
            vec_variants = variant_groups[key]
            if len(vec_variants) < 2:
                continue
            if hasattr(vec_variants, "path_indices"):
                pi = vec_variants.path_indices()
            else:
                pi = [v.idx for v in vec_variants]
                if any(i < 0 for i in pi):
                    pi = None
            if pi is None:
                use_bulk = False
                break
            pidx.extend(pi)
            grp_off.append(len(pidx))

    try:
        if use_bulk:
            log.info("bulk SNP stage: %d groups", len(grp_off) - 1)
            pidx_a = np.asarray(pidx, np.int64)
            grp_a = np.asarray(grp_off, np.int64)
            _i32p2 = ctypes.POINTER(ctypes.c_int32)
            rcode = lib.skalo_snps_run_paths(
                h,
                np.ascontiguousarray(path_store.segs).ctypes.data_as(_i32p2),
                np.ascontiguousarray(path_store.segs_off).ctypes.data_as(_i64p),
                np.ascontiguousarray(path_store.chain_off).ctypes.data_as(_i64p),
                np.ascontiguousarray(path_store.chain_codes).ctypes.data_as(_u8p),
                np.ascontiguousarray(path_store.ent_hi).ctypes.data_as(_u64p),
                np.ascontiguousarray(path_store.ent_lo).ctypes.data_as(_u64p),
                np.ascontiguousarray(path_store.snps).ctypes.data_as(_i64p),
                np.ascontiguousarray(path_store.soff).ctypes.data_as(_i64p),
                pidx_a.ctypes.data_as(_i64p),
                grp_a.ctypes.data_as(_i64p),
                len(grp_off) - 1,
            )
            if rcode == -2:
                raise MemoryError(
                    "ska lo: SNP stage exceeded available memory"
                )
            if rcode != 0:
                raise KeyError("full k-mer missing from kmer_samples")
        else:
            for key, _ratio in sorted_keys:
                if (
                    key[0] in entries_indels
                    or rev_comp_int(key[1], k_graph) in entries_indels
                ):
                    continue
                vec_variants = variant_groups[key]
                if len(vec_variants) < 2:
                    continue
                codes_list = []
                voff = [0]
                snps_list = []
                soff = [0]
                for v in vec_variants:
                    seq = v.sequence
                    c = seq.codes() if isinstance(seq, LazySeq) else (
                        (np.frombuffer(str(seq).encode(), dtype=np.uint8) >> 1) & 3
                    ).astype(np.uint8)
                    codes_list.append(c)
                    voff.append(voff[-1] + len(c))
                    snps_list.extend(v.vec_snps)
                    soff.append(len(snps_list))
                codes = np.ascontiguousarray(np.concatenate(codes_list))
                voff_a = np.asarray(voff, np.int64)
                snps_a = np.asarray(snps_list, np.int64)
                soff_a = np.asarray(soff, np.int64)
                rcode = lib.skalo_snps_group(
                    h,
                    codes.ctypes.data_as(_u8p),
                    voff_a.ctypes.data_as(_i64p),
                    snps_a.ctypes.data_as(_i64p),
                    soff_a.ctypes.data_as(_i64p),
                    len(vec_variants),
                )
                if rcode == -2:
                    raise MemoryError(
                        "ska lo: SNP stage exceeded available memory"
                    )
                if rcode != 0:
                    raise KeyError("full k-mer missing from kmer_samples")

        n = lib.skalo_snps_count(h)
        not_positioned = lib.skalo_snps_not_positioned(h)
        pos = np.empty(n, np.int64)
        cols = np.empty(n * len(sample_names), np.uint8)
        lib.skalo_snps_fill(h, pos.ctypes.data_as(_i64p), cols.ctypes.data_as(_u8p))
    finally:
        lib.skalo_snps_free(h)

    cols = cols.reshape(n, len(sample_names))
    final_snps: Dict[int, List[str]] = {}
    pos_l = pos.tolist()
    for i in range(n):
        final_snps[pos_l[i]] = [chr(b) for b in cols[i]]
    return final_snps, int(not_positioned)


def analyse_variant_groups(
    variant_groups: Dict[Tuple[int, int], List],
    indel_groups: Dict[Tuple[int, int], List],
    kmer_samples: Dict[int, int],
    config,
    k_graph: int,
    sample_names: List[str],
    path_store=None,
):
    """process_variants.rs:20-225."""
    if config.reference_genome is not None:
        log.info("Reading reference genome")
        kmer_map, genome_seq, genome_name = extract_genomic_kmers(
            config.reference_genome, k_graph
        )
        do_positioning = True
    else:
        do_positioning = False
        kmer_map, genome_seq, genome_name = {}, b"", ""

    entries_indels = process_indels(
        indel_groups, kmer_samples, config, k_graph, sample_names
    )

    log.info("Filtering paths")
    if entries_indels:  # find_internal_indels is identically 0 otherwise
        for vec_variant in variant_groups.values():
            i = 0
            while i < len(vec_variant):
                if find_internal_indels(vec_variant[i], entries_indels, k_graph) > config.max_indel_kmers:
                    vec_variant.pop(i)
                else:
                    i += 1

    log.info("Sorting variant groups")
    sorted_keys = []
    for key, value in variant_groups.items():
        if len(value):
            fl = getattr(value, "first_seq_len", None)
            ratio = len(value) / (fl if fl is not None else len(value[0].sequence))
            sorted_keys.append((key, ratio))
    # Descending ratio; ties broken on (entry, exit) so the order — and the
    # order-dependent entries_done dedup below — is identical no matter which
    # core produced the groups (reference order among ties is HashMap
    # iteration, i.e. unspecified; process_variants.rs:66-77).
    sorted_keys.sort(key=lambda kv: (-kv[1], kv[0]))

    log.info("Processing SNPs")

    native = _native_snps(
        sorted_keys, variant_groups, entries_indels, kmer_samples, kmer_map,
        do_positioning, config, k_graph, sample_names, path_store=path_store,
    )
    if native is not None:
        final_snps, not_positioned = native
        if do_positioning:
            log.info("%d SNPs (+ %d w/o position)", len(final_snps), not_positioned)
        else:
            log.info("%d SNPs", len(final_snps))
        create_fasta_and_vcf(genome_name, genome_seq, sample_names, final_snps, config)
        return

    entries_done: Set[int] = set()
    final_snps: Dict[int, List[str]] = {}
    not_positioned = 0
    counter = 0

    for key, _ratio in sorted_keys:
        if key[0] in entries_indels or rev_comp_int(key[1], k_graph) in entries_indels:
            continue
        vec_variants = variant_groups[key]
        if len(vec_variants) < 2:
            continue

        real_snp_pos = get_potential_snp(vec_variants)

        kmers_to_save: Set[int] = set()
        found_snp_pos: Dict[int, List[str]] = {}

        for pos in sorted(real_snp_pos):
            snp_column = ["-"] * len(sample_names)
            tmp_kmers: Set[int] = set()
            new_snp = True

            for variant in vec_variants:
                seq = variant.sequence
                full_before = encode_str(seq[pos - k_graph : pos + 1])
                full_after = encode_str(seq[pos : pos + k_graph + 1])
                rc_after = rev_comp_int(full_after, k_graph + 1)

                # avoid SNPs already identified (process_variants.rs:124-137)
                if full_before not in entries_done and rc_after not in entries_done:
                    ln = last_nucl(full_before)
                    samples = kmer_samples[full_before]
                    i = 0
                    m = samples
                    while m:
                        if m & 1:
                            if snp_column[i] == "-" or snp_column[i] == ln:
                                snp_column[i] = ln
                            else:
                                snp_column[i] = "N"
                        m >>= 1
                        i += 1
                    tmp_kmers.add(full_before)
                    tmp_kmers.add(rev_comp_int(full_before, k_graph + 1))
                    tmp_kmers.add(full_after)
                    tmp_kmers.add(rc_after)
                else:
                    new_snp = False

            if new_snp:
                true_variant, ratio_missing = check_missing_data(
                    len(sample_names), snp_column
                )
                if true_variant and ratio_missing <= config.max_missing:
                    kmers_to_save.update(tmp_kmers)
                    found_snp_pos[pos] = snp_column

        entries_done.update(kmers_to_save)

        if found_snp_pos:
            if do_positioning:
                position_found, position, orientation = scan_variants(
                    vec_variants, k_graph, kmer_map
                )
                if position_found:
                    seq_length = len(vec_variants[0].sequence)
                    is_forward = orientation == "for"
                    for pos, column in found_snp_pos.items():
                        if is_forward:
                            final_position = (position + (pos - k_graph)) & 0xFFFFFFFF
                        else:
                            final_position = (
                                position + (seq_length - pos - k_graph - 1)
                            ) & 0xFFFFFFFF
                        final_column = column if is_forward else complement_snp(column)
                        if final_position in final_snps:
                            not_positioned += 1
                        else:
                            final_snps[final_position] = final_column
                else:
                    not_positioned += len(found_snp_pos)
            else:
                for column in found_snp_pos.values():
                    counter += 1
                    final_snps[counter] = column

    if do_positioning:
        log.info("%d SNPs (+ %d w/o position)", len(final_snps), not_positioned)
    else:
        log.info("%d SNPs", len(final_snps))

    create_fasta_and_vcf(genome_name, genome_seq, sample_names, final_snps, config)
