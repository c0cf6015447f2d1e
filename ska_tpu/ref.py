"""Reference indexing and `ska map`.

Counterpart of reference src/ska_ref.rs: the reference genome's split
k-mers are listed in positional order (kept as parallel numpy arrays, not
a Vec of structs), and mapping is a single vectorized binary search of
those keys in the sample array's sorted key tensor — replacing the
per-k-mer hashmap lookups of RefSka::map (ska_ref.rs:508-533).
"""

import os
from typing import List

import numpy as np

from .array import SkaArray
from .constants import check_k
from .encoding import IS_AMBIGUOUS, RC_IUPAC
from .io import fastx
from .ops import npkeys as K

_GAP = ord("-")




class RefSka:
    """Split k-mers of a reference FASTA, in positional order."""

    def __init__(self, k: int, filename: str, rc: bool, ambig_mask: bool, repeat_mask: bool):
        check_k(k)
        self.k = k
        self.ambig_mask = ambig_mask
        ff = fastx.read_fastx(filename)
        if ff.is_fastq:
            raise ValueError("Cannot create reference from FASTQ files")
        # chromosome name = first whitespace token (ska_ref.rs:208-212)
        self.chrom_names = [i.split()[0] for i in ff.ids]
        self.seq = [np.frombuffer(s, dtype=np.uint8) for s in ff.seqs]

        W = K.width_for_k(k)
        h = (k - 1) // 2

        from .constants import host_native_enabled

        if host_native_enabled():
            try:
                from .io.native import host_ref_scan
            except Exception:  # noqa: BLE001 - no toolchain: JAX path below
                host_ref_scan = None
            if host_ref_scan is not None:
                # native positional scan (csrc/host_build.cpp): the whole
                # multi-chromosome reference in one flat 0x00-separated
                # buffer, chrom/pos recovered by one searchsorted — no
                # device dispatches in host mode
                flat = np.frombuffer(
                    b"\x00".join(bytes(s) for s in self.seq), dtype=np.uint8
                )
                starts = np.zeros(len(self.seq), np.int64)
                cur = 0
                for ci, s in enumerate(self.seq):
                    starts[ci] = cur
                    cur += len(s) + 1
                keys_n, wpos, isrc = host_ref_scan(flat, k, rc)
                self.kmers = keys_n
                if len(self.seq) == 1:
                    # single chromosome (the common case): positions are
                    # the window starts directly — skip the searchsorted
                    # and two 4M-row temporaries
                    wpos += h
                    self.pos = wpos
                    self.chrom = np.zeros(len(wpos), np.int32)
                else:
                    r = np.searchsorted(starts, wpos, side="right") - 1
                    self.pos = wpos - starts[r] + h
                    self.chrom = r.astype(np.int32)
                self.krc = isrc
                if self.kmers.shape[0] == 0:
                    raise ValueError(f"{filename} has no valid sequence")
                self._repeat_spans(repeat_mask, W, h)
                return

        kmers = []
        poss = []
        chroms = []
        rcs = []
        # one shared power-of-two bucketing (and dispatch cap) with the
        # sample-build path, so the two paths' jit shape buckets never
        # desynchronize; lazy import breaks the module cycle
        from .sample import _bucket, _max_chunk_bases

        cap = _max_chunk_bases()

        def dispatch(seq_np, valid_np, rl_np, pos0):
            """One padded extraction. pos0 = (starts, base_pos, cids):
            record start offsets in the flat array, each record's
            position-0 coordinate within its chromosome, and its chrom
            id — step functions recovered per emitted window via
            searchsorted."""
            Lp = _bucket(len(seq_np) + k + 1)
            seqp = np.zeros(Lp, np.uint8)
            seqp[: len(seq_np)] = seq_np
            validp = np.zeros(Lp, bool)
            validp[: len(valid_np)] = valid_np
            rlp = np.zeros(Lp, bool)
            rlp[: len(rl_np)] = rl_np
            from .jaxinit import jnp
            from .ops import extract as X

            res = X.extract_windows(
                jnp.asarray(seqp), jnp.asarray(validp), jnp.asarray(rlp), k, rc, W
            )
            idx = np.nonzero(np.asarray(res["emit"]))[0]
            starts, base_pos, cids = pos0
            r = np.searchsorted(starts, idx, side="right") - 1
            kmers.append(np.asarray(res["key"])[idx])
            poss.append(idx.astype(np.int64) - starts[r] + base_pos[r] + h)
            chroms.append(cids[r].astype(np.int32))
            rcs.append(np.asarray(res["is_rc"])[idx])

        # Small chromosomes batch into ONE flat multi-record dispatch
        # (records separated by 0 bytes, rec_last marking each record's
        # final base — exactly the sample path's SeqBatch layout), so a
        # draft assembly with hundreds of contigs pays ~one dispatch, not
        # one per contig. Oversized chromosomes fall back to k-1-overlap
        # slicing. Dispatches run in chromosome order, so the positional
        # arrays concatenate already (chrom, pos)-sorted.
        flat_parts = []  # (chrom_id, np.uint8 sequence)
        flat_bases = 0

        def flush_flat():
            nonlocal flat_bases
            if not flat_parts:
                return
            seq_np = np.frombuffer(
                b"\x00".join(bytes(s) for _, s in flat_parts), dtype=np.uint8
            )
            starts, cids = [], []
            cur = 0
            rl = np.zeros(len(seq_np), bool)
            for ci2, s2 in flat_parts:
                starts.append(cur)
                cids.append(ci2)
                if len(s2):
                    rl[cur + len(s2) - 1] = True
                cur += len(s2) + 1
            valid = ((seq_np & 0xF) != 14) & (seq_np != 0)
            dispatch(
                seq_np, valid, rl,
                (np.asarray(starts, np.int64),
                 np.zeros(len(starts), np.int64),
                 np.asarray(cids, np.int64)),
            )
            flat_parts.clear()
            flat_bases = 0

        for ci, s in enumerate(self.seq):
            L = len(s)
            if L + k + 1 <= cap:
                if flat_parts and flat_bases + L + 1 + k + 1 > cap:
                    flush_flat()
                flat_parts.append((ci, s))
                flat_bases += L + 1
                continue
            flush_flat()
            # chromosomes beyond one device dispatch extract in k-1-overlap
            # slices: slice [a, b+k-1) owns exactly the window starts in
            # [a, b), so positions concatenate without loss or duplication
            step = min(L + 1, max(cap - (k - 1), 1))
            a = 0
            while a < L:
                b = min(a + step, L)
                # the chromosome-final window's emission consults the
                # previous base (roll-only rule); never start a chunk
                # exactly on it
                if b == L - k and b > 0 and (s[b - 1] & 0xF) != 14:
                    b += 1
                end = min(b + k - 1, L)
                n = end - a
                seq = s[a:end]
                valid = ((seq & 0xF) != 14) & (seq != 0)
                rec_last = np.zeros(n, bool)
                if end == L and L:
                    rec_last[n - 1] = True
                dispatch(
                    seq, valid, rec_last,
                    (np.zeros(1, np.int64),
                     np.asarray([a], np.int64),
                     np.asarray([ci], np.int64)),
                )
                a = b
        flush_flat()

        self.kmers = np.concatenate(kmers) if kmers else np.zeros((0, W), np.uint64)
        self.pos = np.concatenate(poss) if poss else np.zeros(0, np.int64)
        self.chrom = np.concatenate(chroms) if chroms else np.zeros(0, np.int32)
        self.krc = np.concatenate(rcs) if rcs else np.zeros(0, bool)
        if self.kmers.shape[0] == 0:
            raise ValueError(f"{filename} has no valid sequence")
        self._repeat_spans(repeat_mask, W, h)

    def _repeat_spans(self, repeat_mask, W, h):
        # repeat spans (ska_ref.rs:261-298)
        self.repeat_coors = np.zeros(0, np.int64)
        if repeat_mask:
            from .array import _combine128

            flat = self.kmers[:, 0] if W == 1 else _combine128(self.kmers)
            # one sort: return_inverse gives per-row group membership, so
            # no second np.isin sort is needed
            _, inv, counts = np.unique(flat, return_inverse=True, return_counts=True)
            is_rep = counts[inv] > 1
            # Vectorized interval union. Global positions ascend strictly,
            # so the reference's running last_end is simply the previous
            # interval's end: each span [pos-h, pos+h] is clipped to start
            # after it (the start==0 special case keeps the first span
            # whole), and coordinates expand with a repeat + ragged arange.
            rep_idx = np.nonzero(is_rep)[0]
            if len(rep_idx):
                # chrom_offset quirk (ska_ref.rs:268-271): the offset grows
                # by len(seq[last_chrom]) only at each chrom TRANSITION in
                # k-mer order, so chromosomes contributing no k-mers are
                # skipped in the sum — reproduce, don't fix
                present = np.unique(self.chrom).tolist()
                chain = present if present[0] == 0 else [0] + present
                offmap = np.zeros(len(self.seq), dtype=np.int64)
                acc = 0
                for j in range(1, len(chain)):
                    acc += len(self.seq[chain[j - 1]])
                    offmap[chain[j]] = acc
                gpos = self.pos[rep_idx] + offmap[self.chrom[rep_idx]]
                start = gpos - h
                end = gpos + h
                prev_end = np.concatenate([[0], end[:-1]])
                eff = np.where((start > prev_end) | (start == 0), start, prev_end + 1)
                cnt = end - eff + 1
                ends_c = np.cumsum(cnt)
                flat = np.arange(int(ends_c[-1]), dtype=np.int64)
                flat -= np.repeat(ends_c - cnt, cnt)
                self.repeat_coors = np.repeat(eff, cnt) + flat
            else:
                self.repeat_coors = np.zeros(0, np.int64)

        # mapping results
        self.mapped_pos = None  # (chrom, pos) int arrays
        self.mapped_variants = None  # (n_hits, n_samples) uint8
        self.mapped_names: List[str] = []

    @property
    def ksize(self) -> int:
        return self.kmers.shape[0]

    def map(self, arr: SkaArray):
        """Vectorized dict lookup: searchsorted of ref keys in the sample
        array's sorted keys (replaces ska_ref.rs:508-533)."""
        if self.k != arr.k:
            raise ValueError(f"K-mer sizes do not match ref:{self.k} skf:{arr.k}")
        self.mapped_names = list(arr.names)

        if arr.ksize == 0:
            # guard BEFORE the fancy index (row 0 of a 0-row array would
            # raise); an all-weeded .skf maps nothing, and the writers
            # then report the reference's clean "No split k-mers mapped
            # to reference" (ska_ref.rs:557,674)
            self.mapped_variants = np.zeros((0, len(arr.names)), np.uint8)
            self.mapped_chrom = self.chrom[:0]
            self.mapped_pos = self.pos[:0]
            return

        sorted_keys, perm = arr.sorted_view()
        from .parallel import use_distributed

        if use_distributed():
            # key-range-sharded lookup over the device mesh (goes beyond
            # the single-node reference; parallel/postbuild.py)
            from .parallel import build_mesh
            from .parallel.postbuild import distributed_lookup

            found, rows_idx = distributed_lookup(
                sorted_keys, self.kmers, build_mesh()
            )
            hit = np.nonzero(found)[0]
            ridx = rows_idx[hit]
            rows = arr.variants[ridx if perm is None else perm[ridx]]
        else:
            if os.environ.get("SKA_PLATFORM") == "cpu":
                host_cpu = True  # pinned host mode: stay jax-free
            else:
                from .jaxinit import jax

                host_cpu = jax.default_backend() == "cpu"
            if host_cpu:
                # host fallback: binary search beats re-running the
                # device's merged-sort rank trick on a 1-core CPU
                # (measured 11.6s -> ~1s for 4M-in-4.4M); the native
                # kernel fuses a prefix-bucketed search, the variants
                # row gather and the RC_IUPAC translation in one pass
                # (csrc/host_build.cpp ska_map_gather — numpy's
                # equivalent chain cost ~2.4s of hit-width temporaries
                # at 4x4Mb on this host's fault weather)
                try:
                    from .io.native import map_gather
                except Exception:  # noqa: BLE001 - no toolchain
                    map_gather = None
                res = None
                if map_gather is not None:
                    res = map_gather(
                        sorted_keys, self.kmers, self.krc,
                        arr.variants, RC_IUPAC, perm,
                    )
                if res is not None:
                    hit, rows = res
                    self.mapped_variants = rows
                    self.mapped_chrom = self.chrom[hit]
                    self.mapped_pos = self.pos[hit]
                    return
                from .array import _combine128

                if sorted_keys.shape[1] == 1:
                    idx = np.searchsorted(
                        sorted_keys[:, 0], self.kmers[:, 0]
                    ).astype(np.int64)
                else:
                    idx = np.searchsorted(
                        _combine128(sorted_keys), _combine128(self.kmers)
                    ).astype(np.int64)
            else:
                from .jaxinit import jnp
                from .ops import keys as KD

                idx = np.asarray(
                    KD.searchsorted_via_sort(
                        jnp.asarray(sorted_keys), jnp.asarray(self.kmers)
                    )
                )
            idx_c = np.clip(idx, 0, arr.ksize - 1)
            found = np.all(sorted_keys[idx_c] == self.kmers, axis=-1)
            hit = np.nonzero(found)[0]
            cidx = idx_c[hit]
            rows = arr.variants[cidx if perm is None else perm[cidx]]
        # reverse-strand hits translate through RC_IUPAC (ska_ref.rs:520-526)
        hit_rc = self.krc[hit]
        rows = np.where(hit_rc[:, None], RC_IUPAC[rows], rows)
        self.mapped_variants = rows
        self.mapped_chrom = self.chrom[hit]
        self.mapped_pos = self.pos[hit]

    # ---- pseudoalignment (ska_ref/aln_writer.rs) ---------------------------

    def _pseudoalignment_one(self, bases: np.ndarray) -> bytearray:
        """Exact AlnWriter state machine for one sample (aln_writer.rs:48-186)."""
        h = (self.k - 1) // 2
        total = sum(len(s) for s in self.seq)
        out = bytearray(b"-" * total)
        next_pos = h
        curr_chrom = 0
        last_mapped = 0
        last_written = 0
        chrom_offset = 0
        middle_out = []
        seqs = self.seq
        n_chrom = len(seqs)

        def fill_fwd(maximum):
            nonlocal last_written
            if last_written > 0:
                overhang = max(last_mapped + h - last_written, 0)
                start = last_written + 1
                end = min(start + overhang, maximum)
                if end > start:
                    out[start + chrom_offset : end + chrom_offset] = seqs[curr_chrom][
                        start:end
                    ].tobytes()
                    last_written = end

        def fill_contig():
            nonlocal chrom_offset, curr_chrom, next_pos
            clen = len(seqs[curr_chrom])
            fill_fwd(clen)
            chrom_offset += clen
            curr_chrom += 1
            next_pos = h

        mask_amb = self.ambig_mask
        for mchrom, mpos, base in zip(self.mapped_chrom, self.mapped_pos, bases):
            if base == _GAP:
                continue
            mchrom = int(mchrom)
            mpos = int(mpos)
            while mchrom > curr_chrom:
                fill_contig()
            b = ord("N") if (mask_amb and IS_AMBIGUOUS[base]) else int(base)
            middle_out.append((b, mpos + chrom_offset))
            if mpos < next_pos:
                last_mapped = mpos
            else:
                if mpos > next_pos:
                    fill_fwd(mpos - h)
                start, end = mpos - h, mpos
                out[start + chrom_offset : end + chrom_offset] = seqs[curr_chrom][
                    start:end
                ].tobytes()
                next_pos = mpos + h + 1
                last_mapped = mpos
                last_written = mpos

        while curr_chrom < n_chrom:
            fill_contig()
        for b, p in middle_out:
            out[p] = b
        for p in self.repeat_coors:
            if out[p] != _GAP:
                out[p] = ord("N")
        return out

    def pseudoalignment(self) -> List[bytearray]:
        if self.mapped_variants is None or len(self.mapped_variants) == 0:
            raise ValueError("No split k-mers mapped to reference")
        try:
            from .io import native
        except Exception:
            native = None
        if native is not None:
            ref_concat = np.concatenate(self.seq) if self.seq else np.zeros(0, np.uint8)
            chrom_len = np.array([len(s) for s in self.seq], dtype=np.int64)
            reps = np.array(self.repeat_coors, dtype=np.int64)
            h = (self.k - 1) // 2

            def one(i):
                return bytearray(
                    native.aln_write(
                        ref_concat,
                        chrom_len,
                        self.mapped_chrom,
                        self.mapped_pos,
                        self.mapped_variants[:, i],
                        h,
                        IS_AMBIGUOUS.view(np.uint8),
                        self.ambig_mask,
                        reps,
                    )
                )

            n = self.mapped_variants.shape[1]
            threads = min(int(os.environ.get("SKA_THREADS", "1") or 1), n)
            if threads > 1:
                # samples are independent writers into private buffers and
                # ctypes drops the GIL around the C call — the reference's
                # par_iter_mut axis over sample rows (ska_ref.rs:572-605);
                # executor.map preserves sample order, so output is
                # byte-identical at any thread count
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=threads) as ex:
                    return list(ex.map(one, range(n)))
            return [one(i) for i in range(n)]
        return [
            self._pseudoalignment_one(self.mapped_variants[:, i])
            for i in range(self.mapped_variants.shape[1])
        ]

    # ---- outputs (ska_ref.rs:636-658, 672-752) -----------------------------

    def write_aln(self, fh):
        alns = self.pseudoalignment()
        for name, seq in zip(self.mapped_names, alns):
            fastx.write_fasta(name, bytes(seq), fh)

    def write_vcf(self, fh):
        alns = self.pseudoalignment()
        aln_mat = np.array([np.frombuffer(bytes(a), dtype=np.uint8) for a in alns])

        w = fh.write
        w("##fileformat=VCFv4.4\n")
        for contig in self.chrom_names:
            w(f"##contig=<ID={contig}>\n")
        w("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t")
        w("\t".join(self.mapped_names) + "\n")

        # vectorized variant-site detection: a site is emitted iff any
        # sample differs from the reference base (ska_ref.rs:707-750); the
        # python per-site record builder then only touches those columns
        ref_concat = np.concatenate(self.seq) if self.seq else np.zeros(0, np.uint8)
        chrom_of = np.repeat(
            np.arange(len(self.seq), dtype=np.int64),
            [len(s) for s in self.seq],
        )
        chrom_start = np.cumsum([0] + [len(s) for s in self.seq[:-1]], dtype=np.int64)
        variant_cols = np.nonzero((aln_mat != ref_concat[None, :]).any(axis=0))[0]

        for col in variant_cols:
            ci = int(chrom_of[col])
            p = int(col - chrom_start[ci])
            ref_base = int(ref_concat[col])
            ref_allele = _vcf_base(ref_base)
            column = aln_mat[:, col]
            gts = []
            alt_bases = []
            for mb in column:
                if mb == ref_base:
                    gts.append("0")
                elif mb == _GAP:
                    gts.append(".")
                else:
                    ab = _vcf_base(int(mb))
                    if ab not in alt_bases:
                        alt_bases.append(ab)
                    gts.append(str(alt_bases.index(ab) + 1))
            alt = ",".join(alt_bases) if alt_bases else "."
            w(
                f"{self.chrom_names[ci]}\t{p + 1}\t.\t{ref_allele}\t{alt}\t.\t.\t.\tGT\t"
                + "\t".join(gts)
                + "\n"
            )


def _vcf_base(b: int) -> str:
    """ASCII byte -> VCF allele; non-ACGT becomes N (ska_ref.rs:148-156)."""
    c = chr(b)
    return c if c in "ACGT" else "N"
