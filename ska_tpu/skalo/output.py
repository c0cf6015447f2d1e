"""skalo output files (reference src/skalo/output_snps.rs):
{out}_snps.fas, and with a reference genome also
{out}_pseudo_genomes.fas and {out}_snps.vcf."""

from typing import Dict, List


def create_fasta_and_vcf(
    genome_name: str,
    genome_seq: bytes,
    sample_names: List[str],
    variant_map: Dict[int, List[str]],
    config,
):
    # non-ATGCN -> N (output_snps.rs:18-23)
    gs = bytearray(genome_seq)
    for i, b in enumerate(gs):
        if chr(b) not in "ATGCN":
            gs[i] = ord("N")
    genome_seq = bytes(gs)

    sorted_map = sorted(variant_map.items())

    sequences = [[] for _ in sample_names]
    genome_alignments = [[] for _ in sample_names] if genome_seq else None
    vcf_records = []

    genome_length = (
        len(genome_seq) if genome_seq else (sorted_map[-1][0] + 1 if sorted_map else 0)
    )

    snp_idx = 0
    for pos in range(genome_length):
        if snp_idx < len(sorted_map) and sorted_map[snp_idx][0] == pos:
            snp_pos, chars = sorted_map[snp_idx]
            if genome_alignments is not None:
                ref_base = chr(genome_seq[snp_pos])
                vcf_records.append((snp_pos, ref_base, chars))
                for i, c in enumerate(chars):
                    genome_alignments[i].append(c)
            for i, c in enumerate(chars):
                sequences[i].append(c)
            snp_idx += 1
        elif genome_alignments is not None:
            ref_base = chr(genome_seq[pos])
            for aln in genome_alignments:
                aln.append(ref_base)

    with open(f"{config.output_name}_snps.fas", "w") as f:
        for name, seq in zip(sample_names, sequences):
            f.write(f">{name}\n{''.join(seq)}\n")

    if genome_seq:
        with open(f"{config.output_name}_pseudo_genomes.fas", "w") as f:
            for name, aln in zip(sample_names, genome_alignments):
                f.write(f">{name}\n{''.join(aln)}\n")

        with open(f"{config.output_name}_snps.vcf", "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write(
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(sample_names)
                + "\n"
            )
            for pos, ref_base, chars in vcf_records:
                alt_bases = []
                for c in chars:  # first-occurrence order (dedup)
                    if c != ref_base and c not in "-N" and c not in alt_bases:
                        alt_bases.append(c)
                gts = []
                for c in chars:
                    if c == ref_base:
                        gts.append("0")
                    elif c in "-N":
                        gts.append(".")
                    elif c in alt_bases:
                        gts.append(str(alt_bases.index(c) + 1))
                    else:
                        gts.append(".")
                f.write(
                    f"{genome_name}\t{pos + 1}\t.\t{ref_base}\t"
                    + ",".join(alt_bases)
                    + "\t.\t.\t.\tGT\t"
                    + "\t".join(gts)
                    + "\n"
                )
