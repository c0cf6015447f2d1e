"""Host-side I/O: FASTA/FASTQ parsing, CBOR+snappy `.skf` codec, VCF writing."""
