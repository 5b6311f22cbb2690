"""trgt_tpu — a TPU-native tandem repeat genotyping engine.

A from-scratch reimplementation of the capabilities of TRGT
(PacificBiosciences/trgt, reference mounted at /root/reference) designed
for TPU hardware: batched Pallas DP kernels (wavefront alignment, HMM
Viterbi), JAX genotyping math, and a host-side streaming I/O pipeline.

Layer map (bottom-up; see SURVEY.md §7):
  io/        host-side BAM/FASTA/VCF/BED I/O (own BGZF + BAI implementation)
  reads/     HiFi read representation, clipping, SNV offsets
  hmm/       motif-annotation HMM topology + decode (ref: src/hmm/)
  kernels/   Pallas/JAX device kernels: viterbi, semiglobal DP, edit distance
  genotype/  span location, size/cluster/flank genotypers, consensus
  engine/    per-locus workflow + batching + multi-host sharding
  merge/     multi-sample VCF merge (ref: src/merge/)
  plot/      allele/waterfall plots (ref: src/trvz/)
"""

# Version-compat note: merge sniffs ##trgtVersion from VCF headers and
# applies pre-1.0 padding fixes (ref: src/merge/vcf_reader.rs:108-176), so
# the version must reflect the replicated TRGT output semantics (v3.0.0).
__version__ = "3.0.0-tpu.0.1.0"
FULL_VERSION = __version__
