"""Device (Pallas/JAX) and host (numpy) DP kernels.

The hot ops identified in SURVEY.md §3.1:
  1. ends-free affine flank alignment (span location)   → semiglobal
  2. O(n²) pairwise edit distances (cluster genotyper)  → edit distance
  3. HMM Viterbi (annotation + purity)                  → viterbi
  4. end-to-end affine alignment w/ CIGAR (consensus)   → e2e affine

Each kernel has a numpy host reference implementation (align_host.py) used
for validation and as a CPU fallback; the batched device versions live in
viterbi.py / semiglobal.py / editdist.py.
"""
