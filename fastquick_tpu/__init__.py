"""fastquick_tpu: TPU-native ultra-fast NGS quality control.

A ground-up JAX/XLA/Pallas re-design of the FASTQuick pipeline
(index -> align -> summarize -> contamination+ancestry -> report):

- Host Python/C++ handles file formats (FASTA/FASTQ/VCF/SAM/BAM) and
  orchestration.
- TPU runs the numeric cores: k-mer filtering, FM-index backward search,
  banded Smith-Waterman, pileup scatter-adds, and the contamination /
  ancestry likelihood optimizer.
- Multi-chip scaling is data-parallel FASTQ shards over a
  ``jax.sharding.Mesh`` with a replicated reduced-reference index and
  psum-merged statistics.
"""

__version__ = "0.1.0"

PACKAGE_VERSION = "1.0.0-tpu"  # written into .SelectedSite.vcf headers
