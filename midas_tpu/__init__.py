"""midas_tpu — a TPU-native metagenomic profiling framework.

A from-scratch re-design of the capabilities of MIDAS
(Metagenomic Intra-Species Diversity Analysis System, snayfach/MIDAS):
species relative abundance from universal single-copy marker genes,
pangenome gene copy-number variants (CNVs), and per-site SNP calling —
built TPU-first on JAX/XLA/Pallas instead of Bowtie2/HS-BLASTN/pysam
subprocess pipelines.

Layer map (bottom → top):

  align/   Pallas banded Smith-Waterman kernels + k-mer seed index
           (replaces bowtie2 / hs-blastn; reference midas/run/species.py:29,
           midas/run/genes.py:116, midas/run/snps.py:97)
  io/      FASTQ/FASTA streaming, 2-bit encoding, fixed-shape device batches
           (replaces midas/run/stream_seqs.py + shell pipes)
  db/      MIDAS database layout contract + packed reference arrays
           (replaces bowtie2-build / hs-blastn index)
  profile/ per-sample pipelines: species abundance, gene CNVs, SNP pileup
           (replaces midas/run/{species,genes,snps}.py)
  merge/   cross-sample mergers (replaces midas/merge/*)
  analyze/ consensus, diversity, strain tracking, gene distances
           (replaces midas/analyze/* + analysis scripts)
  dist/    jax.sharding mesh, data-parallel read sharding, psum merges
           (replaces multiprocessing.Pool / RLIMIT-bounded batching)
  cli/     run_midas / merge_midas compatible command-line surface
  dbbuild/ offline database construction (replaces vsearch/hmmer pipeline)
  testkit/ synthetic community simulator for hermetic tests
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the alignment kernels compile once
# per (shape, scoring) configuration; caching makes that a one-time cost
# per machine instead of per process. Users can override via env.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "midas_tpu", "jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# Some environments force-register a TPU plugin from sitecustomize and
# override jax_platforms, making JAX_PLATFORMS=cpu in the env
# ineffective. MIDAS_TPU_PLATFORM provides a working override (used by
# tests/CI to pin subprocesses to the virtual-CPU mesh).
if _os.environ.get("MIDAS_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MIDAS_TPU_PLATFORM"])
    del _jax
del _os
