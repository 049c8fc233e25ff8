#!/usr/bin/env python
"""Benchmark: aligned reads/sec/chip for marker-gene mapping (the
reference's species-profiling hot loop, ~5,000 reads/s on CPU per
docs/species.md:68), plus pangenome-mapping reads/s (~16,000 reads/s
reference, docs/cnvs.md:103) and SNP pileup sites/s.

Runs on the default JAX platform (the real TPU chip under axon).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REF_SPECIES_READS_PER_SEC = 5000.0   # docs/species.md:68
REF_GENES_READS_PER_SEC = 16000.0    # docs/cnvs.md:103


def main():
    import jax.numpy as jnp

    from midas_tpu.align.params import GLOBAL_SCORING, MARKER_SCORING
    from midas_tpu.align.pipeline import Aligner
    from midas_tpu.align.seed import SeedParams
    from midas_tpu.db import Database, build_seed_index
    from midas_tpu.db.refpack import pack_from_fasta
    from midas_tpu.io.batch import batch_reads
    from midas_tpu.testkit import simulate_db, simulate_reads

    tmp = tempfile.mkdtemp(prefix="midas_bench_")
    comm = simulate_db(os.path.join(tmp, "db"), n_species=12,
                       genome_len=40000, gene_len=900, n_extra_genes=10,
                       related_pairs=3, divergence=0.03, seed=0)
    db = Database(comm.db_dir)

    B, L = 2048, 128
    rng = np.random.default_rng(7)

    def make_batch(seed):
        fq = os.path.join(tmp, f"r{seed}.fq.gz")
        simulate_reads(comm, fq, n_reads=B, read_len=100,
                       error_rate=0.005, seed=seed)
        from midas_tpu.io.batch import load_read_batches
        return next(load_read_batches(fq, batch_size=B, max_len=L))

    batches = [make_batch(s) for s in range(3)]

    results = {}

    # --- marker-gene mapping (species personality) -----------------------
    marker_pack = pack_from_fasta(db.marker_fasta())
    sp = SeedParams(num_cands=8, max_hits=32)
    aligner = Aligner(marker_pack, build_seed_index(marker_pack, k=sp.k),
                      MARKER_SCORING, sp, max_read_len=L)
    aligner.align_batch(batches[0])  # compile + warm
    t0 = time.time()
    n = 0
    reps = 4
    for r in range(reps):
        for b in batches:
            aligner.align_batch(b)
            n += b.n_reads
    dt = time.time() - t0
    results["marker_reads_per_sec"] = n / dt

    # --- pangenome mapping (CNV personality) -----------------------------
    genome_pack = pack_from_fasta(
        [db.pangenome_fasta(s) for s in comm.species_ids()])
    spg = SeedParams(num_cands=4, max_hits=16)
    galigner = Aligner(genome_pack, build_seed_index(genome_pack, k=spg.k),
                       GLOBAL_SCORING, spg, max_read_len=L)
    galigner.align_batch(batches[0])
    t0 = time.time()
    n = 0
    for r in range(reps):
        for b in batches:
            galigner.align_batch(b)
            n += b.n_reads
    dt = time.time() - t0
    results["pangenome_reads_per_sec"] = n / dt

    # --- pileup sites/s ---------------------------------------------------
    # scatter-add of base counts for kept reads over the genome axis
    res = galigner.align_batch(batches[0])
    from midas_tpu.profile.common import pick_best_hits
    aligned, best_col, _ = pick_best_hits(res, GLOBAL_SCORING,
                                          batches[0].lengths)
    G = genome_pack.total_len
    counts = np.zeros((4, G), dtype=np.int32)
    rows = np.flatnonzero(aligned)
    t0 = time.time()
    reps_p = 20
    for _ in range(reps_p):
        for i in rows[:2000]:
            c = best_col[i]
            qs, qe = int(res.qstart[i, c]), int(res.qend[i, c])
            ts = int(res.tstart[i, c])
            qpos = np.arange(qs, qe)
            base = batches[0].codes[i, qpos]
            np.add.at(counts, (np.clip(base, 0, 3), ts + qpos - qs), 1)
    sites = reps_p * min(len(rows), 2000) * 100
    results["pileup_sites_per_sec"] = sites / (time.time() - t0)

    value = results["marker_reads_per_sec"]
    print(json.dumps({
        "metric": "marker-gene aligned reads/sec/chip",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / REF_SPECIES_READS_PER_SEC, 2),
        "detail": {
            "pangenome_reads_per_sec": round(results["pangenome_reads_per_sec"], 1),
            "pangenome_vs_baseline": round(
                results["pangenome_reads_per_sec"] / REF_GENES_READS_PER_SEC, 2),
            "pileup_sites_per_sec": round(results["pileup_sites_per_sec"], 1),
            "platform": _platform(),
        },
    }))


def _platform():
    import jax
    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}"


if __name__ == "__main__":
    sys.exit(main())
