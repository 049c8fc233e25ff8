"""End-to-end seed+extend aligner on simulated data with known truth."""

import numpy as np
import pytest

from midas_tpu.align.params import GLOBAL_SCORING, MARKER_SCORING
from midas_tpu.align.pipeline import Aligner
from midas_tpu.align.seed import SeedParams
from midas_tpu.db import Database, build_seed_index
from midas_tpu.db.refpack import pack_from_fasta
from midas_tpu.io.batch import load_read_batches


@pytest.fixture(scope="module")
def genome_aligner(sim_community):
    db = Database(sim_community.db_dir)
    sp0 = sim_community.species[0]
    pack = pack_from_fasta(db.rep_genome_fasta(sp0.species_id))
    index = build_seed_index(pack, k=14)
    return sp0, pack, Aligner(pack, index, GLOBAL_SCORING,
                              SeedParams(num_cands=4), max_read_len=128)


def test_genome_alignment_recovers_truth(genome_aligner, sim_reads, sim_community):
    sp0, pack, aligner = genome_aligner
    fq, truth = sim_reads
    truth_by_name = {t["name"]: t for t in truth}
    n_checked = n_correct = 0
    for batch in load_read_batches(fq, batch_size=256, max_len=128):
        res = aligner.align_batch(batch)
        best = np.argmax(np.where(res.valid, res.score, -1e9), axis=1)
        for i, name in enumerate(res.names):
            t = truth_by_name[name]
            if t["species_id"] != sp0.species_id:
                continue
            n_checked += 1
            c = best[i]
            if not res.valid[i, c]:
                continue
            contig = pack.names[res.seq_idx[i, c]]
            strand = "+-"[res.strand[i, c]]
            if (contig == t["contig_id"] and strand == t["strand"]
                    and abs(int(res.tstart[i, c]) - t["pos"]) <= 2):
                n_correct += 1
    assert n_checked > 200
    # >99% of reads from this species must map back to their true locus
    assert n_correct / n_checked > 0.99, (n_correct, n_checked)


def test_genome_alignment_scores_match_error_count(genome_aligner, sim_reads):
    """End-to-end score = -6 * mismatches for sub-only reads."""
    sp0, pack, aligner = genome_aligner
    fq, truth = sim_reads
    truth_by_name = {t["name"]: t for t in truth}
    checked = 0
    for batch in load_read_batches(fq, batch_size=256, max_len=128):
        res = aligner.align_batch(batch)
        best = np.argmax(np.where(res.valid, res.score, -1e9), axis=1)
        for i, name in enumerate(res.names):
            t = truth_by_name[name]
            if t["species_id"] != sp0.species_id:
                continue
            c = best[i]
            if not res.valid[i, c] or res.gap_cols[i, c]:
                continue
            assert res.score[i, c] == -6 * res.mismatches[i, c]
            assert res.qend[i, c] - res.qstart[i, c] == 100
            checked += 1
    assert checked > 200


def test_marker_alignment_multi_species(sim_community, sim_reads):
    """Marker personality: reads from the related species pair should hit
    markers of both species 1 and 4 (3% divergence)."""
    db = Database(sim_community.db_dir)
    pack = pack_from_fasta(db.marker_fasta())
    index = build_seed_index(pack, k=14)
    aligner = Aligner(pack, index, MARKER_SCORING,
                      SeedParams(num_cands=8, max_hits=32), max_read_len=128)
    fq, truth = sim_reads
    marker_genes = set()
    for sp in sim_community.species:
        marker_genes |= set(sp.marker_gene_ids.values())
    hits_per_read = []
    for batch in load_read_batches(fq, batch_size=256, max_len=128):
        res = aligner.align_batch(batch)
        for i in range(len(res.names)):
            hit_names = [pack.names[s] for s, v in zip(res.seq_idx[i], res.valid[i]) if v]
            if hit_names:
                hits_per_read.append(hit_names)
    # a decent share of reads overlap a marker gene region
    assert len(hits_per_read) > 50
    multi = sum(1 for h in hits_per_read if len(set(h)) > 1)
    assert multi > 5  # homologous markers across related species both hit


def test_no_false_alignments_on_random_reads(genome_aligner):
    """Reads of random sequence must not produce passing glocal scores."""
    sp0, pack, aligner = genome_aligner
    rng = np.random.default_rng(5)
    from midas_tpu.io.batch import batch_reads
    reads = []
    for i in range(64):
        seq = "".join("ACGT"[b] for b in rng.integers(0, 4, 100))
        reads.append((f"rand{i}", seq, None))
    res = aligner.align_batch(batch_reads(reads, 64, 128))
    score_min = GLOBAL_SCORING.score_min(100)
    passing = res.valid & (res.score >= score_min)
    assert passing.sum() == 0
