"""Paired-end / interleaved alignment (reference: bowtie2 -1/-2 and
--interleaved at midas/run/genes.py:127-132, snps.py:109-114)."""

import glob
import gzip
import os

import jax.numpy as jnp
import numpy as np
import pytest

from midas_tpu.align.params import GLOBAL_SCORING
from midas_tpu.db import Database
from midas_tpu.io.batch import load_paired_batches, load_read_batches
from midas_tpu.profile import device_steps as ds
from midas_tpu.testkit import simulate_paired_reads

NEG_INF = ds.NEG_INF


@pytest.fixture(scope="module")
def paired_files(sim_community, tmp_path_factory):
    root = tmp_path_factory.mktemp("paired")
    fq1 = str(root / "r1.fq.gz")
    fq2 = str(root / "r2.fq.gz")
    truth = simulate_paired_reads(sim_community, fq1, fq2, n_pairs=300,
                                  error_rate=0.01, seed=11)
    inter = str(root / "inter.fq.gz")
    # interleave the same pairs into one file
    with gzip.open(fq1, "rt") as a, gzip.open(fq2, "rt") as b, \
            gzip.open(inter, "wt") as out:
        while True:
            r1 = [a.readline() for _ in range(4)]
            r2 = [b.readline() for _ in range(4)]
            if not r1[0]:
                break
            out.writelines(r1 + r2)
    return fq1, fq2, inter, truth


def test_paired_batches_layout(paired_files):
    fq1, fq2, inter, truth = paired_files
    batches = list(load_paired_batches(fq1, fq2, batch_size=128, max_len=128))
    rows = sum(b.n_reads for b in batches)
    assert rows == 2 * len(truth)
    b0 = batches[0]
    assert b0.names[0].endswith("/1") and b0.names[1].endswith("/2")
    assert b0.names[0][:-2] == b0.names[1][:-2]
    # interleaved single-file path produces the identical batch stream
    ib = list(load_paired_batches(inter, None, batch_size=128, max_len=128,
                                  interleaved=True))
    assert len(ib) == len(batches)
    for x, y in zip(batches, ib):
        np.testing.assert_array_equal(x.codes, y.codes)
        np.testing.assert_array_equal(x.lengths, y.lengths)
        np.testing.assert_array_equal(x.quals, y.quals)
        assert x.names == y.names


def test_paired_batches_mismatch(tmp_path):
    a = tmp_path / "a.fq"
    b = tmp_path / "b.fq"
    a.write_text("@r1/1\nACGT\n+\nIIII\n@r2/1\nACGT\n+\nIIII\n")
    b.write_text("@r1/2\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError, match="different read counts"):
        list(load_paired_batches(str(a), str(b), batch_size=8, max_len=16))


def _mk_out(score, seq_idx, strand, tstart, tend):
    """Assemble a minimal _align_batch_stages-shaped dict."""
    score = jnp.asarray(score, jnp.float32)
    z = jnp.zeros_like(score, dtype=jnp.int32)
    return dict(
        valid=score > NEG_INF / 2, score=score,
        seq_idx=jnp.asarray(seq_idx, jnp.int32),
        strand=jnp.asarray(strand, jnp.int32),
        tstart=jnp.asarray(tstart, jnp.int32),
        tend=jnp.asarray(tend, jnp.int32),
        qstart=z, qend=z, matches=z, mismatches=z, gap_cols=z, gap_opens=z,
    )


def test_pair_resolution_disambiguates_multimapper():
    """Mate 1 ties two loci; the concordant pair picks the right one and
    the pair MAPQ clears the >=20 SNP gate where unpaired would not."""
    NI = NEG_INF
    # candidates: mate1 hits locus A (seq 0 @ 1000) and locus B
    # (seq 1 @ 5000) with IDENTICAL scores; mate2 hits only seq 0 @ 1250rc
    out = _mk_out(
        score=[[-10.0, -10.0], [-12.0, NI]],
        seq_idx=[[0, 1], [0, 0]],
        strand=[[0, 0], [1, 0]],
        tstart=[[1000, 5000], [1250, 0]],
        tend=[[1100, 5100], [1350, 0]],
    )
    qlens = jnp.asarray([100, 100], jnp.int32)
    u_aligned, u_col, u_mapq = ds.best_hit_device(out, qlens, GLOBAL_SCORING)
    aligned, col, mapq = ds.paired_best_hit_device(out, qlens, GLOBAL_SCORING)
    assert int(u_mapq[0]) <= 3            # unpaired: exact tie -> ~0
    assert bool(aligned[0]) and bool(aligned[1])
    assert int(col[0]) == 0               # locus A chosen via concordance
    assert int(col[1]) == 0
    assert int(mapq[0]) >= 20             # pair-level MAPQ rescues the gate
    assert int(mapq[0]) == int(mapq[1])


def test_pair_fallback_unpaired():
    """No concordant combination (same strand / too far / different seq)
    -> both mates fall back to their own best hits."""
    NI = NEG_INF
    out = _mk_out(
        score=[[-5.0, NI], [-7.0, NI]],
        seq_idx=[[0, 0], [0, 0]],
        strand=[[0, 0], [0, 0]],          # same strand: never concordant
        tstart=[[100, 0], [220, 0]],
        tend=[[200, 0], [320, 0]],
    )
    qlens = jnp.asarray([100, 100], jnp.int32)
    u_aligned, u_col, u_mapq = ds.best_hit_device(out, qlens, GLOBAL_SCORING)
    aligned, col, mapq = ds.paired_best_hit_device(out, qlens, GLOBAL_SCORING)
    np.testing.assert_array_equal(np.asarray(aligned), np.asarray(u_aligned))
    np.testing.assert_array_equal(np.asarray(col), np.asarray(u_col))
    np.testing.assert_array_equal(np.asarray(mapq), np.asarray(u_mapq))


def test_pair_maxins_gate():
    """A pair separated beyond maxins is not concordant."""
    out = _mk_out(
        score=[[-5.0, NEG_INF], [-7.0, NEG_INF]],
        seq_idx=[[0, 0], [0, 0]],
        strand=[[0, 0], [1, 0]],
        tstart=[[100, 0], [900, 0]],
        tend=[[200, 0], [1000, 0]],
    )
    qlens = jnp.asarray([100, 100], jnp.int32)
    _, _, mapq_near = ds.paired_best_hit_device(out, qlens, GLOBAL_SCORING,
                                               maxins=1000)
    _, _, mapq_far = ds.paired_best_hit_device(out, qlens, GLOBAL_SCORING,
                                               maxins=500)
    u_mapq = ds.best_hit_device(out, qlens, GLOBAL_SCORING)[2]
    assert int(mapq_far[0]) == int(u_mapq[0])     # fell back to unpaired
    # span 900 <= 1000: concordant; pair path engaged (pair mapq for both)
    assert int(mapq_near[0]) == int(mapq_near[1])


def test_snps_paired_end_to_end(sim_community, paired_files, tmp_path):
    """Full SNP pipeline over -1/-2 vs --interleaved: identical outputs;
    and pairing is not a silent no-op (counts differ from unpaired)."""
    from midas_tpu.profile.snps import run_snps

    fq1, fq2, inter, truth = paired_files
    base = dict(db=sim_community.db_dir,
                species_id=sim_community.species_ids(),
                build_db=True, align=True, call=True)
    out12 = str(tmp_path / "mates")
    run_snps(dict(base, outdir=out12, m1=fq1, m2=fq2))
    outil = str(tmp_path / "interleaved")
    run_snps(dict(base, outdir=outil, m1=inter, m2=None, interleaved=True))
    files = sorted(glob.glob(os.path.join(out12, "snps/output/*.snps.gz")))
    assert files
    for f in files:
        g = os.path.join(outil, "snps/output", os.path.basename(f))
        assert gzip.open(f).read() == gzip.open(g).read()
    # unpaired treatment of the same files changes results
    outun = str(tmp_path / "unpaired")
    run_snps(dict(base, outdir=outun, m1=fq1, m2=None))
    assert (open(os.path.join(out12, "snps/summary.txt")).read()
            != open(os.path.join(outun, "snps/summary.txt")).read())


def test_genes_paired_end_to_end(sim_community, paired_files, tmp_path):
    from midas_tpu.profile.genes import run_genes

    fq1, fq2, inter, truth = paired_files
    base = dict(db=sim_community.db_dir,
                species_id=sim_community.species_ids(),
                build_db=True, align=True, cov=True)
    out12 = str(tmp_path / "mates")
    run_genes(dict(base, outdir=out12, m1=fq1, m2=fq2))
    outil = str(tmp_path / "interleaved")
    run_genes(dict(base, outdir=outil, m1=inter, m2=None, interleaved=True))
    assert (open(os.path.join(out12, "genes/summary.txt")).read()
            == open(os.path.join(outil, "genes/summary.txt")).read())
