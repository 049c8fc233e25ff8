"""Round-3 features: accumulator checkpoints (crash recovery +
--align/--call stage split), fd-bounded spooled SNP merge, dbbuild
--resume/--max_genomes, merge-species column alignment."""

import glob
import gzip
import os

import numpy as np
import pytest

from midas_tpu.db import Database
from midas_tpu.profile import checkpoint as ckpt
from midas_tpu.profile import device_steps as ds
from midas_tpu.profile.species import SpeciesProfiler
from midas_tpu.testkit import simulate_reads


@pytest.fixture(scope="module")
def fq(sim_community, tmp_path_factory):
    fq = str(tmp_path_factory.mktemp("ckreads") / "r.fq.gz")
    simulate_reads(sim_community, fq, n_reads=600, error_rate=0.01, seed=3)
    return fq


def test_species_checkpoint_crash_resume(sim_community, fq, tmp_path,
                                         monkeypatch):
    """kill -9 at batch k, rerun, byte-identical result."""
    db = Database(sim_community.db_dir)
    prof = SpeciesProfiler(db)
    want = prof.run([fq], batch_size=128)
    want_stats = dict(prof.stats)

    ck = str(tmp_path / "state.npz")
    real_update = ds.species_update
    calls = {"n": 0}

    def dying_update(*a, **kw):
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated crash at batch 3")
        calls["n"] += 1
        return real_update(*a, **kw)

    monkeypatch.setattr(ds, "species_update", dying_update)
    prof2 = SpeciesProfiler(db)
    with pytest.raises(KeyboardInterrupt):
        prof2._run_device([fq], None, None, 128,
                          checkpoint_path=ck, checkpoint_every=1)
    assert os.path.isfile(ck)
    monkeypatch.setattr(ds, "species_update", real_update)

    # resume: only the remaining batches re-run
    prof3 = SpeciesProfiler(db)
    got = prof3.run([fq], batch_size=128, checkpoint_path=ck)
    assert got == want
    assert prof3.stats == want_stats

    # rerunning a COMPLETED run resumes to the same answer (no double
    # counting from re-accumulating the stream onto final state)
    prof4 = SpeciesProfiler(db)
    got2 = prof4.run([fq], batch_size=128, checkpoint_path=ck)
    assert got2 == want
    assert prof4.stats == want_stats


def test_species_checkpoint_fingerprint_mismatch(sim_community, fq, tmp_path):
    """A checkpoint from different params is ignored, not misused."""
    db = Database(sim_community.db_dir)
    ck = str(tmp_path / "state.npz")
    prof = SpeciesProfiler(db)
    want = prof.run([fq], batch_size=128, checkpoint_path=ck)
    # different batch geometry -> fingerprint mismatch -> fresh run
    prof2 = SpeciesProfiler(db)
    got = prof2.run([fq], batch_size=64, checkpoint_path=ck)
    assert got == want


def test_genes_stage_split(sim_community, fq, tmp_path):
    """--build_db --align alone persists state; --call_genes alone
    consumes it; outputs match the fused run."""
    from midas_tpu.profile.genes import run_genes

    base = dict(db=sim_community.db_dir, m1=fq, m2=None,
                species_id=sim_community.species_ids())
    fused = str(tmp_path / "fused")
    run_genes(dict(base, outdir=fused, build_db=True, align=True, cov=True))
    split = str(tmp_path / "split")
    run_genes(dict(base, outdir=split, build_db=True, align=True, cov=False))
    assert os.path.isfile(os.path.join(split, "genes/temp/state.npz"))
    assert not glob.glob(os.path.join(split, "genes/output/*.genes.gz"))
    run_genes(dict(base, outdir=split, build_db=False, align=False, cov=True))
    for f in sorted(glob.glob(os.path.join(fused, "genes/output/*.genes.gz"))):
        split_f = os.path.join(split, "genes/output", os.path.basename(f))
        assert gzip.open(f).read() == gzip.open(split_f).read()
    assert (open(os.path.join(fused, "genes/summary.txt")).read()
            == open(os.path.join(split, "genes/summary.txt")).read())


def test_snps_stage_split(sim_community, fq, tmp_path):
    from midas_tpu.profile.snps import run_snps

    base = dict(db=sim_community.db_dir, m1=fq, m2=None,
                species_id=sim_community.species_ids())
    fused = str(tmp_path / "fused")
    run_snps(dict(base, outdir=fused, build_db=True, align=True, call=True))
    split = str(tmp_path / "split")
    run_snps(dict(base, outdir=split, build_db=True, align=True, call=False))
    assert os.path.isfile(os.path.join(split, "snps/temp/state.npz"))
    run_snps(dict(base, outdir=split, build_db=False, align=False, call=True))
    for f in sorted(glob.glob(os.path.join(fused, "snps/output/*.snps.gz"))):
        split_f = os.path.join(split, "snps/output", os.path.basename(f))
        assert gzip.open(f).read() == gzip.open(split_f).read()
    assert (open(os.path.join(fused, "snps/summary.txt")).read()
            == open(os.path.join(split, "snps/summary.txt")).read())


def test_merge_snps_spooled_fd_bounded(three_samples, sim_community,
                                       tmp_path, monkeypatch):
    """MIDAS_TPU_MAX_OPEN=1 forces the two-phase spool; outputs must be
    byte-identical to the all-files-open path."""
    from midas_tpu.merge import snps as merge_snps

    args = dict(indirs=three_samples, db=sim_community.db_dir,
                sample_depth=0.0, fract_cov=0.0, min_samples=1,
                snp_type=["any"], allele_freq=0.01, site_depth=0,
                site_ratio=float("inf"), site_prev=0.0)
    direct = str(tmp_path / "direct")
    merge_snps.run_pipeline(dict(args, outdir=direct))
    monkeypatch.setenv("MIDAS_TPU_MAX_OPEN", "1")
    spooled = str(tmp_path / "spooled")
    merge_snps.run_pipeline(dict(args, outdir=spooled))
    found = 0
    for d in sorted(os.listdir(direct)):
        for fn in ["snps_info.txt", "snps_freq.txt", "snps_depth.txt"]:
            p1 = os.path.join(direct, d, fn)
            if not os.path.isfile(p1):
                continue
            found += 1
            assert open(p1).read() == open(os.path.join(spooled, d, fn)).read()
        # spool temp dir cleaned up
        assert not os.path.isdir(os.path.join(spooled, d, "temp_spool"))
    assert found > 0


def test_batch_samples_contiguous(monkeypatch):
    from midas_tpu.utils import batch_samples

    monkeypatch.setenv("MIDAS_TPU_MAX_OPEN", "2")
    b = batch_samples(list("abcde"))
    assert b == [["a", "b"], ["c", "d"], ["e"]]


def test_merge_species_truncated_profile(three_samples, sim_community,
                                         tmp_path):
    """A sample profile missing a species row must not shift that
    species' columns (reference bug, merge/species.py:33-40)."""
    import shutil

    from midas_tpu.merge import species as merge_species

    cohort = []
    for i, d in enumerate(three_samples):
        c = str(tmp_path / f"s{i}")
        shutil.copytree(d, c)
        cohort.append(c)
    # drop one species row from sample 1's profile
    p = os.path.join(cohort[1], "species/species_profile.txt")
    lines = open(p).read().splitlines(True)
    dropped = lines[2].split("\t")[0]
    open(p, "w").writelines([lines[0]] + lines[1:2] + lines[3:])
    out = str(tmp_path / "merged")
    merge_species.run_pipeline(dict(
        indirs=cohort, outdir=out, db=sim_community.db_dir))
    for fn in ["relative_abundance", "coverage", "count_reads"]:
        for line in open(os.path.join(out, f"{fn}.txt")).read().splitlines():
            assert len(line.split("\t")) == 1 + len(cohort)
            if line.startswith(dropped):
                # the missing sample contributes 0 in its own column
                assert float(line.split("\t")[2]) == 0


def test_dbbuild_resume_and_max_genomes(sim_community, tmp_path):
    from midas_tpu.dbbuild.build_db import parse_mapping_file, run_build

    # reuse the simulated community's source genomes if available;
    # otherwise synthesize a 2-genome species
    indir = str(tmp_path / "genomes")
    os.makedirs(indir)
    rng = np.random.default_rng(0)
    rows = ["genome_id\tspecies_id\trep_genome"]
    for g in ["g1", "g2", "g3"]:
        gdir = os.path.join(indir, g)
        os.makedirs(gdir)
        contig = "".join("ACGT"[b] for b in rng.integers(0, 4, 3000))
        gene = contig[100:700]
        open(os.path.join(gdir, f"{g}.fna"), "w").write(f">c_{g}\n{contig}\n")
        open(os.path.join(gdir, f"{g}.ffn"), "w").write(f">{g}.p1\n{gene}\n")
        open(os.path.join(gdir, f"{g}.faa"), "w").write(f">{g}.p1\nMKV\n")
        rows.append(f"{g}\tspA\t{'1' if g == 'g1' else '0'}")
    mapfile = str(tmp_path / "map.tsv")
    open(mapfile, "w").write("\n".join(rows) + "\n")

    out = str(tmp_path / "db")
    run_build(dict(indir=indir, mapfile=mapfile, outdir=out, max_genomes=2))
    gi = open(os.path.join(out, "genome_info.txt")).read()
    assert "g1" in gi and "g2" in gi and "g3" not in gi

    # --resume: outputs untouched on rerun
    marker = os.path.join(out, "pan_genomes/spA/centroids.ffn")
    before = os.path.getmtime(marker)
    sentinel = os.path.join(out, "pan_genomes/spA/sentinel")
    open(sentinel, "w").write("x")
    run_build(dict(indir=indir, mapfile=mapfile, outdir=out, max_genomes=2,
                   resume=True))
    assert os.path.getmtime(marker) == before
    assert os.path.isfile(sentinel)
    # shipped KEGG table installed into the DB
    assert os.path.isfile(os.path.join(out, "kegg/cpd_to_enzyme.txt.gz"))


def test_packaged_kegg_table():
    from midas_tpu.analyze.query_compound import (load_cpd_to_enzyme,
                                                  packaged_cpd_to_enzyme)

    p = packaged_cpd_to_enzyme()
    assert p is not None
    mapping = load_cpd_to_enzyme(p)
    # spot checks against the reference's embedded table
    # (query_by_compound.py:10-12, :27822-27823)
    assert "1.1.3.17" in mapping["C00001"]
    assert "1.14.13.222" in mapping["C21331"]
    assert sum(len(v) for v in mapping.values()) == 27814


def test_sliced_spill_host_roundtrip():
    """Spill-buffer slicing: only occupied rows transfer; restore
    rebuilds identical device state."""
    import jax.numpy as jnp

    st = ds.species_init(5, 4, 1000)
    rows = jnp.arange(12, dtype=jnp.int32).reshape(3, 4)
    st = ds.SpeciesState(
        uniq_count=st.uniq_count.at[1].add(7),
        uniq_bp=st.uniq_bp, amb_sp=st.amb_sp.at[:3].set(rows),
        amb_bp=st.amb_bp.at[:3].set(rows),
        amb_seq=st.amb_seq.at[:3].set(rows + 1),
        amb_ord=st.amb_ord.at[:3].set(jnp.arange(3, dtype=jnp.int32)),
        amb_n=jnp.int32(3), total_alns=jnp.int32(9))
    h = ds.species_state_host(st)
    assert h["amb_sp"].shape == (3, 4)
    assert int(h["amb_n"]) == 3
    st2 = ds.species_state_restore(h, 1000)
    h2 = ds.species_state_host(st2)
    for k in h:
        np.testing.assert_array_equal(h[k], h2[k])


def test_mapq_unique_branch_bowtie2_table():
    """The no-competitor MAPQ branch follows bowtie2's MapqV2
    unique-alignment table with its exact arithmetic: integer scores,
    scMin truncated toward zero, and thresholds of diff times the
    f32-CAST fractions (0.8f*100 = 80.0000012, so bestOver == 80 falls
    BELOW the 0.8 band; 0.7f < 0.7, so bestOver == 70 lands IN the 0.7
    band). Host and device twins agree at every probe."""
    import jax.numpy as jnp

    from midas_tpu.align.params import mapq_from_scores

    smin, sperf = -100.0, 0.0   # diff = 100
    cases = [(-15.0, 42), (-19.0, 42),
             (-20.0, 40),   # bo=80 < 0.8f*100 = 80.0000012
             (-25.0, 40),
             (-30.0, 40),   # bo=70 >= 0.7f*100 = 69.9999988
             (-31.0, 24), (-39.0, 24),
             (-40.0, 23),   # bo=60 < 0.6f*100 = 60.0000024
             (-50.0, 23),   # bo=50 >= 0.5f*100 = 50 exactly
             (-59.0, 8),
             (-60.0, 3),    # bo=40 < 0.4f*100 = 40.0000006
             (-69.0, 3),
             (-70.0, 0),    # bo=30 < 0.3f*100 = 30.0000001
             (-99.0, 0)]
    for best, want in cases:
        got = mapq_from_scores(best, float("-inf"), smin, sperf, False)
        assert got == want, (best, got, want)
        dev = ds.mapq_device(
            jnp.asarray([best], jnp.float32), jnp.asarray([ds.NEG_INF]),
            jnp.asarray([smin]), jnp.asarray([sperf]),
            jnp.asarray([False]))
        assert int(dev[0]) == want, (best, int(dev[0]), want)
    # below score_min -> 0 regardless
    assert mapq_from_scores(-101.0, float("-inf"), smin, sperf, False) == 0
    # fractional scMin truncates: smin=-60.6 -> -60, diff=60; a perfect
    # read (bo=60=diff) is in the 0.8 band
    assert mapq_from_scores(0.0, float("-inf"), -60.6, 0.0, False) == 42
    # bo=48 < 0.8f*60 = 48.0000007 -> 40 band
    assert mapq_from_scores(-12.0, float("-inf"), -60.6, 0.0, False) == 40


def test_mapq_tie_branch_mapqv2_tree():
    """The with-competitor branch follows bowtie2's MapqV2 tie tree
    (mapq.h): bestdiff bands at f32-cast deciles of diff, bestOver
    sub-bands at ==diff / 0.84f / 0.68f (0.67f in the tail bands).
    Includes the exact-boundary case where the f32-cast threshold
    rejects a rational-fraction hit: L=99 end-to-end gives scMin=-60
    (diff 60), best=-24/second=-60 -> bestdiff=36 < 0.6f*60=36.0000014
    -> the 0.5 band with bestOver=36 < 0.68f*60 -> MAPQ 5 (a rational
    0.6 threshold would give 22, wrongly crossing the mapq>=20 gate)."""
    import jax.numpy as jnp

    from midas_tpu.align.params import mapq_from_scores

    smin, sperf = -100.0, 0.0   # diff = 100, end-to-end shape
    e2e_cases = [
        # (best, second, want)
        (0.0, -95.0, 39),     # bestdiff 95 >= 0.9 band, perfect
        (-5.0, -100.0, 33),   # bestdiff 95, not perfect
        (0.0, -85.0, 38),     # .8 band, perfect
        (-10.0, -95.0, 27),   # bestdiff 85, bo 90 >= 0.84f*100
        (0.0, -75.0, 37), (-10.0, -85.0, 26),
        (0.0, -65.0, 36), (-10.0, -75.0, 22),
        (0.0, -55.0, 35),     # .5 band, perfect
        (-10.0, -65.0, 25),   # .5 band, bo 90 >= 84.0000018
        (-20.0, -75.0, 16),   # bo 80 in [68.0000001, 84.0000018)
        (-40.0, -95.0, 5),    # bo 60 < 0.68f*100
        (0.0, -45.0, 34), (-10.0, -55.0, 21), (-20.0, -65.0, 14),
        (-40.0, -85.0, 4),
        (0.0, -35.0, 32), (-10.0, -45.0, 18), (-20.0, -55.0, 10),
        (-40.0, -75.0, 3),
        (0.0, -25.0, 31), (-10.0, -35.0, 17), (-20.0, -45.0, 9),
        (-40.0, -65.0, 2),
        (0.0, -15.0, 30), (-10.0, -25.0, 15), (-20.0, -35.0, 8),
        (-40.0, -55.0, 1),
        # bestdiff in (0, 0.1f*diff)
        (-10.0, -15.0, 6),    # bo 90 >= 0.67f*100 = 66.9999964
        (-40.0, -45.0, 2),    # bo 60 < 66.9999964
        # exact tie
        (-10.0, -10.0, 1), (-40.0, -40.0, 0),
        # second-best below scMin does NOT count: unique branch
        (-15.0, -101.0, 42),
    ]
    for best, second, want in e2e_cases:
        got = mapq_from_scores(best, second, smin, sperf, True)
        assert got == want, (best, second, got, want)
        dev = ds.mapq_device(
            jnp.asarray([best], jnp.float32),
            jnp.asarray([second], jnp.float32),
            jnp.asarray([smin]), jnp.asarray([sperf]),
            jnp.asarray([True]))
        assert int(dev[0]) == want, (best, second, int(dev[0]), want)

    # the f32-cast boundary case from the round-4 review
    got = mapq_from_scores(-24.0, -60.0, -60.0, 0.0, True)
    assert got == 5, got
    dev = ds.mapq_device(jnp.asarray([-24.0], jnp.float32),
                         jnp.asarray([-60.0], jnp.float32),
                         jnp.asarray([-60.0]), jnp.asarray([0.0]),
                         jnp.asarray([True]))
    assert int(dev[0]) == 5

    # local tree: unique table 44/42/41/36/28/24 floor 22 with the same
    # f32-cast thresholds; tie bands single-valued at >= 0.6
    smin_l, sperf_l = 20.0, 220.0   # smin_i = 20, diff = 200
    loc_cases_uniq = [(220.0, 44), (181.0, 44),
                      (180.0, 42),  # bo=160 < 0.8f*200 = 160.0000024
                      (161.0, 42),
                      (160.0, 42),  # bo=140 >= 0.7f*200 = 139.9999976
                      (145.0, 41),  # bo=125 >= 0.6f*200 = 120.0000048
                      (121.0, 36),  # bo=101 < that, >= 0.5*200
                      (125.0, 36), (105.0, 28), (85.0, 24), (25.0, 22)]
    for best, want in loc_cases_uniq:
        got = mapq_from_scores(best, float("-inf"), smin_l, sperf_l, False,
                               local=True)
        assert got == want, (best, got, want)
    loc_cases_tie = [
        (220.0, 30.0, 40),    # bestdiff 190 >= .9 band
        (220.0, 50.0, 39), (220.0, 70.0, 33), (220.0, 90.0, 30),
        (220.0, 110.0, 27),   # .5 band, perfect
        (200.0, 90.0, 25),    # bestdiff 110, bo 180 >= 0.84f*200
        (160.0, 50.0, 20),    # bo 140 in [0.68f*200, 0.84f*200)
        (220.0, 130.0, 26), (200.0, 110.0, 19), (160.0, 70.0, 15),
        (220.0, 150.0, 23), (200.0, 130.0, 17), (160.0, 90.0, 11),
        (220.0, 170.0, 21), (200.0, 150.0, 14), (160.0, 110.0, 8),
        (220.0, 190.0, 19), (200.0, 170.0, 13), (160.0, 130.0, 6),
        (210.0, 205.0, 5), (120.0, 115.0, 3),
        (210.0, 210.0, 2), (120.0, 120.0, 1),
    ]
    for best, second, want in loc_cases_tie:
        got = mapq_from_scores(best, second, smin_l, sperf_l, True,
                               local=True)
        assert got == want, (best, second, got, want)
        dev = ds.mapq_device(
            jnp.asarray([best], jnp.float32),
            jnp.asarray([second], jnp.float32),
            jnp.asarray([smin_l]), jnp.asarray([sperf_l]),
            jnp.asarray([True]), local=True)
        assert int(dev[0]) == want, (best, second, int(dev[0]), want)
