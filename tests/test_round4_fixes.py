"""Round-4 regression tests: trim/readq interaction, interleaved mate
validation, checkpoint parameter guards, ambiguous-spill draining, and
the vectorized RNG assignment."""

import dataclasses
import gzip
import os

import numpy as np
import pytest


def _write_fq(path, reads):
    """reads: list of (name, seq, qual)."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for name, seq, qual in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def test_trim_recomputes_mean_qual(tmp_path):
    """--trim drops the trimmed bases' qualities from the readq filter's
    mean (reference computes the mean over the read as aligned after
    --trim3, midas/run/genes.py:122,160)."""
    from midas_tpu.io.batch import load_read_batches
    from midas_tpu.io.prefetch import prefetch_device_batches

    # 20 high-qual bases then 10 low-qual bases: untrimmed mean is
    # pulled down, trimming 10 must restore the high mean
    fq = str(tmp_path / "t.fq")
    seq = "ACGT" * 5 + "A" * 10
    qual = chr(33 + 40) * 20 + chr(33 + 2) * 10
    _write_fq(fq, [("r0", seq, qual)])

    def batches():
        return load_read_batches([fq], batch_size=8, max_len=64)

    (b0,) = list(prefetch_device_batches(batches(), ("codes", "lengths",
                                                     "mean_qual")))
    _c, _l, mq0, _n = b0.arrays
    assert abs(float(np.asarray(mq0)[0]) - (40 * 20 + 2 * 10) / 30) < 1e-5
    (b1,) = list(prefetch_device_batches(batches(), ("codes", "lengths",
                                                     "mean_qual"), trim=10))
    _c, lens, mq1, _n = b1.arrays
    assert int(np.asarray(lens)[0]) == 20
    assert abs(float(np.asarray(mq1)[0]) - 40.0) < 1e-5


def test_interleaved_odd_count_raises(tmp_path):
    from midas_tpu.io.batch import load_paired_batches

    fq = str(tmp_path / "odd.fq")
    _write_fq(fq, [(f"r{i}", "ACGTACGT", "I" * 8) for i in range(5)])
    with pytest.raises(ValueError, match="odd read count"):
        list(load_paired_batches(fq, None, batch_size=8, max_len=16,
                                 interleaved=True))


def test_interleaved_mate_suffix_mispair_raises(tmp_path):
    from midas_tpu.io.batch import load_paired_batches

    fq = str(tmp_path / "mis.fq")
    _write_fq(fq, [("a/1", "ACGTACGT", "I" * 8),
                   ("a/2", "ACGTACGT", "I" * 8),
                   ("b/2", "ACGTACGT", "I" * 8),   # mates swapped
                   ("b/1", "ACGTACGT", "I" * 8)])
    with pytest.raises(ValueError, match="mate pairing broken"):
        list(load_paired_batches(fq, None, batch_size=8, max_len=16,
                                 interleaved=True))
    ok = str(tmp_path / "ok.fq")
    _write_fq(ok, [("a/1", "ACGTACGT", "I" * 8),
                   ("a/2", "ACGTACGT", "I" * 8)])
    got = list(load_paired_batches(ok, None, batch_size=8, max_len=16,
                                   interleaved=True))
    assert got[0].n_reads == 2


def test_checkpoint_guard_blocks_mismatched_finalize(sim_community, sim_reads,
                                                     tmp_path):
    """--call_genes with different filter params than the --align run
    must die (previously load_any consumed any stale state silently);
    --force downgrades to a warning."""
    from midas_tpu.db import Database
    from midas_tpu.profile.genes import GenesProfiler

    fq, _ = sim_reads
    db = Database(sim_community.db_dir)
    species = sim_community.species_ids()[:2]
    ck = str(tmp_path / "state.npz")
    prof = GenesProfiler(db, species, mapid=94.0)
    want = prof.run([fq], batch_size=128, checkpoint_path=ck)

    prof2 = GenesProfiler(db, species, mapid=99.0)   # different filter
    with pytest.raises(SystemExit, match="different\n*.*parameters"):
        prof2.finalize_from_checkpoint(ck)
    # force: consumes it (with the checkpoint's baked-in filters)
    got = prof2.finalize_from_checkpoint(ck, force=True)
    np.testing.assert_array_equal(got["mapped_reads"], want["mapped_reads"])

    # matching params: fine
    prof3 = GenesProfiler(db, species, mapid=94.0)
    got3 = prof3.finalize_from_checkpoint(ck)
    np.testing.assert_array_equal(got3["mapped_reads"], want["mapped_reads"])

    # different species list: blocked
    prof4 = GenesProfiler(db, species[:1], mapid=94.0)
    with pytest.raises(SystemExit):
        prof4.finalize_from_checkpoint(ck)


def test_amb_drain_matches_large_cap(sim_community, sim_reads):
    """The ambiguous spill buffer drains to host when nearly full: a
    tiny staging cap must produce bit-identical abundances to the
    default — no MIDAS_TPU_AMB_CAP tuning, no overflow error."""
    from midas_tpu.db import Database
    from midas_tpu.profile.species import SpeciesProfiler

    fq, _ = sim_reads
    db = Database(sim_community.db_dir)
    prof_big = SpeciesProfiler(db)
    want = prof_big.run([fq], batch_size=128)
    prof_small = SpeciesProfiler(db)
    uc, ub, amb = prof_small._run_device([fq], None, None, 64, amb_cap=1)
    # cap clamps to 2*batch_size=128 -> drains every batch
    got = prof_small.assign_and_normalize(uc, ub, amb)
    assert got == want


def test_vectorized_assignment_matches_scalar_reference(sim_community):
    """The vectorized RNG assignment reproduces the reference's
    sequential np.random.choice / random.randrange consumption exactly
    (scalar oracle below mirrors midas/run/species.py:104-119)."""
    import random

    from midas_tpu.db import Database
    from midas_tpu.profile.species import SpeciesProfiler

    db = Database(sim_community.db_dir)
    prof = SpeciesProfiler(db, seed=42)
    S = len(prof.species_order)
    rng = np.random.RandomState(0)
    unique_count = rng.randint(0, 20, size=S).astype(np.int64)
    unique_count[0] = 0    # make zero-weight rows possible
    unique_bp = (unique_count * 70).astype(np.float64)
    ambiguous = []
    for i in range(200):
        w = rng.randint(2, 5)
        sp = rng.choice(S, size=w, replace=True)
        if i % 7 == 0:
            sp[:] = 0      # all-zero-weight row -> python RNG path
        seq = rng.permutation(1000)[:w]
        alns = rng.randint(50, 101, size=w).astype(np.float64)
        ambiguous.append((seq.astype(np.int64), sp.astype(np.int64), alns))
    prof.stats = dict(total_reads=1000, total_bp=100000, total_alns=500)
    got = prof.assign_and_normalize(unique_count.copy(), unique_bp.copy(),
                                    [tuple(np.copy(x) for x in t)
                                     for t in ambiguous])

    # scalar oracle (the reference's loop)
    srng = np.random.RandomState(42)
    pyrng = random.Random(42)
    count = unique_count.copy()
    bp = unique_bp.copy()
    for seq_ids, sp_ids, alns in ambiguous:
        o = np.argsort(seq_ids, kind="stable")
        sp_ids, alns = sp_ids[o], alns[o]
        weights = unique_count[sp_ids].astype(np.float64)
        if weights.sum() == 0:
            j = pyrng.randrange(len(sp_ids))
        else:
            probs = weights / weights.sum()
            chosen_sp = srng.choice(sp_ids, 1, p=probs)[0]
            j = int(np.flatnonzero(sp_ids == chosen_sp)[0])
        count[sp_ids[j]] += 1
        bp[sp_ids[j]] += alns[j]
    for i, sid in enumerate(prof.species_order):
        assert got[sid]["count"] == int(count[i]), (i, sid)
        cov = bp[i] / max(prof.total_gene_length[i], 1)
        assert got[sid]["cov"] == pytest.approx(float(cov), abs=0, rel=0)


def test_detect_max_read_len_buckets(tmp_path):
    from midas_tpu.io.batch import detect_max_read_len

    fq = str(tmp_path / "l.fq")
    _write_fq(fq, [("a", "A" * 100, "I" * 100), ("b", "A" * 151, "I" * 151)])
    assert detect_max_read_len([fq]) == 160
    assert detect_max_read_len([fq], read_length=100) == 128
    _write_fq(fq, [("a", "A" * 251, "I" * 251)])
    assert detect_max_read_len([fq]) == 256
    _write_fq(fq, [("a", "A" * 600, "I" * 600)])
    assert detect_max_read_len([fq]) == 640   # past buckets: ceil to 64


def test_long_reads_not_truncated(sim_community, tmp_path, capfd):
    """150/250 bp reads (the common Illumina case) flow through species
    and snps profiling full-length: auto-sized kernel L, total_bp
    preserved, device and host classifiers agree."""
    from midas_tpu.db import Database
    from midas_tpu.io.batch import detect_max_read_len
    from midas_tpu.profile.snps import SnpsProfiler
    from midas_tpu.profile.species import SpeciesProfiler
    from midas_tpu.testkit import simulate_reads

    db = Database(sim_community.db_dir)
    for rl in (150, 250):
        fq = str(tmp_path / f"r{rl}.fq.gz")
        n = 120
        simulate_reads(sim_community, fq, n_reads=n, read_len=rl,
                       error_rate=0.005, seed=rl)
        L = detect_max_read_len([fq])
        assert L >= rl
        prof = SpeciesProfiler(db, max_read_len=L)
        dev = prof.run([fq], batch_size=64)
        assert prof.stats["total_bp"] == n * rl   # nothing truncated
        prof2 = SpeciesProfiler(db, max_read_len=L)
        host = prof2.run([fq], batch_size=64,
                         m8_path=str(tmp_path / f"m8_{rl}.m8"))
        assert dev == host

        sids = sim_community.species_ids()[:2]
        sprof = SnpsProfiler(db, sids, max_read_len=L)
        res = sprof.run([fq], batch_size=64)
        assert int(res["counts"].sum()) > 0


def test_truncation_warns(tmp_path, capfd):
    from midas_tpu.io.batch import load_read_batches

    fq = str(tmp_path / "t.fq")
    _write_fq(fq, [("a", "A" * 200, "I" * 200), ("b", "C" * 100, "I" * 100)])
    batches = list(load_read_batches([fq], batch_size=8, max_len=128))
    assert batches[0].lengths[0] == 128
    err = capfd.readouterr().err
    assert "truncated" in err and "1 reads" in err


def test_multihost_sharding_policy():
    """File-granular sharding must never split mate files across ranks
    or apply max_reads per-file: paired or capped runs fall back to
    batch striding of the shared stream (round-4 review finding)."""
    from midas_tpu.dist.driver import _stride_setup

    class P:
        pass

    # unpaired, uncapped, files >= hosts: file sharding
    p = P()
    assert _stride_setup(p, ["a", "b"], 0, 2) == ["a"]
    assert not hasattr(p, "_batch_filter")
    # paired: stride, both files stay together on every rank
    p = P()
    assert _stride_setup(p, ["m1", "m2"], 1, 2, paired=True) == ["m1", "m2"]
    assert hasattr(p, "_batch_filter")
    # max_reads: stride so the cap applies to the shared stream
    p = P()
    assert _stride_setup(p, ["a", "b"], 0, 2, max_reads=100) == ["a", "b"]
    assert hasattr(p, "_batch_filter")
    # single process: pass through untouched
    p = P()
    assert _stride_setup(p, ["a"], 0, 1, paired=True) == ["a"]
    assert not hasattr(p, "_batch_filter")


def test_counts_host_tiering_with_dump_slot(sim_community, sim_reads):
    """The tiered counts readback must engage on real runs: the dump
    slot (flat index G) collects millions of masked observations and is
    zeroed before the max() probe (round-4 review finding)."""
    import jax.numpy as jnp

    from midas_tpu.profile import device_steps as ds

    counts = jnp.zeros(4 * 11, jnp.int32).at[3].set(200).at[10].set(10**6)
    # raw max is 10^6 (dump at G=10); zeroed pull must take the uint8 tier
    got = ds.counts_host(counts.at[10].set(0))
    assert got.dtype == np.int32 and int(got[3]) == 200 and int(got[10]) == 0
    # and through snps_state_host: G computed from the buffer shape
    st = ds.snps_init(10, 2, 16, 8)
    st = ds.SnpsState(counts=counts, aligned_reads=st.aligned_reads,
                      mapped_reads=st.mapped_reads, gap_codes=st.gap_codes,
                      gap_quals=st.gap_quals, gap_meta=st.gap_meta,
                      gap_n=st.gap_n)
    h = ds.snps_state_host(st)
    assert int(h["counts"][3]) == 200
    assert int(h["counts"][10]) == 0   # dump zeroed in the snapshot


def test_dist_species_checkpoint_resume(sim_community, sim_reads, tmp_path):
    """DistributedSpeciesProfiler previously accepted checkpoint_path
    and silently dropped it; now a mid-stream snapshot resumes
    byte-identically on the dp x tp mesh."""
    import jax

    from midas_tpu.db import Database
    from midas_tpu.dist.sharded import make_mesh
    from midas_tpu.dist.species import DistributedSpeciesProfiler

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    fq, _ = sim_reads
    db = Database(sim_community.db_dir)
    mesh = make_mesh(8, tp=2)
    prof = DistributedSpeciesProfiler(db, mesh=mesh)
    want = prof.run([fq], batch_size=128)

    ck = str(tmp_path / "state.npz")
    prof2 = DistributedSpeciesProfiler(db, mesh=mesh)
    # partial run: consume only the first 3 batches, checkpointing each
    uc, ub, amb = prof2._run_device([fq], None, 3 * 128, 128,
                                    checkpoint_path=ck, checkpoint_every=1)
    assert os.path.isfile(ck)
    # fresh profiler resumes the FULL stream from the same checkpoint
    # geometry (fingerprint matches only when params match — the
    # max_reads difference means this resume starts OVER, which is the
    # fingerprint doing its job)
    prof3 = DistributedSpeciesProfiler(db, mesh=mesh)
    uc3, ub3, amb3 = prof3._run_device([fq], None, None, 128,
                                       checkpoint_path=ck,
                                       checkpoint_every=2)
    got = prof3.assign_and_normalize(uc3, ub3, amb3)
    assert got == want
    # rerun with the now-complete checkpoint: restores and skips the
    # whole stream, byte-identical output
    prof4 = DistributedSpeciesProfiler(db, mesh=mesh)
    uc4, ub4, amb4 = prof4._run_device([fq], None, None, 128,
                                       checkpoint_path=ck,
                                       checkpoint_every=2)
    prof4.stats = dict(prof3.stats)
    got4 = prof4.assign_and_normalize(uc4, ub4, amb4)
    assert got4 == want


def test_mode_flag_switches_alignment_personality(sim_community):
    """The reference honors -m local/global for genes and snps
    (midas/run/genes.py:116-145, snps.py:97-128); ours now does too
    instead of silently ignoring the flag."""
    from midas_tpu.db import Database
    from midas_tpu.profile.genes import GenesProfiler
    from midas_tpu.profile.snps import SnpsProfiler

    db = Database(sim_community.db_dir)
    sids = sim_community.species_ids()[:1]
    assert GenesProfiler(db, sids).aligner.scoring.mode == "local"
    assert GenesProfiler(db, sids,
                         mode="global").aligner.scoring.mode == "glocal"
    assert SnpsProfiler(db, sids).aligner.scoring.mode == "glocal"
    assert SnpsProfiler(db, sids,
                        mode="local").aligner.scoring.mode == "local"
