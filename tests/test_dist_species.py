"""The distributed species classifier (dist/species.py) must be
bit-equal to the single-chip device path — full semantics: per-marker
cutoffs, qcov, ties, unique/ambiguous split, RNG assignment,
normalization — on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from midas_tpu.db import Database
from midas_tpu.dist.sharded import make_mesh
from midas_tpu.dist.species import DistributedSpeciesProfiler
from midas_tpu.profile.species import SpeciesProfiler


@pytest.fixture(scope="module")
def single_run(sim_community, sim_reads):
    fq, _truth = sim_reads
    db = Database(sim_community.db_dir)
    prof = SpeciesProfiler(db)
    abund = prof.run([fq], batch_size=256)
    return db, fq, abund, dict(prof.stats)


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_dist_species_bit_equal(single_run, dp, tp):
    if dp * tp > len(jax.devices()):
        pytest.skip("not enough devices")
    db, fq, ref_abund, ref_stats = single_run
    mesh = make_mesh(dp * tp, tp=tp)
    prof = DistributedSpeciesProfiler(db, mesh=mesh)
    got = prof.run([fq], batch_size=256)
    assert got == ref_abund
    assert prof.stats["total_reads"] == ref_stats["total_reads"]
    assert prof.stats["total_bp"] == ref_stats["total_bp"]


def test_multihost_driver_single_process(single_run, sim_community, tmp_path):
    """The multi-host driver's plumbing (path sharding, accumulator
    merge short-circuit, rank-0 write) on one process."""
    from midas_tpu.dist.driver import (merge_species_accumulators,
                                       run_species_multihost,
                                       shard_read_paths, stride_batches)

    db, fq, ref_abund, _stats = single_run
    got = run_species_multihost(db, fq, outdir=str(tmp_path), batch_size=256)
    assert got == ref_abund
    assert (tmp_path / "species/species_profile.txt").is_file()

    # host-side sharding helpers
    paths = [f"r{i}.fq" for i in range(5)]
    shards = [shard_read_paths(paths, p, 2) for p in range(2)]
    assert sorted(shards[0] + shards[1]) == sorted(paths)
    assert set(shards[0]) & set(shards[1]) == set()
    assert shard_read_paths(paths[:1], 1, 4) == paths[:1]  # fewer files
    batches = list(range(7))
    strided = [list(stride_batches(iter(batches), p, 3)) for p in range(3)]
    assert sorted(sum(strided, [])) == batches

    # single-process merge is the identity
    uc = np.arange(4, dtype=np.int64)
    ub = np.arange(4, dtype=np.float64)
    amb = [(np.array([2, 5]), np.array([0, 1]), np.array([10.0, 20.0]))]
    st = dict(total_reads=5, total_bp=500, total_alns=7)
    m = merge_species_accumulators(uc, ub, amb, st)
    assert m[0] is uc and m[1] is ub and m[2] is amb and m[3] is st
