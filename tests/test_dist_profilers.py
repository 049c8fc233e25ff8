"""Distributed genes/snps profilers (dist/profilers.py) on the virtual
8-device CPU mesh.

Outputs are asserted BIT-EQUAL to the single-chip profilers at every
dp x tp tested: with tp=1 the gathered candidate table equals the
single-chip table, and with tp>1 the canonical multimapper tie-break
(score, then global seq_idx/tstart/strand —
device_steps.canonical_best_col) resolves equal-score hits identically
no matter which shard drew them."""

import jax
import numpy as np
import pytest

from midas_tpu.db import Database
from midas_tpu.dist.profilers import (DistributedGenesProfiler,
                                      DistributedSnpsProfiler)
from midas_tpu.dist.sharded import make_mesh
from midas_tpu.profile.genes import GenesProfiler
from midas_tpu.profile.snps import SnpsProfiler
from midas_tpu.testkit import simulate_reads


@pytest.fixture(scope="module")
def reads(sim_community, tmp_path_factory):
    fq = str(tmp_path_factory.mktemp("distreads") / "r.fq.gz")
    simulate_reads(sim_community, fq, n_reads=500, error_rate=0.01, seed=21)
    return fq


@pytest.fixture(scope="module")
def species(sim_community):
    return sim_community.species_ids()[:2]


def test_dist_genes_dp_bit_equal(sim_community, reads, species):
    db = Database(sim_community.db_dir)
    single = GenesProfiler(db, species)
    want = single.run([reads], batch_size=128)
    mesh = make_mesh(8, tp=1)
    prof = DistributedGenesProfiler(db, species, mesh=mesh)
    got = prof.run([reads], batch_size=128)
    for k in ("aligned_reads", "mapped_reads", "depth", "copies",
              "marker_cov"):
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)


@pytest.mark.parametrize("tp", [2])
def test_dist_genes_tp_bit_equal(sim_community, reads, species, tp):
    """tp>1 draws candidates per shard, but the canonical tie-break
    (score, then global seq_idx/tstart/strand —
    device_steps.canonical_best_col) makes multimapper arbitration
    pool-order independent: bit-equal to single-chip."""
    if 8 % tp or len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    db = Database(sim_community.db_dir)
    single = GenesProfiler(db, species)
    want = single.run([reads], batch_size=128)
    prof = DistributedGenesProfiler(db, species, mesh=make_mesh(8, tp=tp))
    got = prof.run([reads], batch_size=128)
    for k in ("aligned_reads", "mapped_reads", "depth", "copies",
              "marker_cov"):
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)


def test_dist_snps_dp_bit_equal(sim_community, reads, species):
    db = Database(sim_community.db_dir)
    single = SnpsProfiler(db, species)
    want = single.run([reads], batch_size=128)
    prof = DistributedSnpsProfiler(db, species, mesh=make_mesh(8, tp=1))
    got = prof.run([reads], batch_size=128)
    np.testing.assert_array_equal(want["counts"], got["counts"])
    np.testing.assert_array_equal(want["aligned_reads"], got["aligned_reads"])
    np.testing.assert_array_equal(want["mapped_reads"], got["mapped_reads"])
    assert want["n_gapped"] == got["n_gapped"]


@pytest.mark.parametrize("tp", [2, 4])
def test_dist_snps_tp_sharded_counts(sim_community, reads, species, tp):
    """tp-sharded pileup stripes reassemble bit-equal to the
    single-chip tensor (canonical tie-break, see genes twin)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    db = Database(sim_community.db_dir)
    single = SnpsProfiler(db, species)
    want = single.run([reads], batch_size=128)
    prof = DistributedSnpsProfiler(db, species, mesh=make_mesh(8, tp=tp))
    got = prof.run([reads], batch_size=128)
    np.testing.assert_array_equal(want["counts"], got["counts"])
    np.testing.assert_array_equal(want["aligned_reads"],
                                  got["aligned_reads"])
    np.testing.assert_array_equal(want["mapped_reads"], got["mapped_reads"])
    assert want["n_gapped"] == got["n_gapped"]


def test_dist_snps_write_results(sim_community, reads, species, tmp_path):
    """The distributed profiler drives the standard writer unchanged."""
    db = Database(sim_community.db_dir)
    prof = DistributedSnpsProfiler(db, species, mesh=make_mesh(8, tp=2))
    prof.run([reads], batch_size=128)
    summaries = prof.write_results(str(tmp_path))
    assert set(summaries) == set(species)
    for s in summaries.values():
        assert s["genome_length"] > 0
