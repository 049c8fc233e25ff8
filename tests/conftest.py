"""Test configuration: force an 8-device virtual CPU mesh so sharding
paths compile and run without TPU hardware. Must be set before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from midas_tpu.testkit import simulate_db, simulate_reads  # noqa: E402


@pytest.fixture(scope="session")
def sim_community(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("simdb")
    return simulate_db(str(db_dir), n_species=3, genome_len=12000,
                       gene_len=600, n_extra_genes=4, related_pairs=1,
                       divergence=0.03, seed=0)


@pytest.fixture(scope="session")
def sim_reads(sim_community, tmp_path_factory):
    fq = tmp_path_factory.mktemp("reads") / "sim.fq.gz"
    truth = simulate_reads(sim_community, str(fq), n_reads=800,
                           read_len=100, abundances=[0.5, 0.3, 0.15, 0.05],
                           error_rate=0.005, seed=1)
    return str(fq), truth
