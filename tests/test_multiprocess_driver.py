"""Two-process jax.distributed run of the multi-host species driver
(dist/driver.py): both ranks stride the shared read stream, merge
accumulators with process_allgather, and rank 0's written profile must
be byte-identical to a single-process run."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
db_dir, fq, outdir = sys.argv[4], sys.argv[5], sys.argv[6]
jax.distributed.initialize(f"localhost:{port}", nproc, rank)
from midas_tpu.dist.driver import run_species_multihost
run_species_multihost(db_dir, fq, outdir=outdir, batch_size=128)
print("WORKER_OK", rank)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_species_driver(sim_community, sim_reads, tmp_path):
    from midas_tpu.db import Database
    from midas_tpu.profile.species import SpeciesProfiler, write_abundance

    fq, _truth = sim_reads
    db = Database(sim_community.db_dir)
    prof = SpeciesProfiler(db)
    want = prof.run([fq], batch_size=128)
    want_path = str(tmp_path / "single_profile.txt")
    write_abundance(want_path, want)

    port = _free_port()
    outdir = str(tmp_path / "multi")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 device per process
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(r), "2", str(port),
             sim_community.db_dir, fq, outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for r in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process driver timed out")
    for rc, out, err in outs:
        if rc != 0 and ("distributed" in err.lower()
                        and "not" in err.lower()):
            pytest.skip(f"jax.distributed unavailable on CPU here: {err[-200:]}")
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out
    got_path = os.path.join(outdir, "species/species_profile.txt")
    assert os.path.isfile(got_path)
    assert open(got_path).read() == open(want_path).read()
