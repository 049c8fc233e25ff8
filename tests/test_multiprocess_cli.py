"""The run_midas CLI is multi-host aware: launched as ranks of an
initialized jax.distributed job it routes to the dist/driver multihost
paths (rank 0 writes). Two ranks must reproduce the single-process CLI
outputs byte-identically (decompressed)."""

import gzip
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
from midas_tpu.cli.run_midas import main
main(["species", outdir, "-1", fq, "-d", db_dir])
main(["snps", outdir, "-1", fq, "-d", db_dir,
      "--build_db", "--align", "--pileup", "--species_cov", "0.1"])
print("WORKER_OK", rank)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _read(path):
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def test_two_process_cli(sim_community, sim_reads, tmp_path):
    from midas_tpu.cli.run_midas import main

    fq, _truth = sim_reads
    single = str(tmp_path / "single")
    main(["species", single, "-1", fq, "-d", sim_community.db_dir])
    main(["snps", single, "-1", fq, "-d", sim_community.db_dir,
          "--build_db", "--align", "--pileup", "--species_cov", "0.1"])

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
        pytest.fail("two-process CLI timed out")
    for rc, out, err in outs:
        if rc != 0 and ("distributed" in err.lower() and "not" in err.lower()):
            pytest.skip(f"jax.distributed unavailable here: {err[-200:]}")
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out

    files = ["species/species_profile.txt", "species/temp/read_count.txt",
             "snps/summary.txt"]
    single_species = sorted(os.listdir(os.path.join(single, "snps/output")))
    files += [f"snps/output/{f}" for f in single_species]
    for rel in files:
        want = _read(os.path.join(single, rel))
        got = _read(os.path.join(outdir, rel))
        assert got == want, f"{rel} differs between 1- and 2-process CLI runs"
    # only rank 0 writes the log (rank 1's went to /dev/null)
    assert os.path.isfile(os.path.join(outdir, "species/log.txt"))
