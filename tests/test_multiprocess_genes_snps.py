"""Two-process jax.distributed runs of the multi-host genes and snps
drivers (dist/driver.py): both ranks stride the shared read stream,
merge the [G+1] CNV counters / the [4 x G] pileup tensor + gapped spill
with end-of-stream process_allgather, and rank 0's written outputs must
be byte-identical (decompressed) to a single-process run. Closes
BASELINE config[4] for the two heavy pipelines (the reference's
equivalent machinery is its fork pools + line-range shards,
midas/utility.py:81-107, midas/merge/snps.py:366-386)."""

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
species = sys.argv[7].split(",")
jax.distributed.initialize(f"localhost:{port}", nproc, rank)
from midas_tpu.dist.driver import run_genes_multihost, run_snps_multihost
run_genes_multihost(db_dir, fq, species, outdir=outdir, batch_size=128)
run_snps_multihost(db_dir, fq, species, outdir=outdir, batch_size=128)
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


def test_two_process_genes_snps_drivers(sim_community, sim_reads, tmp_path):
    from midas_tpu.db import Database
    from midas_tpu.profile.genes import GenesProfiler
    from midas_tpu.profile.snps import SnpsProfiler

    fq, _truth = sim_reads
    db = Database(sim_community.db_dir)
    species = sim_community.species_ids()[:2]

    single = str(tmp_path / "single")
    gp = GenesProfiler(db, species)
    gp.run([fq], batch_size=128)
    gp.write_results(single)
    sp = SnpsProfiler(db, species)
    sp.run([fq], batch_size=128)
    sp.write_results(single)

    port = _free_port()
    outdir = str(tmp_path / "multi")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 device per process
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(r), "2", str(port),
             sim_community.db_dir, fq, outdir, ",".join(species)],
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

    files = ["genes/summary.txt", "snps/summary.txt"]
    files += [f"genes/output/{s}.genes.gz" for s in species]
    files += [f"snps/output/{s}.snps.gz" for s in species]
    for rel in files:
        want = _read(os.path.join(single, rel))
        got = _read(os.path.join(outdir, rel))
        assert got == want, f"{rel} differs between 1- and 2-process runs"
