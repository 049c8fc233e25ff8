"""Species profiler end-to-end: recovered abundances must track the
simulated mixture, and output format must match the reference contract."""

import os

import numpy as np
import pytest

from midas_tpu.db import Database
from midas_tpu.profile.species import (
    SpeciesProfiler,
    read_abundance,
    run_species,
    select_species,
    write_abundance,
)


@pytest.fixture(scope="module")
def species_out(sim_community, sim_reads, tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("sample1"))
    fq, truth = sim_reads
    args = dict(outdir=outdir, db=sim_community.db_dir, m1=fq, m2=None, m8=True)
    abundance = run_species(args)
    return outdir, abundance, truth


def test_profile_file_format(species_out):
    outdir, abundance, _ = species_out
    path = os.path.join(outdir, "species/species_profile.txt")
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header == ["species_id", "count_reads", "coverage", "relative_abundance"]
        rows = [line.rstrip("\n").split("\t") for line in f]
    counts = [int(r[1]) for r in rows]
    assert counts == sorted(counts, reverse=True)  # sorted by count desc
    rel = sum(float(r[3]) for r in rows)
    assert rel == pytest.approx(1.0, abs=1e-9)
    # round-trips through the reference parser semantics
    parsed = read_abundance(path)
    assert set(parsed) == set(abundance)


def test_abundances_track_truth(species_out, sim_community):
    outdir, abundance, truth = species_out
    # simulated mixture: 0.5 / 0.3 / 0.15 / 0.05 across 4 species; species
    # 4 is a 3% mutant of species 1 so some reads are ambiguous between them
    true_frac = {}
    for t in truth:
        true_frac[t["species_id"]] = true_frac.get(t["species_id"], 0) + 1
    total = sum(true_frac.values())
    true_frac = {k: v / total for k, v in true_frac.items()}
    for sid, v in abundance.items():
        assert abs(v["rel_abun"] - true_frac.get(sid, 0.0)) < 0.08, (
            sid, v["rel_abun"], true_frac.get(sid))


def test_m8_written(species_out):
    outdir, _, _ = species_out
    m8 = os.path.join(outdir, "species/temp/alignments.m8")
    with open(m8) as f:
        lines = [l.split("\t") for l in f]
    assert len(lines) > 50
    assert all(len(l) == 12 for l in lines)
    # renamed-query convention {id}_{len}
    assert lines[0][0].endswith("_100")
    # read_count.txt bookkeeping
    with open(os.path.join(outdir, "species/temp/read_count.txt")) as f:
        reads, bp = f.read().split("\t")
    assert int(reads) == 800 and int(bp) == 800 * 100


def test_select_species(species_out, sim_community):
    outdir, abundance, _ = species_out
    db = Database(sim_community.db_dir)
    covered = select_species(db, outdir, species_cov=0.1)
    assert len(covered) >= 1
    top1 = select_species(db, outdir, species_topn=1)
    best = max(abundance.items(), key=lambda kv: kv[1]["rel_abun"])[0]
    assert top1 == [best]
    named = select_species(db, outdir, species_id=["test_species_2"])
    assert named == ["test_species_2"]


def test_deterministic_with_seed(sim_community, sim_reads):
    db = Database(sim_community.db_dir)
    fq, _ = sim_reads
    p1 = SpeciesProfiler(db, seed=7)
    a1 = p1.run(fq)
    p2 = SpeciesProfiler(db, seed=7)
    a2 = p2.run(fq)
    assert a1 == a2


def test_tie_cap_sufficient_on_related_species(tmp_path):
    """Measure tie-set sizes on a tie-heavy DB (6 species related at 2%
    divergence — conserved marker reads tie across many of them) and
    verify the default num_cands=8 candidate cap does not truncate the
    classifier's tie sets: doubling the cap to 16 must not change the
    profile, and the observed tie widths must fit the default cap.
    (Round-1/2 review item: the reference keeps unbounded ties,
    midas/run/species.py:79-84.)"""
    from midas_tpu.align.seed import SeedParams
    from midas_tpu.db import Database
    from midas_tpu.profile.species import SpeciesProfiler
    from midas_tpu.testkit import simulate_db, simulate_reads

    comm = simulate_db(str(tmp_path / "db"), n_species=2, genome_len=12000,
                       gene_len=600, n_extra_genes=2, related_pairs=5,
                       divergence=0.02, seed=3)
    fq = str(tmp_path / "reads.fq.gz")
    simulate_reads(comm, fq, n_reads=600, error_rate=0.0, seed=4)
    db = Database(comm.db_dir)
    prof8 = SpeciesProfiler(db)  # default num_cands=8
    got8 = prof8.run([fq], batch_size=128)
    widths = [len(t[1]) for t in
              prof8._run_device([fq], None, None, 128)[2]]
    prof16 = SpeciesProfiler(db, seed_params=SeedParams(num_cands=16,
                                                        max_hits=32))
    got16 = prof16.run([fq], batch_size=128)
    assert got8 == got16, "num_cands=8 truncated tie sets vs num_cands=16"
    assert widths, "tie-heavy DB produced no ambiguous reads"
    assert max(widths) <= 8, f"tie width {max(widths)} exceeds default cap"
