"""Database builder: clustering, HMM marker search, full build ->
pipeline round trip."""

import os

import numpy as np
import pytest

from midas_tpu.db import Database
from midas_tpu.dbbuild.cluster import cluster_levels, greedy_cluster
from midas_tpu.io.seqio import parse_file
from midas_tpu.testkit import simulate_db, simulate_reads
from midas_tpu.testkit.simulate import write_genome_inputs, _mutate

PHYECO_HMM = "/root/reference/midas/build/phyeco.hmm"


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def test_greedy_cluster_groups_similar():
    rng = np.random.default_rng(0)
    base1, base2 = _rand_seq(rng, 900), _rand_seq(rng, 900)
    names = ["a1", "a2", "a3", "b1", "b2", "c1"]
    seqs = [base1, _mutate(rng, base1, 0.002), _mutate(rng, base1, 0.005),
            base2, _mutate(rng, base2, 0.003), _rand_seq(rng, 900)]
    cmap = greedy_cluster(names, seqs, identity=0.99)
    assert cmap["a1"] == cmap["a2"] == cmap["a3"]
    assert cmap["b1"] == cmap["b2"]
    assert cmap["a1"] != cmap["b1"] != cmap["c1"]
    # at 90% the 3% divergent pair still merges; unrelated stays apart
    seqs2 = [base1, _mutate(rng, base1, 0.03), _rand_seq(rng, 900)]
    cmap90 = greedy_cluster(["x", "y", "z"], seqs2, identity=0.90)
    assert cmap90["x"] == cmap90["y"]
    assert cmap90["z"] != cmap90["x"]


def test_cluster_levels_transitive():
    rng = np.random.default_rng(1)
    base = _rand_seq(rng, 600)
    names = [f"g{i}" for i in range(5)]
    seqs = [base, _mutate(rng, base, 0.002), _mutate(rng, base, 0.04),
            _rand_seq(rng, 600), _rand_seq(rng, 600)]
    maps = cluster_levels(names, seqs)
    # every gene mapped at every level; 99-level centroids are genes
    for pid, m in maps.items():
        assert set(m) == set(names)
    # g2 (4% divergent) separate at 99, merged with g0 at 90
    assert maps[99]["g2"] != maps[99]["g0"]
    assert maps[90]["g2"] == maps[90]["g0"]


@pytest.mark.skipif(not os.path.isfile(PHYECO_HMM), reason="phyeco.hmm absent")
def test_hmm_search_real_models():
    from midas_tpu.dbbuild.hmm import (
        AMINO, parse_hmm_file, search_proteins, viterbi_score)
    models = parse_hmm_file(PHYECO_HMM)
    assert len(models) == 15
    m = models[0]
    cons = "".join(AMINO[int(np.argmax(m.match_logodds[i]))]
                   for i in range(1, m.length + 1))
    rng = np.random.default_rng(0)
    rand = "".join(AMINO[i] for i in rng.integers(0, 20, m.length))
    hits = search_proteins([m], {"good": cons, "bad": rand})
    assert hits[m.name][0] == "good"
    assert viterbi_score(m, cons) > 300
    assert viterbi_score(m, rand) < 20


@pytest.fixture(scope="module")
def built_db(tmp_path_factory):
    """Simulate genomes -> write builder inputs -> run the builder."""
    from midas_tpu.dbbuild.build_db import run_build
    root = tmp_path_factory.mktemp("dbbuild")
    comm = simulate_db(str(root / "truth_db"), n_species=2, genome_len=9000,
                       gene_len=600, n_extra_genes=2, related_pairs=1,
                       divergence=0.03, seed=5)
    indir = str(root / "genomes")
    mapfile = write_genome_inputs(comm, indir)
    # marker_map mode: families already known from the simulator
    marker_map = str(root / "markers.tsv")
    with open(marker_map, "w") as f:
        for sp in comm.species:
            for marker_id, gene_id in sp.marker_gene_ids.items():
                f.write(f"{gene_id}\t{marker_id}\n")
    outdir = str(root / "built")
    run_build(dict(indir=indir, mapfile=mapfile, outdir=outdir,
                   marker_map=marker_map))
    return comm, outdir


def test_built_db_layout(built_db):
    comm, outdir = built_db
    db = Database(outdir)  # check_database passes
    info = db.species_info()
    assert set(info) == set(comm.species_ids())
    markers = db.marker_info()
    assert len(markers) > 0
    for sid in comm.species_ids():
        genes = db.read_genes(sid)
        assert genes, sid
        # features located exactly where the simulator placed them
        truth = {g["gene_id"]: g for g in
                 next(s for s in comm.species if s.species_id == sid).genes
                 if g["scaffold_id"] is not None}
        for g in genes[:5]:
            t = truth[g["gene_id"]]
            assert (g["scaffold_id"], g["start"], g["end"], g["strand"]) == (
                t["scaffold_id"], t["start"], t["end"], t["strand"])
        gi = list(parse_file(db.gene_info(sid)))
        assert all(r["centroid_99"] for r in gi)


def test_built_db_runs_pipeline(built_db, tmp_path):
    from midas_tpu.profile.species import run_species
    comm, outdir = built_db
    fq = str(tmp_path / "r.fq.gz")
    simulate_reads(comm, fq, n_reads=400, abundances=[0.6, 0.3, 0.1], seed=9)
    ab = run_species(dict(outdir=str(tmp_path / "s"), db=outdir, m1=fq, m2=None))
    ranked = sorted(ab.items(), key=lambda kv: -kv[1]["rel_abun"])
    assert ranked[0][0] == comm.species_ids()[0]
    assert ranked[0][1]["rel_abun"] > 0.4


@pytest.mark.skipif(not os.path.isfile(PHYECO_HMM), reason="phyeco.hmm absent")
def test_build_with_hmm_markers(tmp_path):
    """Genomes carrying reverse-translated PhyEco consensus genes: the
    HMM path must find them as markers."""
    from midas_tpu.dbbuild.build_db import run_build
    from midas_tpu.dbbuild.hmm import AMINO, parse_hmm_file
    from midas_tpu.utils import CODON_TABLE
    aa_to_codon = {}
    for codon, aa in sorted(CODON_TABLE.items()):
        aa_to_codon.setdefault(aa, codon)
    models = parse_hmm_file(PHYECO_HMM)[:3]
    rng = np.random.default_rng(2)
    gdir = tmp_path / "genomes" / "gX"
    gdir.mkdir(parents=True)
    genes = {}
    for j, m in enumerate(models):
        prot = "".join(AMINO[int(np.argmax(m.match_logodds[i]))]
                       for i in range(1, m.length + 1))
        genes[f"gX.peg.{j+1}"] = ("".join(aa_to_codon[a] for a in prot), prot)
    # one non-marker gene
    genes["gX.peg.99"] = ("".join("ACGT"[i] for i in rng.integers(0, 4, 300)),
                          "M" * 100)
    contig = "".join(seq for seq, _p in genes.values())
    (gdir / "gX.fna").write_text(f">gX_ctg1\n{contig}\n")
    (gdir / "gX.ffn").write_text(
        "".join(f">{n}\n{s}\n" for n, (s, _p) in genes.items()))
    (gdir / "gX.faa").write_text(
        "".join(f">{n}\n{p}\n" for n, (_s, p) in genes.items()))
    mapfile = tmp_path / "map.tsv"
    mapfile.write_text("genome_id\tspecies_id\trep_genome\ngX\tspX\t1\n")
    outdir = str(tmp_path / "built")
    run_build(dict(indir=str(tmp_path / "genomes"), mapfile=str(mapfile),
                   outdir=outdir, hmms=PHYECO_HMM))
    rows = list(parse_file(os.path.join(outdir, "marker_genes/phyeco.map")))
    families = {r["marker_id"]: r["gene_id"] for r in rows}
    for j, m in enumerate(models):
        assert families.get(m.name) == f"gX.peg.{j+1}", (m.name, families)


def test_cluster_identity_estimate_agrees_with_alignment():
    """Clustering-agreement measurement (round-2 review item): the
    k-mer-containment identity estimate that drives greedy_cluster
    (dbbuild/cluster.py:41-48, replacing vsearch -cluster_fast at
    build_db.py:204-213) must agree with TRUE alignment identity from
    the exact oracle on borderline pairs around the 99%/95% thresholds:
    same clustering decision for pairs clearly on either side, and the
    estimate within 2 identity points of alignment identity."""
    import numpy as np

    from midas_tpu.align.oracle import align_oracle
    from midas_tpu.align.params import ScoringParams
    from midas_tpu.dbbuild.cluster import (_ani_from_containment, _kmer_set,
                                           greedy_cluster)
    from midas_tpu.io.seqio import encode_seq

    # glocal scoring with gentle gaps for a global identity measure
    ident_scoring = ScoringParams(match=1, mismatch=-1, gap_open=2,
                                  gap_extend=1, mode="glocal")
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    def mutate(seq, div):
        arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
        n = int(round(div * len(arr)))
        pos = rng.choice(len(arr), n, replace=False)
        shift = rng.integers(1, 4, size=n)
        idx = np.searchsorted(bases, arr[pos])
        arr[pos] = bases[(idx + shift) % 4]
        return arr.tobytes().decode()

    k = 12
    diffs = []
    decisions_ok = clear_cases = 0
    for div in (0.002, 0.005, 0.008, 0.02, 0.04, 0.08, 0.12):
        for rep in range(3):
            a = "".join("ACGT"[b] for b in rng.integers(0, 4, 600))
            b = mutate(a, div)
            # alignment identity via the exact oracle
            ca, cb = encode_seq(a), encode_seq(b)
            aln = align_oracle(ca, cb, ident_scoring)
            aln_id = aln.matches / max(aln.aln_cols, 1)
            # the clusterer's containment estimate
            ka, kb = _kmer_set(ca, k), _kmer_set(cb, k)
            cont = len(np.intersect1d(ka, kb)) / max(len(ka), 1)
            est_id = _ani_from_containment(cont, k)
            diffs.append(abs(est_id - aln_id))
            # clustering decision agreement at 95% for pairs clearly on
            # either side of the threshold
            if abs(aln_id - 0.95) > 0.015:
                clear_cases += 1
                got = greedy_cluster(["a", "b"], [a, b], identity=0.95, k=k)
                same_cluster = got["b"] == got["a"]
                decisions_ok += int(same_cluster == (aln_id >= 0.95))
    assert max(diffs) <= 0.02, f"identity estimate off by {max(diffs):.3f}"
    assert clear_cases >= 10
    assert decisions_ok == clear_cases, (decisions_ok, clear_cases)
