"""CNV and SNP profilers end-to-end on simulated data with known truth."""

import gzip
import os

import numpy as np
import pytest

from midas_tpu.io.seqio import parse_file
from midas_tpu.profile.genes import run_genes
from midas_tpu.profile.snps import run_snps
from midas_tpu.profile.species import run_species


@pytest.fixture(scope="module")
def sample_dir(sim_community, sim_reads, tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("sample_full"))
    fq, truth = sim_reads
    base = dict(outdir=outdir, db=sim_community.db_dir, m1=fq, m2=None)
    run_species(dict(base))
    run_genes(dict(base, build_db=True, align=True, cov=True, species_cov=0.1))
    run_snps(dict(base, build_db=True, align=True, call=True, species_cov=0.1))
    return outdir, truth


def test_genes_outputs(sample_dir, sim_community):
    outdir, truth = sample_dir
    summary = {r["species_id"]: r for r in
               parse_file(os.path.join(outdir, "genes/summary.txt"))}
    assert len(summary) >= 1
    sp0 = sim_community.species[0].species_id
    assert sp0 in summary
    s = summary[sp0]
    assert int(s["pangenome_size"]) == len(sim_community.species[0].genes)
    assert float(s["fraction_covered"]) > 0.5
    assert int(s["mapped_reads"]) > 100
    assert float(s["marker_coverage"]) > 0
    # per-gene file: genes on the rep genome should have copy number ~1
    rows = list(parse_file(os.path.join(outdir, f"genes/output/{sp0}.genes.gz")))
    on_genome = [g["gene_id"] for g in sim_community.species[0].genes
                 if g["scaffold_id"] is not None]
    copies = [float(r["copy_number"]) for r in rows if r["gene_id"] in on_genome]
    assert len(copies) == len(on_genome)
    med = np.median(copies)
    assert 0.5 < med < 2.0, med
    # extra (off-genome) genes got no reads
    off = [float(r["coverage"]) for r in rows if r["gene_id"] not in on_genome]
    assert all(c == 0.0 for c in off)
    # gene ids sorted within file
    ids = [r["gene_id"] for r in rows]
    assert ids == sorted(ids)


def test_snps_outputs(sample_dir, sim_community):
    outdir, truth = sample_dir
    summary = {r["species_id"]: r for r in
               parse_file(os.path.join(outdir, "snps/summary.txt"))}
    sp0 = sim_community.species[0]
    s = summary[sp0.species_id]
    genome_len = sum(len(c) for c in sp0.contigs.values())
    assert int(s["genome_length"]) == genome_len
    assert float(s["fraction_covered"]) > 0.7
    assert float(s["mean_coverage"]) > 1.0
    assert int(s["mapped_reads"]) > 100


def test_snps_ref_alleles_and_depth(sample_dir, sim_community):
    outdir, truth = sample_dir
    sp0 = sim_community.species[0]
    rows = list(parse_file(os.path.join(outdir, f"snps/output/{sp0.species_id}.snps.gz")))
    genome_len = sum(len(c) for c in sp0.contigs.values())
    assert len(rows) == genome_len
    # ref alleles must match the simulated genome
    by_contig = {}
    for r in rows:
        by_contig.setdefault(r["ref_id"], []).append(r)
    for cid, seq in sp0.contigs.items():
        crows = by_contig[cid]
        assert len(crows) == len(seq)
        for p in (0, len(seq) // 2, len(seq) - 1):
            assert crows[p]["ref_allele"] == seq[p]
            assert int(crows[p]["ref_pos"]) == p + 1
    # pileup counts: at covered positions the modal allele == ref allele
    # nearly everywhere (0.5% error rate)
    agree = disagree = 0
    for r in rows:
        cnts = [int(r["count_a"]), int(r["count_c"]), int(r["count_g"]), int(r["count_t"])]
        if sum(cnts) >= 3:
            major = "ACGT"[int(np.argmax(cnts))]
            if major == r["ref_allele"]:
                agree += 1
            else:
                disagree += 1
    assert agree > 1000
    assert disagree < 0.01 * agree


def test_snps_depth_column_consistency(sample_dir, sim_community):
    outdir, _ = sample_dir
    sp0 = sim_community.species[0].species_id
    for r in parse_file(os.path.join(outdir, f"snps/output/{sp0}.snps.gz")):
        assert int(r["depth"]) == (int(r["count_a"]) + int(r["count_c"])
                                   + int(r["count_g"]) + int(r["count_t"]))
