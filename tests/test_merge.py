"""Cross-sample mergers on 3 simulated samples."""

import os

import numpy as np
import pytest

from midas_tpu.io.seqio import parse_file
from midas_tpu.merge import species as merge_species
from midas_tpu.merge import genes as merge_genes
from midas_tpu.merge import snps as merge_snps


def test_merge_species(three_samples, sim_community, tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("merged_species"))
    merge_species.run_pipeline(dict(
        indirs=three_samples, outdir=outdir, db=sim_community.db_dir, min_cov=1.0))
    for fname in ["relative_abundance.txt", "coverage.txt", "count_reads.txt",
                  "species_prevalence.txt", "readme.txt"]:
        assert os.path.isfile(os.path.join(outdir, fname))
    rows = list(parse_file(os.path.join(outdir, "relative_abundance.txt")))
    assert len(rows) == 4  # all species
    sample_ids = [k for k in rows[0] if k != "species_id"]
    assert sorted(sample_ids) == ["sample0", "sample1", "sample2"]
    # column sums ~1
    for sid in sample_ids:
        total = sum(float(r[sid]) for r in rows)
        assert total == pytest.approx(1.0, abs=1e-6)


def test_merge_genes(three_samples, sim_community, tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("merged_genes"))
    merge_genes.run_pipeline(dict(
        indirs=three_samples, outdir=outdir, db=sim_community.db_dir,
        sample_depth=0.0, min_samples=1, cluster_pid="95", min_copy=0.35))
    sp0 = sim_community.species[0].species_id
    spdir = os.path.join(outdir, sp0)
    mats = {}
    for ftype in ["presabs", "copynum", "depth", "reads"]:
        rows = list(parse_file(os.path.join(spdir, f"genes_{ftype}.txt")))
        mats[ftype] = rows
        assert len(rows) == len(sim_community.species[0].genes)
    # presabs consistent with copynum threshold
    for pa, cn in zip(mats["presabs"], mats["copynum"]):
        for s in ["sample0", "sample1", "sample2"]:
            assert (float(pa[s]) == 1.0) == (float(cn[s]) >= 0.35)
    # summary per sample
    srows = list(parse_file(os.path.join(outdir, sp0, "genes_summary.txt")))
    assert [r["sample_id"] for r in srows] == ["sample0", "sample1", "sample2"]


def test_merge_snps(three_samples, sim_community, tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("merged_snps"))
    args = dict(
        indirs=three_samples, outdir=outdir, db=sim_community.db_dir,
        sample_depth=0.0, fract_cov=0.0, min_samples=1,
        snp_type=["any"], allele_freq=0.01, site_depth=0,
        site_ratio=float("inf"), site_prev=0.0, max_sites=float("inf"))
    merge_snps.run_pipeline(args)
    sp0 = sim_community.species[0]
    spdir = os.path.join(outdir, sp0.species_id)
    info = list(parse_file(os.path.join(spdir, "snps_info.txt")))
    genome_len = sum(len(c) for c in sp0.contigs.values())
    assert len(info) == genome_len  # every site passes the lenient filters

    # pooled counts must equal the sum of the three per-sample pileups
    per_sample = []
    for d in three_samples:
        rows = list(parse_file(os.path.join(d, "snps/output",
                                            f"{sp0.species_id}.snps.gz")))
        per_sample.append(rows)
    for j in [0, genome_len // 3, genome_len - 1]:
        pooled = [int(info[j][f"count_{b}"]) for b in "acgt"]
        expect = [sum(int(s[j][f"count_{b}"]) for s in per_sample) for b in "acgt"]
        assert pooled == expect
        assert info[j]["ref_id"] == per_sample[0][j]["ref_id"]
        assert int(info[j]["ref_pos"]) == int(per_sample[0][j]["ref_pos"])

    # annotation: sites inside simulated genes are CDS with the right
    # gene_id; the 10bp head of each contig is IGR
    genes_by_contig = {}
    for g in sp0.genes:
        if g["scaffold_id"] is not None:
            genes_by_contig.setdefault(g["scaffold_id"], []).append(g)
    checked_cds = checked_igr = 0
    for r in info[:4000]:
        pos = int(r["ref_pos"])
        hit = None
        for g in genes_by_contig.get(r["ref_id"], []):
            if g["start"] <= pos <= g["end"]:
                hit = g
                break
        if hit:
            assert r["locus_type"] == "CDS"
            assert r["gene_id"] == hit["gene_id"]
            assert r["site_type"] in {"1D", "2D", "3D", "4D"}
            assert len(r["amino_acids"].split(",")) == 4
            checked_cds += 1
        else:
            assert r["locus_type"] == "IGR"
            assert r["gene_id"] == "NA"
            checked_igr += 1
    assert checked_cds > 1000 and checked_igr > 50

    # freq/depth matrices align with info rows
    freq = list(parse_file(os.path.join(spdir, "snps_freq.txt")))
    depth = list(parse_file(os.path.join(spdir, "snps_depth.txt")))
    assert len(freq) == len(depth) == genome_len
    assert freq[0]["site_id"] == info[0]["site_id"]
    # sample2 had 2% error rate: it should contribute bi-allelic sites
    # (count depends on the mapq>=20 gate; the real MapqV2 tables land
    # slightly fewer reads than the earlier calibrated ones)
    bi = [r for r in info if r["snp_type"] == "bi"]
    assert len(bi) > 10


def test_merge_snps_default_filters(three_samples, sim_community, tmp_path_factory):
    """Default (core-genome bi-allelic) preset yields a small subset."""
    outdir = str(tmp_path_factory.mktemp("merged_snps_core"))
    args = dict(
        indirs=three_samples, outdir=outdir, db=sim_community.db_dir,
        sample_depth=0.0, fract_cov=0.0, min_samples=1,
        snp_type=["bi"], allele_freq=0.01, site_depth=1,
        site_ratio=float("inf"), site_prev=0.95)
    merge_snps.run_pipeline(args)
    sp0 = sim_community.species[0].species_id
    info = list(parse_file(os.path.join(outdir, sp0, "snps_info.txt")))
    genome_len = sum(len(c) for c in sim_community.species[0].contigs.values())
    assert 0 < len(info) < genome_len
    assert all(r["snp_type"] == "bi" for r in info)
