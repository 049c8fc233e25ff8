"""Analysis tools over merged SNP matrices and gene matrices."""

import os

import numpy as np
import pytest

from midas_tpu.analyze.compare_genes import compare_genes
from midas_tpu.analyze.consensus import call_consensus
from midas_tpu.analyze.diversity import snp_diversity
from midas_tpu.analyze.parse_snps import SnpMatrix, fetch_samples, fetch_sites
from midas_tpu.analyze.track_strains import id_markers, track_markers
from midas_tpu.io.seqio import parse_file, read_fastx


@pytest.fixture(scope="module")
def sp0_dir(merged_all_sites, sim_community):
    return os.path.join(merged_all_sites, sim_community.species[0].species_id)


def test_parse_snps_roundtrip(sp0_dir, sim_community):
    species = SnpMatrix(sp0_dir)
    assert species.sample_ids == ["sample0", "sample1", "sample2"]
    samples = fetch_samples(species)
    assert set(samples) == {"sample0", "sample1", "sample2"}
    n = 0
    genome_len = sum(len(c) for c in sim_community.species[0].contigs.values())
    for site in fetch_sites(species, samples):
        n += 1
        if n == 1:
            assert site.ref_allele in "ACGT"
            assert all(s.depth >= 0 for s in site.samples.values())
    assert n == genome_len


def test_consensus_sequences(sp0_dir, tmp_path):
    out = str(tmp_path / "consensus.fa")
    seqs = call_consensus(sp0_dir, out, site_depth=1, max_sites=5000)
    assert set(seqs) == {"sample0", "sample1", "sample2"}
    lengths = {len(s) for s in seqs.values()}
    assert len(lengths) == 1  # aligned: same length
    with open(out) as f:
        recs = list(read_fastx(f))
    assert len(recs) == 3
    # consensus bases are ACGT or '-'
    assert set(recs[0][1]) <= set("ACGT-")
    # samples from similar mixtures should mostly agree
    a, b = seqs["sample0"], seqs["sample1"]
    both = [(x, y) for x, y in zip(a, b) if x != "-" and y != "-"]
    agree = sum(1 for x, y in both if x == y)
    assert agree / max(len(both), 1) > 0.95


def test_snp_diversity_per_sample(sp0_dir, tmp_path):
    out = str(tmp_path / "pi.txt")
    pi = snp_diversity(sp0_dir, out=out, site_depth=1)
    rows = list(parse_file(out))
    assert [r["sample_id"] for r in rows] == ["sample0", "sample1", "sample2"]
    # sample2 has 2% sequencing error -> higher within-sample diversity
    pis = {r["sample_id"]: float(r["pi"]) for r in rows}
    assert pis["sample2"] > pis["sample0"]
    assert all(float(r["sites"]) > 0 for r in rows)


def test_snp_diversity_pooled_and_per_gene(sp0_dir, tmp_path):
    out = str(tmp_path / "pi_pooled.txt")
    snp_diversity(sp0_dir, out=out, sample_type="pooled-samples",
                  site_depth=1)
    rows = list(parse_file(out))
    assert len(rows) == 1 and float(rows[0]["sites"]) > 0
    out2 = str(tmp_path / "pi_gene.txt")
    snp_diversity(sp0_dir, out=out2, genomic_type="per-gene",
                  locus_type="CDS", site_depth=1, max_sites=4000)
    rows2 = list(parse_file(out2))
    assert len(rows2) > 10
    assert {r["sample_id"] for r in rows2} == {"sample0", "sample1", "sample2"}


def test_strain_tracking(sp0_dir, tmp_path):
    markers_out = str(tmp_path / "markers.txt")
    n = id_markers(sp0_dir, markers_out, min_freq=0.1, min_reads=1,
                   allele_prev=1)
    rows = list(parse_file(markers_out))
    assert len(rows) == n
    if n:
        assert set(rows[0]) == {"site_id", "allele", "count_samples",
                                "count_A", "count_T", "count_C", "count_G"}
        share_out = str(tmp_path / "sharing.txt")
        track_markers(sp0_dir, share_out, markers_out, min_freq=0.1, min_reads=1)
        srows = list(parse_file(share_out))
        assert len(srows) == 3  # 3 choose 2 pairs
        for r in srows:
            assert int(r["count_both"]) <= min(int(r["count1"]), int(r["count2"]))
            assert int(r["count_either"]) >= max(int(r["count1"]), int(r["count2"]))


def test_compare_genes(three_samples, sim_community, tmp_path_factory, tmp_path):
    from midas_tpu.merge import genes as merge_genes
    outdir = str(tmp_path_factory.mktemp("merged_genes_cmp"))
    merge_genes.run_pipeline(dict(
        indirs=three_samples, outdir=outdir, db=sim_community.db_dir,
        sample_depth=0.0, min_samples=1, cluster_pid="95", min_copy=0.35))
    sp0 = sim_community.species[0].species_id
    out = str(tmp_path / "dist.txt")
    compare_genes(os.path.join(outdir, sp0), out, dtype="presabs",
                  distance="jaccard")
    rows = list(parse_file(out))
    assert len(rows) == 3
    for r in rows:
        d = float(r["distance"])
        assert 0.0 <= d <= 1.0
    out2 = str(tmp_path / "dist_eu.txt")
    compare_genes(os.path.join(outdir, sp0), out2, dtype="copynum",
                  distance="euclidean")
    rows2 = list(parse_file(out2))
    assert all(float(r["distance"]) >= 0 for r in rows2)


def test_query_by_compound(three_samples, sim_community, tmp_path):
    """Wire a tiny EC ontology into the sim DB and query it."""
    import gzip
    from midas_tpu.analyze.query_compound import query_by_compound
    db = sim_community.db_dir
    sp0 = sim_community.species[0]
    # annotate the first two genes with an enzyme
    g0, g1 = sp0.genes[0]["gene_id"], sp0.genes[1]["gene_id"]
    fdir = os.path.join(db, "pan_genomes", sp0.species_id)
    with gzip.open(os.path.join(fdir, "centroid_functions.txt.gz"), "wt") as f:
        f.write("gene_id\tfunction_id\tontology\n")
        f.write(f"{g0}\t1.1.1.1\tec\n{g1}\t2.2.2.2\tec\n")
    os.makedirs(os.path.join(db, "kegg"), exist_ok=True)
    with open(os.path.join(db, "kegg", "cpd_to_enzyme.txt"), "w") as f:
        f.write("C00001\t1.1.1.1\nC00001\t2.2.2.2\nC00002\t9.9.9.9\n")
    out = str(tmp_path / "compound.txt")
    n = query_by_compound(three_samples, db, "C00001", out)
    rows = list(parse_file(out))
    assert n == len(rows)
    assert {r["gene_id"] for r in rows} <= {g0, g1}
    assert {r["enzyme_id"] for r in rows} <= {"1.1.1.1", "2.2.2.2"}
    # every sample that profiled species 1 contributes rows
    assert len({r["sample_id"] for r in rows}) >= 1
