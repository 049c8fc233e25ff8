import numpy as np

from midas_tpu.db import Database, build_pack, build_seed_index
from midas_tpu.db.index import EMPTY_KEY, lookup_host, pack_kmers
from midas_tpu.db.refpack import pack_from_fasta
from midas_tpu.io.seqio import decode_seq, encode_seq


def test_database_layout(sim_community):
    db = Database(sim_community.db_dir)
    info = db.species_info()
    assert set(info) == set(sim_community.species_ids())
    markers = db.marker_info()
    # every species contributed up to 15 markers
    assert all("marker_id" in r and "gene_length" in r for r in markers.values())
    cutoffs = db.marker_cutoffs()
    assert len(cutoffs) == 15 and cutoffs["B000114"] == 94.50
    assert db.marker_cutoffs(override=95.0)["B000114"] == 95.0
    genes = db.read_genes(sim_community.species_ids()[0])
    assert genes and all(g["seq"] for g in genes)
    # sorted by scaffold, start (utility.py:244-269)
    coords = [(g["scaffold_id"], g["start"]) for g in genes]
    assert coords == sorted(coords)


def test_refpack_roundtrip(tmp_path):
    pack = build_pack([("a", "ACGTACGT"), ("b", "TTTTNNTT")])
    assert pack.num_seqs == 2 and pack.total_len == 16
    assert decode_seq(pack.seq_codes(0)) == "ACGTACGT"
    assert decode_seq(pack.seq_codes(1)) == "TTTTNNTT"
    seq_idx, local = pack.locate(np.array([0, 7, 8, 15]))
    assert list(seq_idx) == [0, 0, 1, 1]
    assert list(local) == [0, 7, 0, 7]
    p = tmp_path / "pack.npz"
    pack.save(str(p))
    pack2 = type(pack).load(str(p))
    assert pack2.names == ["a", "b"]
    assert np.array_equal(pack2.codes, pack.codes)


def test_pack_kmers():
    kmers = pack_kmers(encode_seq("ACGTN"), 2)
    # AC=0b0001=1, CG=0b0110=6, GT=0b1011=11, TN -> invalid
    assert list(kmers[:3]) == [1, 6, 11]
    assert kmers[3] == EMPTY_KEY


def test_seed_index_lookup_exact():
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=5000))
    pack = build_pack([("s", seq)])
    idx = build_seed_index(pack, k=12)
    kmers = pack_kmers(pack.codes[: pack.total_len], 12)
    # every valid kmer must be findable and list its own position
    for p in [0, 1, 100, 2500, 4988]:
        hits = lookup_host(idx, int(kmers[p]))
        assert p in hits
    # a kmer absent from the sequence returns no hits
    present = set(int(x) for x in kmers)
    missing = next(x for x in range(4**12) if x not in present)
    assert len(lookup_host(idx, missing)) == 0


def test_seed_index_boundary_mask():
    # kmers must not span the boundary between two packed sequences
    pack = build_pack([("a", "AAAACCCC"), ("b", "GGGGTTTT")])
    idx = build_seed_index(pack, k=6, min_table_size=64)
    # kmer CCGG (crossing) should not exist; check via positions list:
    # all indexed positions must start within a single sequence
    for p in idx.positions:
        seq_idx, local = pack.locate(np.array([p]))
        end = pack.offsets[seq_idx[0] + 1]
        assert p + 6 <= end


def test_seed_index_max_occ():
    pack = build_pack([("s", "A" * 1000)])
    idx = build_seed_index(pack, k=8, max_occ=16)
    hits = lookup_host(idx, 0)  # AAAAAAAA
    assert len(hits) == 16


def test_simulated_reads_truth(sim_reads, sim_community):
    fq, truth = sim_reads
    assert len(truth) == 800
    sp0 = sim_community.species[0]
    # truth positions index into the right contig
    for rec in truth[:50]:
        sp = next(s for s in sim_community.species if s.species_id == rec["species_id"])
        assert rec["contig_id"] in sp.contigs
        assert 0 <= rec["pos"] <= len(sp.contigs[rec["contig_id"]]) - 100
