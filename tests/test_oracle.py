import numpy as np
import pytest

from midas_tpu.align import GLOBAL_SCORING, LOCAL_SCORING, MARKER_SCORING, align_oracle
from midas_tpu.io.seqio import encode_seq


def E(s):
    return encode_seq(s)


def test_perfect_local_match():
    a = align_oracle(E("ACGTACGT"), E("TTACGTACGTTT"), MARKER_SCORING)
    assert a.score == 16  # 8 matches * +2 (megablast x2 scaling)
    assert a.matches == 8 and a.mismatches == 0 and a.gap_cols == 0
    assert (a.qstart, a.qend) == (0, 8)
    assert (a.tstart, a.tend) == (2, 10)
    assert a.blast_pid == 100.0


def test_mismatch_scoring():
    #      ACGTACGT
    #      ACGAACGT   (one mismatch at pos 3)
    a = align_oracle(E("ACGTACGT"), E("ACGAACGT"), MARKER_SCORING)
    # megablast x2 scaling: 7 matches * 2 - mismatch 4
    assert a.score == 7 * 2 - 4
    assert a.matches == 7 and a.mismatches == 1
    assert a.nm == 1


def test_local_clips_bad_prefix():
    # bad prefix should be soft-clipped in local mode
    a = align_oracle(E("TTTTACGTACGTACGT"), E("GGGGACGTACGTACGT"), MARKER_SCORING)
    assert a.qstart == 4 and a.matches == 12 and a.mismatches == 0


def test_gap_alignment():
    # query has 2bp deletion relative to target
    q = "ACGTACGTACGTACGTACGT"
    t = "ACGTACGTACAAGTACGTACGT"
    a = align_oracle(E(q), E(t), MARKER_SCORING)
    assert a.gap_cols == 2 and a.gap_opens == 1
    assert a.matches == 20
    # megablast linear gaps (x2 scaling): 20*2 - (open 0 + 2*ext 5)
    assert a.score == 40 - 10


def test_glocal_full_query():
    # glocal: whole query aligned even with mismatched ends
    q = "TACGTACGTA"
    t = "GGGGACGTACGTGGGG"
    a = align_oracle(E(q), E(t), GLOBAL_SCORING)
    assert a.qstart == 0 and a.qend == len(q)
    # ends mismatch: score = 2 mismatches * -6 = -12
    assert a.score == -12
    assert a.mismatches == 2 and a.matches == 8


def test_glocal_n_never_matches():
    a = align_oracle(E("ACGNACGT"), E("ACGNACGT"), GLOBAL_SCORING)
    assert a.mismatches == 1  # N vs N is a mismatch
    assert a.matches == 7


def test_qpos_to_tpos_map():
    q = "ACGTACGT"
    t = "TTACGTACGTTT"
    a = align_oracle(E(q), E(t), GLOBAL_SCORING)
    m = a.qpos_to_tpos(len(q))
    assert list(m) == [2, 3, 4, 5, 6, 7, 8, 9]


def test_qpos_map_with_deletion():
    q = "ACGTACGTACGTACGTACGT"
    t = "ACGTACGTACAAGTACGTACGT"  # 2bp insert in target = deletion in query
    a = align_oracle(E(q), E(t), GLOBAL_SCORING)
    m = a.qpos_to_tpos(len(q))
    assert list(m[:10]) == list(range(10))
    assert list(m[10:]) == list(range(12, 22))


def test_local_no_alignment_returns_none():
    a = align_oracle(E("AAAAAAA"), E("CCCCCCC"), LOCAL_SCORING)
    assert a is None


def test_bowtie_pid_matches_keep_read_formula():
    # one mismatch in 100bp: pid = 100*(100-1)/100 = 99.0
    rng = np.random.default_rng(0)
    t = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    q = list(t)
    q[50] = "ACGT"[("ACGT".index(q[50]) + 1) % 4]
    a = align_oracle(E("".join(q)), E(t), GLOBAL_SCORING)
    assert a.aligned_qlen == 100
    assert a.bowtie_pid == pytest.approx(99.0)
    assert a.score == -6


def test_score_min_defaults():
    assert GLOBAL_SCORING.score_min(100) == pytest.approx(-60.6)
    assert LOCAL_SCORING.score_min(100) == pytest.approx(20 + 8 * np.log(100))


def test_batch_oracle_matches_scalar():
    """align_oracle_batch must reproduce align_oracle exactly — scores,
    spans, column maps — on random substitution+indel cases, both modes,
    ragged lengths."""
    import numpy as np

    from midas_tpu.align.oracle import align_oracle, align_oracle_batch
    from midas_tpu.align.params import GLOBAL_SCORING, LOCAL_SCORING

    rng = np.random.default_rng(0)
    for params in (GLOBAL_SCORING, LOCAL_SCORING):
        queries, targets = [], []
        for _ in range(40):
            m = int(rng.integers(40, 130))
            t = rng.integers(0, 4, size=m).astype(np.int8)
            n = int(rng.integers(20, min(m, 100)))
            lo = int(rng.integers(0, m - n + 1))
            q = t[lo: lo + n].copy()
            # substitutions
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, len(q)))
                q[p] = (q[p] + int(rng.integers(1, 4))) % 4
            # maybe an indel
            if rng.random() < 0.5 and len(q) > 6:
                p = int(rng.integers(1, len(q) - 2))
                if rng.random() < 0.5:
                    q = np.delete(q, slice(p, p + int(rng.integers(1, 3))))
                else:
                    q = np.insert(q, p, rng.integers(0, 4,
                                                     int(rng.integers(1, 3))))
            queries.append(q.astype(np.int8))
            targets.append(t)
        got = align_oracle_batch(queries, targets, params)
        for q, t, g in zip(queries, targets, got):
            want = align_oracle(q, t, params)
            if want is None:
                assert g is None
                continue
            assert g is not None
            assert g.score == want.score
            assert (g.qstart, g.qend, g.tstart, g.tend) == \
                (want.qstart, want.qend, want.tstart, want.tend)
            assert (g.matches, g.mismatches, g.gap_opens, g.gap_cols) == \
                (want.matches, want.mismatches, want.gap_opens, want.gap_cols)
            np.testing.assert_array_equal(g.col_qpos, want.col_qpos)
            np.testing.assert_array_equal(g.col_tpos, want.col_tpos)
