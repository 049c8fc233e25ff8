"""Banded JAX kernel vs the NumPy oracle: scores and alignment stats
must agree exactly whenever the optimal path stays inside the band."""

import numpy as np
import pytest

import jax.numpy as jnp

from midas_tpu.align import GLOBAL_SCORING, LOCAL_SCORING, MARKER_SCORING, align_oracle
from midas_tpu.align.banded import banded_align
from midas_tpu.io.seqio import PAD_CODE, encode_seq

BAND = 16


def _run_banded(queries, refs, params, L=None, band=BAND):
    """queries/refs: lists of code arrays. Each ref is the window for its
    query (length L + band - 1, padded with sentinel)."""
    P = len(queries)
    L = L or max(len(q) for q in queries)
    W = L + band - 1
    qarr = np.full((P, L), PAD_CODE, dtype=np.int8)
    rarr = np.full((P, W), PAD_CODE, dtype=np.int8)
    qlens = np.zeros(P, dtype=np.int32)
    for i, (q, r) in enumerate(zip(queries, refs)):
        qarr[i, : len(q)] = q
        rarr[i, : min(len(r), W)] = r[:W]
        qlens[i] = len(q)
    out = banded_align(jnp.asarray(qarr), jnp.asarray(qlens), jnp.asarray(rarr),
                       params, band_width=band)
    return {k: np.asarray(v) for k, v in out.items()}


def _mutate(rng, seq, n_subs):
    seq = np.array(seq, copy=True)
    pos = rng.choice(len(seq), size=n_subs, replace=False)
    seq[pos] = (seq[pos] + rng.integers(1, 4, size=n_subs)) % 4
    return seq


def _assert_matches_oracle(out, i, oracle, check_coords=True):
    assert out["score"][i] == oracle.score, (out["score"][i], oracle.score)
    assert out["matches"][i] == oracle.matches
    assert out["mismatches"][i] == oracle.mismatches
    assert out["gap_cols"][i] == oracle.gap_cols
    assert out["gap_opens"][i] == oracle.gap_opens
    if check_coords:
        assert out["qstart"][i] == oracle.qstart
        assert out["qend"][i] == oracle.qend
        assert out["wstart"][i] == oracle.tstart
        assert out["wend"][i] == oracle.tend


@pytest.mark.parametrize("params", [MARKER_SCORING, LOCAL_SCORING, GLOBAL_SCORING])
def test_substitutions_match_oracle(params):
    rng = np.random.default_rng(42)
    queries, refs = [], []
    for t in range(24):
        ref = rng.integers(0, 4, size=100 + BAND - 1).astype(np.int8)
        q = _mutate(rng, ref[BAND // 2: BAND // 2 + 100], n_subs=t % 6)
        queries.append(q)
        refs.append(ref)
    out = _run_banded(queries, refs, params, L=100)
    for i in range(len(queries)):
        oracle = align_oracle(queries[i], refs[i], params)
        if oracle is None:
            assert out["score"][i] <= 0
        else:
            _assert_matches_oracle(out, i, oracle)


@pytest.mark.parametrize("params", [MARKER_SCORING, GLOBAL_SCORING, LOCAL_SCORING])
def test_indels_match_oracle(params):
    rng = np.random.default_rng(7)
    queries, refs = [], []
    for t in range(16):
        ref = rng.integers(0, 4, size=100 + BAND - 1).astype(np.int8)
        q = list(ref[BAND // 2: BAND // 2 + 100])
        if t % 3 == 0:  # deletion in query
            del q[30: 30 + 1 + t % 3]
        elif t % 3 == 1:  # insertion in query
            q[60:60] = list(rng.integers(0, 4, size=2))
            q = q[:100]
        else:  # sub + deletion
            q[10] = (q[10] + 1) % 4
            del q[70]
        queries.append(np.asarray(q, dtype=np.int8))
        refs.append(ref)
    out = _run_banded(queries, refs, params)
    for i in range(len(queries)):
        oracle = align_oracle(queries[i], refs[i], params)
        if oracle is None:
            assert out["score"][i] <= 0
            continue
        _assert_matches_oracle(out, i, oracle, check_coords=False)
        # coordinate agreement on the query axis at least
        assert out["qstart"][i] == oracle.qstart
        assert out["qend"][i] == oracle.qend


def test_local_soft_clip():
    # garbage prefix on the read: local mode must clip it
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, size=115).astype(np.int8)
    q = np.concatenate([(ref[8:28] + 1) % 4, ref[28:108]]).astype(np.int8)
    out = _run_banded([q], [ref], LOCAL_SCORING)
    oracle = align_oracle(q, ref, LOCAL_SCORING)
    _assert_matches_oracle(out, 0, oracle)
    assert out["qstart"][0] == 20


def test_glocal_sentinel_window_edges():
    # read hangs over the end of the window: sentinels score as mismatch
    q = encode_seq("ACGTACGTAC")
    ref = encode_seq("ACGTACGT")  # shorter than read
    out = _run_banded([q], [ref], GLOBAL_SCORING, L=10)
    # 8 matches, 2 overhang mismatches = -12
    assert out["score"][0] == -12.0


def test_variable_read_lengths():
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, size=100 + BAND - 1).astype(np.int8)
    queries = [ref[BAND // 2: BAND // 2 + n].copy() for n in (40, 70, 100)]
    out = _run_banded(queries, [ref] * 3, GLOBAL_SCORING, L=100)
    for i, n in enumerate((40, 70, 100)):
        assert out["score"][i] == 0.0  # perfect end-to-end
        assert out["qend"][i] == n
        assert out["matches"][i] == n


def test_batch_of_mixed_cases_glocal_vs_oracle():
    rng = np.random.default_rng(99)
    queries, refs = [], []
    for t in range(32):
        ref = rng.integers(0, 4, size=100 + BAND - 1).astype(np.int8)
        q = _mutate(rng, ref[BAND // 2: BAND // 2 + 100], n_subs=rng.integers(0, 8))
        queries.append(q)
        refs.append(ref)
    out = _run_banded(queries, refs, GLOBAL_SCORING, L=100)
    for i in range(32):
        oracle = align_oracle(queries[i], refs[i], GLOBAL_SCORING)
        _assert_matches_oracle(out, i, oracle)
