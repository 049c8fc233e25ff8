"""Sparse pileup-counts readback (profile/sparse_counts.py): the
encode/decode round trip must be byte-identical to the dense readback
for every coverage regime — it feeds the .snps.gz golden contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from midas_tpu.profile.sparse_counts import counts_host_sparse


def _dense(counts_flat: np.ndarray, G: int) -> np.ndarray:
    out = counts_flat.copy()
    out[G] = 0   # dump slot zeroed, as the readback contract specifies
    return out


def _random_counts(G, n_reads, read_len, err, seed, depth_boost=1):
    rng = np.random.default_rng(seed)
    c = np.zeros((4, G + 1), np.int64)
    genome = rng.integers(0, 4, G)
    for _ in range(depth_boost):
        starts = rng.integers(0, max(G - read_len, 1), n_reads)
        for s in starts:
            seg = genome[s:s + read_len].copy()
            flip = rng.random(len(seg)) < err
            seg[flip] = rng.integers(0, 4, int(flip.sum()))
            np.add.at(c, (seg, np.arange(s, s + len(seg))), 1)
    c[0, G] = 12345   # dump junk that the readback must zero out
    return c.astype(np.int32).reshape(-1)


CASES = [
    # (G, n_reads, read_len, err, depth_boost) — sparse, dense, deep
    (50_000, 40, 100, 0.01, 1),       # ~8% coverage, sparse path
    (20_000, 600, 100, 0.05, 1),      # ~3x coverage, mixed purity
    (5_000, 2000, 100, 0.02, 8),      # deep (>255) forces int16 depth
    (3_000, 0, 100, 0.0, 1),          # empty
]


@pytest.mark.parametrize("G,n_reads,read_len,err,boost", CASES)
def test_round_trip_matches_dense(G, n_reads, read_len, err, boost):
    flat = _random_counts(G, n_reads, read_len, err, seed=G, depth_boost=boost)
    got = counts_host_sparse(jnp.asarray(flat), G)
    np.testing.assert_array_equal(got, _dense(flat, G))


def test_multi_piece_boundaries_exact():
    """Tiny piece windows force multi-piece transfers of every stream
    (covered, impure, runs) — the piece assembly must be exact across
    boundaries, including a short final piece."""
    G = 30_000
    flat = _random_counts(G, 120, 100, 0.1, seed=1)
    got = counts_host_sparse(jnp.asarray(flat), G,
                             pieces=(1 << 10, 1 << 6, 1 << 5))
    np.testing.assert_array_equal(got, _dense(flat, G))


def test_single_position_and_boundaries():
    """Runs touching position 0 and G-1, single-site coverage."""
    G = 1000
    c = np.zeros((4, G + 1), np.int32)
    c[2, 0] = 7          # run at the left edge
    c[1, G - 1] = 3      # run at the right edge
    c[0, 500] = 1
    c[3, 500] = 2        # impure site
    flat = c.reshape(-1)
    got = counts_host_sparse(jnp.asarray(flat), G)
    np.testing.assert_array_equal(got, _dense(flat, G))


def test_async_state_host(tmp_path):
    """snps_state_host(counts_async=True) returns a Future that
    resolves to the same counts as the sync path."""
    from midas_tpu.profile import device_steps as ds

    G, S = 4000, 2
    state = ds.snps_init(G, S, gap_cap=64, max_len=128)
    flat = _random_counts(G, 50, 100, 0.01, seed=3)
    state = ds.SnpsState(counts=jnp.asarray(flat),
                         aligned_reads=state.aligned_reads,
                         mapped_reads=state.mapped_reads,
                         gap_codes=state.gap_codes,
                         gap_quals=state.gap_quals,
                         gap_meta=state.gap_meta, gap_n=state.gap_n)
    sync = ds.snps_state_host(state)
    state2 = ds.SnpsState(counts=jnp.asarray(flat),
                          aligned_reads=state.aligned_reads,
                          mapped_reads=state.mapped_reads,
                          gap_codes=state.gap_codes,
                          gap_quals=state.gap_quals,
                          gap_meta=state.gap_meta, gap_n=state.gap_n)
    asyn = ds.snps_state_host(state2, counts_async=True)
    got = ds.resolve_counts(asyn["counts"])
    np.testing.assert_array_equal(got, sync["counts"])
