"""Distributed sharding: the dp x tp profiling step on the virtual
8-device CPU mesh must agree with single-chip semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midas_tpu.align.params import GLOBAL_SCORING
from midas_tpu.align.seed import SeedParams
from midas_tpu.db.refpack import build_pack
from midas_tpu.dist.sharded import (
    distributed_profile_step, make_mesh, shard_index)


@pytest.fixture(scope="module")
def synthetic():
    rng = np.random.default_rng(3)
    seqs = [(f"ctg{s}", "".join("ACGT"[b] for b in rng.integers(0, 4, 1500)))
            for s in range(6)]
    pack = build_pack(seqs)
    B, L = 32, 128
    codes = np.full((B, L), 4, dtype=np.int8)
    qlens = np.full(B, 100, dtype=np.int32)
    origin = np.zeros(B, dtype=np.int32)
    for i in range(B):
        s = i % len(seqs)
        origin[i] = s
        pos = int(rng.integers(0, 1400))
        frag = seqs[s][1][pos: pos + 100]
        codes[i, :100] = np.frombuffer(
            frag.translate(str.maketrans("ACGT", "\x00\x01\x02\x03"))
            .encode("latin1"), dtype=np.int8)
    return pack, codes, qlens, origin


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_distributed_counts_match_truth(synthetic, dp, tp):
    if dp * tp > len(jax.devices()):
        pytest.skip("not enough devices")
    pack, codes, qlens, origin = synthetic
    mesh = make_mesh(dp * tp, tp=tp)
    k = 12
    sp = SeedParams(k=k, num_cands=2, max_hits=8, band_width=16)
    shard_codes, index_arrays, offsets, shard_base, seq_base = shard_index(
        pack, tp=tp, k=k)
    out = distributed_profile_step(
        mesh, jnp.asarray(codes), jnp.asarray(qlens),
        jnp.asarray(shard_codes),
        {k2: jnp.asarray(v) for k2, v in index_arrays.items()},
        jnp.asarray(offsets), jnp.asarray(seq_base),
        GLOBAL_SCORING, sp, 128, pack.num_seqs)
    counts = np.asarray(out["counts"])
    # error-free reads: every read maps to its origin contig
    expected = np.bincount(origin, minlength=pack.num_seqs)
    assert int(out["aligned_reads"]) == len(origin)
    np.testing.assert_array_equal(counts.astype(int), expected)
    # aligned bp: 100 per read
    assert np.asarray(out["bp"]).sum() == 100 * len(origin)


def test_tp_shardings_agree(synthetic):
    """tp=1 and tp=2 must produce identical merged counts."""
    pack, codes, qlens, origin = synthetic
    results = []
    for tp in (1, 2):
        mesh = make_mesh(8, tp=tp)
        sp = SeedParams(k=12, num_cands=2, max_hits=8, band_width=16)
        shard_codes, index_arrays, offsets, shard_base, seq_base = shard_index(
            pack, tp=tp, k=12)
        out = distributed_profile_step(
            mesh, jnp.asarray(codes), jnp.asarray(qlens),
            jnp.asarray(shard_codes),
            {k2: jnp.asarray(v) for k2, v in index_arrays.items()},
            jnp.asarray(offsets), jnp.asarray(seq_base),
            GLOBAL_SCORING, sp, 128, pack.num_seqs)
        results.append(np.asarray(out["counts"]))
    np.testing.assert_array_equal(results[0], results[1])
