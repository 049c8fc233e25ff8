"""Pallas banded-DP kernel vs the jnp reference implementation.

On CPU CI the kernel runs in interpret mode (small shapes); on a real
TPU the same test exercises the compiled kernel. Outputs must be
bit-identical to banded_align, which is itself oracle-exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midas_tpu.align.banded import banded_align
from midas_tpu.align.params import GLOBAL_SCORING, LOCAL_SCORING, MARKER_SCORING
from midas_tpu.align.pallas_sw import pallas_banded_align

INTERPRET = jax.default_backend() == "cpu"


def _case(seed, P=128, L=64, D=16, n_subs=3, indel=False):
    rng = np.random.default_rng(seed)
    W = L + D - 1
    ref = rng.integers(0, 4, size=(P, W)).astype(np.int8)
    q = np.full((P, L), 4, dtype=np.int8)
    qlens = np.zeros(P, dtype=np.int32)
    for i in range(P):
        n = [L - 20, L - 10, L][i % 3]
        frag = ref[i, D // 2: D // 2 + n].copy()
        k = i % (n_subs + 1)
        if k:
            pos = rng.choice(n, k, replace=False)
            frag[pos] = (frag[pos] + 1) % 4
        if indel and i % 5 == 0:
            frag = np.delete(frag, 12)
        q[i, : len(frag)] = frag
        qlens[i] = len(frag)
    return q, qlens, ref


@pytest.mark.parametrize("params", [GLOBAL_SCORING, MARKER_SCORING, LOCAL_SCORING])
def test_pallas_matches_jnp(params):
    q, qlens, ref = _case(0, indel=True)
    a = banded_align(jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(ref),
                     params, band_width=16)
    b = pallas_banded_align(jnp.asarray(q), jnp.asarray(qlens),
                            jnp.asarray(ref), params, band_width=16,
                            interpret=INTERPRET)
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_pallas_padding_path():
    """dispatch_banded_align pads non-multiple-of-128 pair counts."""
    from midas_tpu.align.pipeline import dispatch_banded_align
    import os
    q, qlens, ref = _case(1, P=100)
    if jax.default_backend() == "cpu":
        pytest.skip("dispatch uses jnp path on cpu")
    out = dispatch_banded_align(jnp.asarray(q), jnp.asarray(qlens),
                                jnp.asarray(ref), GLOBAL_SCORING, 16)
    assert out["score"].shape == (100,)


@pytest.mark.parametrize("params", [GLOBAL_SCORING, MARKER_SCORING,
                                    LOCAL_SCORING])
def test_score_only_mode_matches_full(params):
    """The score-only kernel (1 stat plane) must agree with the full
    kernel on score/qend/wstart/wend for every pair — pass 1 of the
    two-pass alignment depends on it."""
    q, qlens, ref = _case(11, indel=True)
    full = jax.jit(
        lambda a, b, c: pallas_banded_align(
            a, b, c, params=params, interpret=INTERPRET))(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(ref))
    fast = jax.jit(
        lambda a, b, c: pallas_banded_align(
            a, b, c, params=params, interpret=INTERPRET, score_only=True))(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(ref))
    assert set(fast) == {"score", "qend", "wstart", "wend"}
    for k in fast:
        np.testing.assert_array_equal(np.asarray(fast[k]),
                                      np.asarray(full[k]), err_msg=k)
