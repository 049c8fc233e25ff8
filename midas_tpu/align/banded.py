"""Banded affine-gap alignment, vectorized over (read, candidate) pairs.

This is the TPU-native replacement for the seed-extension inner loops of
bowtie2 and hs-blastn (reference hot loops: SURVEY.md §3.1-3.3). The DP
runs in diagonal-offset coordinates: for query row i, band offset
d ∈ [0, D) addresses reference position winstart + i + d, so the
diagonal predecessor keeps the same offset, the insertion predecessor is
offset d+1 in the previous row, and deletions become an intra-row
prefix-max scan (exact closed form of Gotoh's E recurrence — no lazy-F
iteration needed):

    D[d] = max_{d'<d} ( H_noD[d'] - gap_open - (d-d')*gap_extend )

which is a Kogge-Stone max-scan over A[d'] = H_noD[d'] + d'*gap_extend.

Alignment statistics (matches, mismatches, gap columns, gap opens,
start coordinates) are propagated along the argmax path instead of via
traceback, so every candidate's %id / NM / coverage — everything the
reference's filters consume (species.py:64-85, genes.py:153-169) —
comes out of the single forward pass.

Tie-break priority matches align/oracle.py: diagonal > deletion >
insertion; earliest row, then smallest offset, for equal best cells.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from midas_tpu.align.params import ScoringParams

NEG = -1e9

# Stat planes carried per DP state, in fixed order.
#   m: matches, x: mismatches, gc: gap columns, go: gap opens,
#   qs: query start row, ws: window start column
N_STATS = 6


def _shift_d(x: jnp.ndarray, shift: int, fill: float) -> jnp.ndarray:
    """Shift along the last (band) axis; positive shift moves data toward
    lower d (x_out[d] = x[d + shift])."""
    if shift == 0:
        return x
    if shift > 0:
        pad = jnp.full(x.shape[:-1] + (shift,), fill, x.dtype)
        return jnp.concatenate([x[..., shift:], pad], axis=-1)
    pad = jnp.full(x.shape[:-1] + (-shift,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :shift]], axis=-1)


def _select(cond, a_stats, b_stats):
    return tuple(jnp.where(cond, a, b) for a, b in zip(a_stats, b_stats))


@functools.partial(jax.jit, static_argnames=("params", "band_width"))
def banded_align(
    query: jnp.ndarray,    # [P, L] int8 codes (4 = pad/sentinel)
    qlens: jnp.ndarray,    # [P] int32
    ref_win: jnp.ndarray,  # [P, W] int8 codes, W = L + band_width - 1
    params: ScoringParams,
    band_width: int = 16,
) -> Dict[str, jnp.ndarray]:
    """Align each query against its reference window inside a band.

    Returns per-pair arrays: score, qstart, qend, wstart, wend (window
    coords), matches, mismatches, gap_cols, gap_opens. For pairs where
    no alignment exists (local mode, all-negative), score stays <= 0.
    """
    P, L = query.shape
    D = band_width
    assert ref_win.shape == (P, L + D - 1), (query.shape, ref_win.shape)
    local = params.mode == "local"
    ma, mi = float(params.match), float(params.mismatch)
    go_c, ge = float(params.gap_open), float(params.gap_extend)

    d_idx = jnp.arange(D, dtype=jnp.float32)[None, :]  # [1, D]

    zero_stats = tuple(jnp.zeros((P, D), jnp.float32) for _ in range(N_STATS))

    def fresh_stats(i):
        """Stats of a path that will start with a diagonal move at row i,
        offset d: first column consumes q[i] and window col i+d."""
        qs = jnp.full((P, D), i, jnp.float32)
        ws = jnp.float32(i) + jnp.broadcast_to(d_idx, (P, D))
        z = jnp.zeros((P, D), jnp.float32)
        return (z, z, z, z, qs, ws)

    init = dict(
        H=jnp.zeros((P, D), jnp.float32),
        H_fresh=jnp.ones((P, D), jnp.bool_),
        H_stats=zero_stats,
        I=jnp.full((P, D), NEG, jnp.float32),
        I_stats=zero_stats,
        best=jnp.full((P,), NEG, jnp.float32),
        best_i=jnp.zeros((P,), jnp.float32),
        best_d=jnp.zeros((P,), jnp.float32),
        best_stats=tuple(jnp.zeros((P,), jnp.float32) for _ in range(N_STATS)),
    )

    qlens_f = qlens.astype(jnp.float32)

    def step(state, i):
        q_i = jax.lax.dynamic_slice_in_dim(query, i, 1, axis=1)  # [P,1]
        r_i = jax.lax.dynamic_slice_in_dim(ref_win, i, D, axis=1)  # [P,D]
        is_match = (q_i == r_i) & (q_i < 4) & (r_i < 4)
        sub = jnp.where(is_match, ma, mi)

        Hp, Hp_fresh, Hp_stats = state["H"], state["H_fresh"], state["H_stats"]
        Ip, Ip_stats = state["I"], state["I_stats"]

        # Paths starting at this cell begin from a fresh predecessor.
        fresh = fresh_stats(i)
        base_stats = _select(Hp_fresh, fresh, Hp_stats)

        # --- diagonal move -------------------------------------------------
        T1 = Hp + sub
        T1_m = base_stats[0] + is_match
        T1_x = base_stats[1] + (1.0 - is_match)
        T1_stats = (T1_m, T1_x) + base_stats[2:]

        # --- insertion (consumes query; predecessor offset d+1, prev row) --
        Hp_shift = _shift_d(Hp, 1, NEG)
        Hp_fresh_shift = _shift_d(Hp_fresh.astype(jnp.float32), 1, 0.0) > 0.5
        Hp_stats_shift = tuple(_shift_d(s, 1, 0.0) for s in Hp_stats)
        # leading insertion from fresh: first target col will be i+1+d
        fresh_ins = (
            jnp.zeros((P, D), jnp.float32), jnp.zeros((P, D), jnp.float32),
            jnp.zeros((P, D), jnp.float32), jnp.zeros((P, D), jnp.float32),
            jnp.full((P, D), i, jnp.float32),
            jnp.float32(i + 1) + jnp.broadcast_to(d_idx, (P, D)),
        )
        open_base = _select(Hp_fresh_shift, fresh_ins, Hp_stats_shift)
        Ip_shift = _shift_d(Ip, 1, NEG)
        Ip_stats_shift = tuple(_shift_d(s, 1, 0.0) for s in Ip_stats)
        i_ext = Ip_shift - ge
        i_open = Hp_shift - go_c - ge
        take_ext = i_ext >= i_open
        I = jnp.where(take_ext, i_ext, i_open)
        I_stats = _select(take_ext, Ip_stats_shift, open_base)
        # both branches add one gap column; open adds one gap open
        I_stats = (
            I_stats[0], I_stats[1], I_stats[2] + 1.0,
            I_stats[3] + jnp.where(take_ext, 0.0, 1.0),
            I_stats[4], I_stats[5],
        )

        # --- pre-deletion best (scan input); diag wins ties over ins -------
        take_I = I > T1
        H_noD = jnp.where(take_I, I, T1)
        H_noD_stats = _select(take_I, I_stats, T1_stats)
        noD_fresh = jnp.zeros((P, D), jnp.bool_)
        if local:
            clamp = H_noD <= 0.0
            H_noD = jnp.where(clamp, 0.0, H_noD)
            H_noD_stats = _select(clamp, zero_stats, H_noD_stats)
            noD_fresh = clamp

        # --- deletion via exclusive prefix-max scan over the band ----------
        A = H_noD + d_idx * ge
        # fresh cells must not seed deletions (a deletion from nothing is
        # just a later start); mask them out of the scan
        A = jnp.where(noD_fresh, NEG, A)
        payload = H_noD_stats + (jnp.broadcast_to(d_idx, (P, D)),)
        shift = 1
        # inclusive Kogge-Stone max-scan with payload
        incl_A, incl_p = A, payload
        while shift < D:
            sA = _shift_d(incl_A, -shift, NEG)
            sp = tuple(_shift_d(s, -shift, 0.0) for s in incl_p)
            take = sA > incl_A
            incl_p = _select(take, sp, incl_p)
            incl_A = jnp.where(take, sA, incl_A)
            shift *= 2
        excl_A = _shift_d(incl_A, -1, NEG)
        excl_p = tuple(_shift_d(s, -1, 0.0) for s in incl_p)
        D_val = excl_A - go_c - d_idx * ge
        d_origin = excl_p[N_STATS]
        gap_len = jnp.broadcast_to(d_idx, (P, D)) - d_origin
        D_stats = (
            excl_p[0], excl_p[1], excl_p[2] + gap_len, excl_p[3] + 1.0,
            excl_p[4], excl_p[5],
        )

        # --- final H: priority diag > del > ins ----------------------------
        H = T1
        H_stats = T1_stats
        take_D = D_val > H
        H_stats = _select(take_D, D_stats, H_stats)
        H = jnp.where(take_D, D_val, H)
        take_I2 = I > H
        H_stats = _select(take_I2, I_stats, H_stats)
        H = jnp.where(take_I2, I, H)
        H_fresh = jnp.zeros((P, D), jnp.bool_)
        if local:
            clamp = H <= 0.0
            H = jnp.where(clamp, 0.0, H)
            H_stats = _select(clamp, zero_stats, H_stats)
            H_fresh = clamp

        # --- track best ----------------------------------------------------
        if local:
            active = (jnp.float32(i) < qlens_f)[:, None]  # [P,1]
            H_masked = jnp.where(active, H, NEG)
            row_best_d = jnp.argmax(H_masked, axis=1)
            row_best = jnp.take_along_axis(H_masked, row_best_d[:, None], axis=1)[:, 0]
            improve = row_best > state["best"]
            best = jnp.where(improve, row_best, state["best"])
            best_i = jnp.where(improve, jnp.float32(i), state["best_i"])
            best_d = jnp.where(improve, row_best_d.astype(jnp.float32), state["best_d"])
            picked = tuple(
                jnp.take_along_axis(s, row_best_d[:, None], axis=1)[:, 0]
                for s in H_stats
            )
            best_stats = _select(improve, picked, state["best_stats"])
        else:
            at_end = jnp.float32(i) == (qlens_f - 1.0)
            row_best_d = jnp.argmax(H, axis=1)
            row_best = jnp.take_along_axis(H, row_best_d[:, None], axis=1)[:, 0]
            best = jnp.where(at_end, row_best, state["best"])
            best_i = jnp.where(at_end, jnp.float32(i), state["best_i"])
            best_d = jnp.where(at_end, row_best_d.astype(jnp.float32), state["best_d"])
            picked = tuple(
                jnp.take_along_axis(s, row_best_d[:, None], axis=1)[:, 0]
                for s in H_stats
            )
            best_stats = _select(at_end, picked, state["best_stats"])

        new_state = dict(
            H=H, H_fresh=H_fresh, H_stats=H_stats, I=I, I_stats=I_stats,
            best=best, best_i=best_i, best_d=best_d, best_stats=best_stats,
        )
        return new_state, None

    state, _ = jax.lax.scan(step, init, jnp.arange(L))

    m, x, gc, go_n, qs, ws = state["best_stats"]
    return dict(
        score=state["best"],
        qstart=qs.astype(jnp.int32),
        qend=(state["best_i"] + 1.0).astype(jnp.int32),
        wstart=ws.astype(jnp.int32),
        wend=(state["best_i"] + state["best_d"] + 1.0).astype(jnp.int32),
        matches=m.astype(jnp.int32),
        mismatches=x.astype(jnp.int32),
        gap_cols=gc.astype(jnp.int32),
        gap_opens=go_n.astype(jnp.int32),
    )
