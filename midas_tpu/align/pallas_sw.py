"""Pallas TPU kernel for the banded affine-gap DP.

Same mathematics and tie-break semantics as align/banded.py (the jnp
reference implementation, itself tested exactly against the NumPy
oracle), laid out for the VPU:

- pairs on lanes: each grid step processes a tile of 128 (read,
  candidate) pairs; query and window tensors arrive pre-transposed as
  [L, P] / [W, P] so a tile is a [*, 128] block.
- band on sublanes: DP state is [D, 128] f32 (D = band width, a
  multiple of 8), so band shifts are sublane moves and the deletion
  prefix-max is a log2(D)-step Kogge-Stone over sublanes.
- alignment statistics ride as six [D, 128] planes (matches,
  mismatches, gap_cols, gap_opens, qstart, wstart) packed into one
  [6*D, 128] scratch buffer and selected along the argmax path.
- DP state lives in VMEM scratch refs, not fori-loop carries: shifting
  (concatenating) a carried-and-modified value crashes the Mosaic
  compiler ("Check failed: limits[i] <= dim(i)"), while loads from
  scratch break that pattern. State round-trips through VMEM each row,
  which the VPU absorbs.

The kernel emits one [16, 128] f32 tile per grid step:
row 0 score, 1 qend_row, 2 end_offset, 3 matches, 4 mismatches,
5 gap_cols, 6 gap_opens, 7 qstart, 8 wstart; rows 9-15 padding.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from midas_tpu.align.params import ScoringParams

NEG = -1e9
N_STATS = 6
LANES = 128
OUT_ROWS = 16


def _shift_up(x: jnp.ndarray, shift: int, fill: float) -> jnp.ndarray:
    """x_out[d, :] = x[d + shift, :] along the band (sublane) axis."""
    if shift == 0:
        return x
    pad = jnp.full((abs(shift), x.shape[1]), fill, x.dtype)
    if shift > 0:
        return jnp.concatenate([x[shift:, :], pad], axis=0)
    return jnp.concatenate([pad, x[:shift, :]], axis=0)


def _sel(cond, a_planes, b_planes):
    return tuple(jnp.where(cond, a, b) for a, b in zip(a_planes, b_planes))


def _shift_planes(planes, shift, fill=0.0):
    return tuple(_shift_up(p, shift, fill) for p in planes)


def _make_kernel(L: int, D: int, local: bool, ma: float, mi: float,
                 go_c: float, ge: float, n_stats: int = N_STATS,
                 qual_pen: bool = False, npen: float = 1.0):
    """n_stats=6: full statistics (matches, mismatches, gap_cols,
    gap_opens, qstart, wstart). n_stats=1: score-only mode carrying just
    the wstart plane — enough for best-hit selection, MAPQ, and the
    duplicate-alignment drop, at a fraction of the VMEM traffic (the
    two-pass path in align/pipeline.py runs this over every candidate
    and the full kernel only over each read's chosen candidate).

    qual_pen=True adds a 4th input: per-(query-row, lane) positive
    mismatch penalties (bowtie2 --mp quality scaling); read-N columns
    cost npen and ref code-4 columns cost -mi (ScoringParams
    docstring)."""
    score_only = n_stats == 1

    def kernel(q_ref, qlen_ref, ref_ref, *rest):
        if qual_pen:
            (qp_ref, out_ref, qf_ref, rf_ref, qpf_ref, H_ref, Hf_ref,
             Hst_ref, I_ref, Ist_ref, best_ref) = rest
        else:
            (out_ref, qf_ref, rf_ref, H_ref, Hf_ref, Hst_ref, I_ref,
             Ist_ref, best_ref) = rest
            qp_ref = qpf_ref = None
        d_col = jax.lax.broadcasted_iota(jnp.int32, (D, LANES), 0).astype(jnp.float32)
        qlens_f = qlen_ref[0:1, :].astype(jnp.float32)   # [1, 128]
        zero = jnp.zeros((D, LANES), jnp.float32)
        zrow = jnp.zeros((1, LANES), jnp.float32)
        # int8 blocks don't support dynamic single-row loads (sublane
        # tiling); widen once into f32 scratch and slice from there
        qf_ref[:, :] = q_ref[:, :].astype(jnp.float32)
        rf_ref[:, :] = ref_ref[:, :].astype(jnp.float32)
        if qual_pen:
            qpf_ref[:, :] = qp_ref[:, :].astype(jnp.float32)
        # init DP state
        H_ref[:, :] = zero
        Hf_ref[:, :] = zero + 1.0
        Hst_ref[:, :] = jnp.zeros((n_stats * D, LANES), jnp.float32)
        I_ref[:, :] = zero + NEG
        Ist_ref[:, :] = jnp.zeros((n_stats * D, LANES), jnp.float32)
        best_ref[:, :] = jnp.concatenate([
            jnp.full((1, LANES), NEG, jnp.float32),
            jnp.zeros((OUT_ROWS - 1, LANES), jnp.float32)])

        def ld_planes(ref):
            return tuple(ref[s * D:(s + 1) * D, :] for s in range(n_stats))

        def st_planes(ref, planes):
            for s in range(n_stats):
                ref[s * D:(s + 1) * D, :] = planes[s]

        def body(i, _):
            Hp = H_ref[:, :]
            Hp_fresh = Hf_ref[:, :]
            Hp_st = ld_planes(Hst_ref)
            Ip = I_ref[:, :]
            Ip_st = ld_planes(Ist_ref)

            fi = i.astype(jnp.float32)
            q_i = qf_ref[pl.ds(i, 1), :]                 # [1, 128] f32
            r_i = rf_ref[pl.ds(i, D), :]                 # [D, 128] f32
            is_match = ((q_i == r_i) & (q_i < 4.0) & (r_i < 4.0)
                        ).astype(jnp.float32)
            if qual_pen:
                qp_i = qpf_ref[pl.ds(i, 1), :]           # [1, 128] f32
                pen = jnp.where(q_i >= 4.0, npen,
                                jnp.where(r_i >= 4.0, -mi, qp_i))
                sub = jnp.where(is_match > 0, ma, -pen)
            else:
                sub = jnp.where(is_match > 0, ma, mi)

            # stats of a path starting with a diagonal move at row i
            if score_only:
                fresh_st = (fi + d_col,)
            else:
                fresh_st = (zero, zero, zero, zero, zero + fi, fi + d_col)
            base_st = _sel(Hp_fresh > 0, fresh_st, Hp_st)

            # diagonal
            T1 = Hp + sub
            if score_only:
                T1_st = base_st
            else:
                T1_st = (base_st[0] + is_match,
                         base_st[1] + (1.0 - is_match),
                         base_st[2], base_st[3], base_st[4], base_st[5])

            # insertion (consumes query), predecessor at offset d+1
            Hp_shift = _shift_up(Hp, 1, NEG)
            Hp_fresh_shift = _shift_up(Hp_fresh, 1, 0.0)
            Hp_st_shift = _shift_planes(Hp_st, 1)
            if score_only:
                fresh_ins = (fi + 1.0 + d_col,)
            else:
                fresh_ins = (zero, zero, zero, zero, zero + fi,
                             fi + 1.0 + d_col)
            open_st = _sel(Hp_fresh_shift > 0, fresh_ins, Hp_st_shift)
            Ip_shift = _shift_up(Ip, 1, NEG)
            Ip_st_shift = _shift_planes(Ip_st, 1)
            i_ext = Ip_shift - ge
            i_open = Hp_shift - go_c - ge
            take_ext = i_ext >= i_open
            I = jnp.where(take_ext, i_ext, i_open)
            I_st = _sel(take_ext, Ip_st_shift, open_st)
            if not score_only:
                I_st = (I_st[0], I_st[1], I_st[2] + 1.0,
                        I_st[3] + jnp.where(take_ext, 0.0, 1.0),
                        I_st[4], I_st[5])

            # pre-deletion best; diag beats ins on ties
            take_I = I > T1
            H_noD = jnp.where(take_I, I, T1)
            H_noD_st = _sel(take_I, I_st, T1_st)
            if local:
                clamp = H_noD <= 0.0
                H_noD = jnp.where(clamp, 0.0, H_noD)
                H_noD_st = _sel(clamp, (zero,) * n_stats, H_noD_st)
                A = jnp.where(clamp, NEG, H_noD + d_col * ge)
            else:
                A = H_noD + d_col * ge

            # deletion: exclusive Kogge-Stone prefix max with payload.
            # Score-only mode drops the gap-origin (d_col) payload plane
            # — it only feeds gap_len in the full-stats mode — saving
            # one plane of shifts+selects per Kogge-Stone step (~13% of
            # the score-only row work).
            pay = H_noD_st if score_only else H_noD_st + (d_col,)
            shift = 1
            while shift < D:
                sA = _shift_up(A, -shift, NEG)
                sp = _shift_planes(pay, -shift)
                take = sA > A
                pay = _sel(take, sp, pay)
                A = jnp.where(take, sA, A)
                shift *= 2
            excl_A = _shift_up(A, -1, NEG)
            excl_p = _shift_planes(pay, -1)
            D_val = excl_A - go_c - d_col * ge
            if score_only:
                D_st = (excl_p[0],)
            else:
                gap_len = d_col - excl_p[n_stats]
                D_st = (excl_p[0], excl_p[1], excl_p[2] + gap_len,
                        excl_p[3] + 1.0, excl_p[4], excl_p[5])

            # final H with priority diag > del > ins
            take_D = D_val > T1
            H = jnp.where(take_D, D_val, T1)
            H_st = _sel(take_D, D_st, T1_st)
            take_I2 = I > H
            H = jnp.where(take_I2, I, H)
            H_st = _sel(take_I2, I_st, H_st)
            if local:
                clamp = H <= 0.0
                H = jnp.where(clamp, 0.0, H)
                H_st = _sel(clamp, (zero,) * n_stats, H_st)
                H_fresh = clamp.astype(jnp.float32)
            else:
                H_fresh = zero

            # best tracking: first-occurrence one-hot of the row max
            if local:
                H_masked = jnp.where(fi < qlens_f, H, NEG)
            else:
                H_masked = H
            row_best = jnp.max(H_masked, axis=0, keepdims=True)   # [1,128]
            is_best = (H_masked == row_best).astype(jnp.float32)
            pre = is_best
            s2 = 1
            while s2 < D:
                pre = jnp.maximum(pre, _shift_up(pre, -s2, 0.0))
                s2 *= 2
            first = is_best * (1.0 - _shift_up(pre, -1, 0.0))
            row_best_d = jnp.sum(d_col * first, axis=0, keepdims=True)
            picked = tuple(jnp.sum(p * first, axis=0, keepdims=True)
                           for p in H_st)                         # 6x [1,128]
            if local:
                improve = row_best > best_ref[0:1, :]
            else:
                improve = fi == (qlens_f - 1.0)
            best_ref[0:1, :] = jnp.where(improve, row_best, best_ref[0:1, :])
            best_ref[1:2, :] = jnp.where(improve, zrow + fi, best_ref[1:2, :])
            best_ref[2:3, :] = jnp.where(improve, row_best_d, best_ref[2:3, :])
            for s in range(n_stats):
                best_ref[3 + s: 4 + s, :] = jnp.where(
                    improve, picked[s], best_ref[3 + s: 4 + s, :])

            # store new state
            H_ref[:, :] = H
            Hf_ref[:, :] = H_fresh
            st_planes(Hst_ref, H_st)
            I_ref[:, :] = I
            st_planes(Ist_ref, I_st)
            return 0

        # rows beyond the tile's longest read never change any lane's
        # best (local masks fi < qlen; glocal records at fi == qlen-1),
        # so the row loop stops at max(qlen): 100 bp reads in a 128
        # bucket skip 22% of the DP
        lmax = jnp.max(qlen_ref[0:1, :])
        jax.lax.fori_loop(0, jnp.minimum(lmax, L), body, 0)
        out_ref[:, :] = best_ref[:, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "band_width", "interpret",
                              "score_only"))
def pallas_banded_align(
    query: jnp.ndarray,    # [P, L] int8
    qlens: jnp.ndarray,    # [P] int32
    ref_win: jnp.ndarray,  # [P, W] int8, W = L + band_width - 1
    params: ScoringParams,
    band_width: int = 16,
    interpret: bool = False,
    score_only: bool = False,
    qpen: jnp.ndarray = None,   # [P, L] int8 positive mismatch penalties
) -> Dict[str, jnp.ndarray]:
    """Drop-in replacement for banded.banded_align running as a Pallas
    TPU kernel. P must be a multiple of 128 (callers pad)."""
    P, L = query.shape
    D = band_width
    W = L + D - 1
    assert P % LANES == 0, f"P={P} must be a multiple of {LANES}"
    assert D % 8 == 0, f"band_width={D} must be a multiple of 8"
    assert ref_win.shape == (P, W)

    qT = query.T                     # [L, P]
    rT = ref_win.T                   # [W, P]
    # 8 sublane rows: a (1, 128) int32 block is below the minimum tile
    ql2 = jnp.broadcast_to(qlens.astype(jnp.int32)[None, :], (8, P))

    qual_pen = qpen is not None
    n_stats = 1 if score_only else N_STATS
    kernel = _make_kernel(
        L, D, params.mode == "local", float(params.match),
        float(params.mismatch), float(params.gap_open),
        float(params.gap_extend), n_stats=n_stats,
        qual_pen=qual_pen, npen=float(params.n_pen))

    in_specs = [
        pl.BlockSpec((L, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((W, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    inputs = [qT, ql2, rT]
    scratch = [
        pltpu.VMEM((L, LANES), jnp.float32),            # qf
        pltpu.VMEM((W, LANES), jnp.float32),            # rf
    ]
    if qual_pen:
        in_specs.append(pl.BlockSpec((L, LANES), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(qpen.T)
        scratch.append(pltpu.VMEM((L, LANES), jnp.float32))   # qpf
    scratch += [
        pltpu.VMEM((D, LANES), jnp.float32),            # H
        pltpu.VMEM((D, LANES), jnp.float32),            # H_fresh
        pltpu.VMEM((n_stats * D, LANES), jnp.float32),  # H stats
        pltpu.VMEM((D, LANES), jnp.float32),            # I
        pltpu.VMEM((n_stats * D, LANES), jnp.float32),  # I stats
        pltpu.VMEM((OUT_ROWS, LANES), jnp.float32),     # best rows
    ]

    out = pl.pallas_call(
        kernel,
        grid=(P // LANES,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((OUT_ROWS, LANES), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, P), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)

    if score_only:
        # score-mode stat plane order: (wstart,) at out row 3
        return dict(
            score=out[0],
            qend=(out[1] + 1.0).astype(jnp.int32),
            wstart=out[3].astype(jnp.int32),
            wend=(out[1] + out[2] + 1.0).astype(jnp.int32),
        )
    return dict(
        score=out[0],
        qstart=out[7].astype(jnp.int32),
        qend=(out[1] + 1.0).astype(jnp.int32),
        wstart=out[8].astype(jnp.int32),
        wend=(out[1] + out[2] + 1.0).astype(jnp.int32),
        matches=out[3].astype(jnp.int32),
        mismatches=out[4].astype(jnp.int32),
        gap_cols=out[5].astype(jnp.int32),
        gap_opens=out[6].astype(jnp.int32),
    )
