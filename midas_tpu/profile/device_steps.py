"""Device-resident profiling steps: zero per-batch host readback.

The reference's dataflow is files + pipes between every stage
(midas/run/species.py:29-49, genes.py:116-203, snps.py:97-216). The
first TPU port of that shape still pulled a [B, C] x 13 alignment
result to the host every batch — and on a tunneled TPU the D2H path
(~5 ms/RPC, ~10 MB/s) is 3 orders of magnitude slower than the device
chain (measured: 0.11 ms compute vs >100 ms readback per 2048-read
batch). So the profilers below never read alignments back at all:

- each `update` is ONE jit (seed -> banded DP -> best-hit -> filter ->
  segment reduction) whose carried state lives on device and is
  donated, so accumulators update in place;
- reads that genuinely need host math (ambiguous marker hits that go
  through the reference's RNG assignment, species.py:104-119; gapped
  reads whose pileup column map needs a traceback, snps.py pileup) are
  spilled into fixed-capacity device buffers and pulled ONCE at the
  end of the stream;
- the only per-batch host work is FASTQ parsing.

Filter semantics are identical to the host reference implementations
in profile/common.py (themselves mirroring midas/run/genes.py:153-169
and snps.py:141-162) — tests assert equality on simulated data.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from midas_tpu.align.params import ScoringParams
from midas_tpu.align.pipeline import (_align_batch_stages,
                                      align_candidates_score,
                                      align_chosen_full)
from midas_tpu.align.seed import SeedParams, revcomp_batch, reverse_batch

NEG_INF = -1e30


def _pick(arr: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """arr [B, C], col [B] -> arr[i, col[i]]  [B]."""
    return jnp.take_along_axis(arr, col[:, None], axis=1)[:, 0]


def score_min_device(scoring: ScoringParams, qlens: jnp.ndarray) -> jnp.ndarray:
    """Vectorized ScoringParams.score_min (bowtie2-style defaults)."""
    ql = jnp.maximum(qlens.astype(jnp.float32), 1.0)
    if scoring.mode == "glocal":
        return -0.6 - 0.6 * ql
    return 20.0 + 8.0 * jnp.log(ql)


def _mapq_threshold(frac: float, diff: jnp.ndarray) -> jnp.ndarray:
    """Smallest integer x with x >= f32(frac) * diff, computed EXACTLY
    in int32: f32(frac) = m / 2^27 for every band fraction (>= 0.0625,
    so its f32 value has granularity 2^-27 or coarser), and
    ceil(m*diff / 2^27) is evaluated with a split multiply so nothing
    overflows int32 (diff <= ~2^13 for any plausible read length).
    This reproduces bowtie2's `intScore >= diff * (double)0.Xf`
    comparisons bit-for-bit — f32 products round the wrong way at
    exact band boundaries (e.g. 0.6f*60 rounds to 36.0, admitting a
    bestOver of 36 that bowtie2's double threshold 36.0000014 rejects)."""
    import numpy as np

    m = int(round(float(np.float32(frac)) * (1 << 27)))
    assert m == float(np.float32(frac)) * (1 << 27), frac
    m_hi, m_lo = m >> 14, m & ((1 << 14) - 1)
    a = m_hi * diff
    b = m_lo * diff
    return (a + ((b + (1 << 27) - 1) >> 14)) >> 13


def mapq_device(
    best: jnp.ndarray, second: jnp.ndarray, smin: jnp.ndarray,
    sperf: jnp.ndarray, has_second: jnp.ndarray, local: bool = False,
) -> jnp.ndarray:
    """Vectorized params.mapq_from_scores — bowtie2 MapqV2 (mapq.h),
    both trees, with bowtie2's integer-score arithmetic: scMin truncates
    toward zero, diff/bestOver/bestdiff are integers, and band
    thresholds are the f32-cast fractions times diff evaluated exactly
    (_mapq_threshold). The where-ladders are BUILT from the same table
    constants the host twin walks, so the two cannot drift."""
    from midas_tpu.align import params as ap

    smin_i = jnp.trunc(smin).astype(jnp.int32)
    sperf_i = jnp.round(sperf).astype(jnp.int32)
    diff = jnp.maximum(sperf_i - smin_i, 1)
    best_i = jnp.round(best).astype(jnp.int32)
    bo = best_i - smin_i
    valid2 = has_second & (second >= smin_i.astype(jnp.float32))
    sec_i = jnp.round(jnp.where(valid2, second, 0.0)).astype(jnp.int32)

    uniq_table = ap._MAPQ_UNIQ_LOCAL if local else ap._MAPQ_UNIQ_E2E
    floor = (ap._MAPQ_UNIQ_LOCAL_FLOOR if local else ap._MAPQ_UNIQ_E2E_FLOOR)
    single = jnp.full(bo.shape, floor, jnp.int32)
    for frac, q in reversed(uniq_table):
        single = jnp.where(bo >= _mapq_threshold(frac, diff), q, single)

    bestdiff = jnp.abs(jnp.abs(best_i) - jnp.abs(sec_i))
    perfect = bo == diff
    ov84 = bo >= _mapq_threshold(0.84, diff)
    ov68 = bo >= _mapq_threshold(0.68, diff)
    hi = bo >= _mapq_threshold(0.67, diff)
    rows = ap._MAPQ_TIE_LOCAL if local else ap._MAPQ_TIE_E2E
    tail = ap._MAPQ_TIE_LOCAL_TAIL if local else ap._MAPQ_TIE_E2E_TAIL
    tie = jnp.where(bestdiff > 0,
                    jnp.where(hi, tail[0][0], tail[0][1]),
                    jnp.where(hi, tail[1][0], tail[1][1])).astype(jnp.int32)
    for frac, q_perfect, q84, q68, q_else in reversed(rows):
        band = jnp.where(perfect, q_perfect,
                         jnp.where(ov84, q84, jnp.where(ov68, q68, q_else)))
        tie = jnp.where(bestdiff >= _mapq_threshold(frac, diff), band, tie)

    q = jnp.where(valid2, tie, single)
    return jnp.where(best_i < smin_i, 0, q).astype(jnp.int32)


def canonical_best_col(out: Dict[str, jnp.ndarray],
                       scores: jnp.ndarray) -> jnp.ndarray:
    """Deterministic multimapper arbitration: among the equal-best-score
    candidates pick the smallest (seq_idx, tstart, strand) — a GLOBAL
    order, so single-chip and tp-sharded candidate tables resolve ties
    identically (bowtie2's own arbitration is pseudorandom; determinism
    here is a strict improvement, cf. the reference's unseeded RNG at
    midas/run/species.py:113-117). Candidates with identical
    (seq, tstart, strand) are duplicates and were already dropped, so
    exactly one column survives the three filters."""
    BIG = jnp.int32(2**31 - 1)
    best = jnp.max(scores, axis=1)
    isb = out["valid"] & (scores == best[:, None]) & (scores > NEG_INF / 2)
    for key in ("seq_idx", "tstart", "strand"):
        v = jnp.where(isb, out[key].astype(jnp.int32), BIG)
        isb = isb & (v == jnp.min(v, axis=1)[:, None])
    return jnp.argmax(isb, axis=1).astype(jnp.int32)


def best_hit_device(
    out: Dict[str, jnp.ndarray], qlens: jnp.ndarray, scoring: ScoringParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device twin of profile.common.pick_best_hits.

    Returns (aligned [B] bool, best_col [B] i32, mapq [B] i32)."""
    scores = jnp.where(out["valid"], out["score"], NEG_INF)
    best_col = canonical_best_col(out, scores)
    best = _pick(scores, best_col)
    masked = scores.at[jnp.arange(scores.shape[0]), best_col].set(NEG_INF)
    second = jnp.max(masked, axis=1)
    has_second = second > NEG_INF / 2
    # bowtie2's scMin is the score-min function value CAST to the
    # integer score type (truncation toward zero): local 20+8ln(L)=56.8
    # admits an integer score of 56
    smin = jnp.trunc(score_min_device(scoring, qlens))
    sperf = scoring.match * jnp.maximum(qlens.astype(jnp.float32), 1.0)
    aligned = (best > NEG_INF / 2) & (best >= smin)
    mapq = mapq_device(best, jnp.where(has_second, second, NEG_INF),
                       smin, sperf, has_second,
                       local=scoring.mode == "local")
    return aligned, best_col, mapq


def paired_best_hit_device(
    out: Dict[str, jnp.ndarray], qlens: jnp.ndarray, scoring: ScoringParams,
    maxins: int = 500,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mate-pair-aware best-hit selection (bowtie2 pairing semantics,
    which the reference relies on at midas/run/genes.py:127-132 and
    snps.py:109-114): rows 2i/2i+1 are mates of pair i.

    Concordant candidate pairs — same target sequence, opposite
    strands, forward-strand mate leftmost (fr orientation), fragment
    span <= maxins (bowtie2 --maxins default 500) — are scored as
    score1+score2; the best concordant pair fixes BOTH mates' columns
    and both mates get a pair-level MAPQ (best vs second-best pair,
    bowtie2 computes paired MAPQ from pair scores). Pairs with no
    concordant combination fall back to independent per-mate best hits
    (bowtie2's default mixed mode).

    Known divergence from bowtie2 (documented AND measured): when a
    concordant pair exists, it always wins here, even if one mate's
    best UNPAIRED alignment elsewhere scores far higher — bowtie2
    weighs concordant pairs against the mates' unpaired alignments
    with an unpaired penalty. Quantified on an engineered
    structural-variant library (tests/test_round5_fixes.py::
    test_discordant_pair_divergence_quantified: mate 2 swapped to the
    homologous locus of a 3%-divergent related genome in 7% of pairs):
    59% of the chimeric mates (13/22, i.e. ~2% of all mates at that
    chimera rate) are placed at the concordant locus where per-mate
    best-hit picks the distant one; clean pairs are entirely
    unaffected (pairing only ADDS mapped mates — +16% on that fixture
    — by lifting multimapper MAPQ over the >=20 gate). On libraries
    without structural variation the two policies pick the same pair.

    Returns (aligned [B], best_col [B], mapq [B]) — same contract as
    best_hit_device, so every downstream filter is unchanged."""
    B, C = out["score"].shape
    Pn = B // 2
    scores = jnp.where(out["valid"], out["score"], NEG_INF)
    s1, s2 = scores[0::2], scores[1::2]                       # [P, C]
    seq1, seq2 = out["seq_idx"][0::2], out["seq_idx"][1::2]
    st1, st2 = out["strand"][0::2], out["strand"][1::2]
    t1s, t2s = out["tstart"][0::2], out["tstart"][1::2]
    t1e, t2e = out["tend"][0::2], out["tend"][1::2]

    same_seq = seq1[:, :, None] == seq2[:, None, :]           # [P, C, C]
    opposite = st1[:, :, None] != st2[:, None, :]
    lo = jnp.minimum(t1s[:, :, None], t2s[:, None, :])
    hi = jnp.maximum(t1e[:, :, None], t2e[:, None, :])
    frag = hi - lo
    # fr orientation: the forward-strand mate starts no later than the
    # reverse-strand mate
    fw_start = jnp.where(st1[:, :, None] == 0, t1s[:, :, None], t2s[:, None, :])
    rc_start = jnp.where(st1[:, :, None] == 0, t2s[:, None, :], t1s[:, :, None])
    ql1, ql2 = qlens[0::2], qlens[1::2]
    smin1 = jnp.trunc(score_min_device(scoring, ql1))  # bowtie2 int scMin
    smin2 = jnp.trunc(score_min_device(scoring, ql2))
    both_valid = ((s1 >= smin1[:, None])[:, :, None]
                  & (s2 >= smin2[:, None])[:, None, :])
    conc = (same_seq & opposite & (frag <= maxins) & (fw_start <= rc_start)
            & both_valid)
    pair_sc = jnp.where(conc, s1[:, :, None] + s2[:, None, :], NEG_INF)

    flat = pair_sc.reshape(Pn, C * C)
    # canonical pair arbitration (see canonical_best_col): among
    # equal-best concordant pairs pick the smallest (seq, t1start,
    # t2start, strand1) so tie resolution is pool-order independent.
    # The strand plane closes the degenerate case of two equal-score
    # pairings with identical coordinates and swapped mate strands,
    # which would otherwise fall back to pool-order argmax (a hole in
    # the tp>1 bit-equality guarantee).
    BIG = jnp.int32(2**31 - 1)
    pair_best0 = jnp.max(flat, axis=1)
    isb = (flat == pair_best0[:, None]) & (flat > NEG_INF / 2)
    for plane in (jnp.broadcast_to(seq1[:, :, None], (Pn, C, C)),
                  jnp.broadcast_to(t1s[:, :, None], (Pn, C, C)),
                  jnp.broadcast_to(t2s[:, None, :], (Pn, C, C)),
                  jnp.broadcast_to(st1[:, :, None], (Pn, C, C))):
        v = jnp.where(isb, plane.reshape(Pn, C * C).astype(jnp.int32), BIG)
        isb = isb & (v == jnp.min(v, axis=1)[:, None])
    best_flat = jnp.argmax(isb, axis=1).astype(jnp.int32)
    pair_best = jnp.take_along_axis(flat, best_flat[:, None], axis=1)[:, 0]
    masked = flat.at[jnp.arange(Pn), best_flat].set(NEG_INF)
    pair_second = jnp.max(masked, axis=1)
    has_pair = pair_best > NEG_INF / 2
    c1 = best_flat // C
    c2 = best_flat % C

    # pair MAPQ from pair scores against pair-level score bounds
    smin_pair = smin1 + smin2
    sperf_pair = scoring.match * jnp.maximum(
        (ql1 + ql2).astype(jnp.float32), 1.0)
    pair_mapq = mapq_device(pair_best,
                            jnp.where(pair_second > NEG_INF / 2, pair_second,
                                      NEG_INF),
                            smin_pair, sperf_pair,
                            pair_second > NEG_INF / 2,
                            local=scoring.mode == "local")

    # unpaired fallback per mate (mixed mode)
    u_aligned, u_col, u_mapq = best_hit_device(out, qlens, scoring)

    has_pair_b = jnp.repeat(has_pair, 2)
    pair_col = jnp.stack([c1, c2], axis=1).reshape(B)
    best_col = jnp.where(has_pair_b, pair_col, u_col)
    aligned = jnp.where(has_pair_b, True, u_aligned)
    mapq = jnp.where(has_pair_b, jnp.repeat(pair_mapq, 2), u_mapq)
    return aligned, best_col.astype(jnp.int32), mapq


def keep_mask_device(
    out: Dict[str, jnp.ndarray], best_col: jnp.ndarray, qlens: jnp.ndarray,
    mean_qual: jnp.ndarray, mapq: jnp.ndarray,
    mapid: float, readq: float, min_mapq: int, aln_cov: float,
) -> jnp.ndarray:
    """Device twin of profile.common.keep_read_mask (the reference's four
    keep_read filters, genes.py:153-169 == snps.py:141-162)."""
    qe, qs = _pick(out["qend"], best_col), _pick(out["qstart"], best_col)
    alen = (qe - qs).astype(jnp.float32)
    nm = _pick(out["mismatches"] + out["gap_cols"], best_col).astype(jnp.float32)
    pid = 100.0 * (alen - nm) / jnp.maximum(alen, 1.0)
    qlen = jnp.maximum(qlens.astype(jnp.float32), 1.0)
    return ((pid >= mapid) & (mean_qual >= readq)
            & (mapq >= min_mapq) & (alen / qlen >= aln_cov))


def _bucket_rows(n: int, cap: int) -> int:
    """Round a spill-row count up to the next power of two (min 256) so
    device-side slicing before readback reuses a handful of compiled
    slice shapes instead of one per distinct n."""
    b = 256
    while b < n:
        b *= 2
    return min(b, cap)


def sliced_spill_host(bufs: Dict[str, jnp.ndarray], n: jnp.ndarray,
                      cap: int) -> Tuple[Dict[str, np.ndarray], int]:
    """Read spill buffers back with only the occupied rows.

    On a tunneled TPU, device_get of a full [CAP+1, ...] spill buffer is
    the single slowest step of a whole run (measured: 157 s for 36 MB of
    gap buffers holding 36 real rows vs 1 s sliced). Pull the scalar
    count first, slice on device to a pow2 bucket, transfer that.
    Returns ({name: [n, ...] host rows}, true_n)."""
    true_n = int(jax.device_get(n))
    take = _bucket_rows(min(true_n, cap), cap)
    host = jax.device_get({k: jax.lax.slice_in_dim(v, 0, take, axis=0)
                           for k, v in bufs.items()})
    return {k: np.asarray(v)[:min(true_n, cap)] for k, v in host.items()}, true_n


def keep_mask_chosen(
    full: Dict[str, jnp.ndarray], qlens: jnp.ndarray,
    mean_qual: jnp.ndarray, mapq: jnp.ndarray,
    mapid: float, readq: float, min_mapq: int, aln_cov: float,
) -> jnp.ndarray:
    """keep_mask_device twin over the pass-2 per-read ([B]) stats of
    the chosen candidate (align_chosen_full)."""
    alen = (full["qend"] - full["qstart"]).astype(jnp.float32)
    nm = (full["mismatches"] + full["gap_cols"]).astype(jnp.float32)
    pid = 100.0 * (alen - nm) / jnp.maximum(alen, 1.0)
    qlen = jnp.maximum(qlens.astype(jnp.float32), 1.0)
    return ((pid >= mapid) & (mean_qual >= readq)
            & (mapq >= min_mapq) & (alen / qlen >= aln_cov))


def _append_rows(buf: jnp.ndarray, n: jnp.ndarray, rows: jnp.ndarray,
                 is_row: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Append rows[i] (for i where is_row[i]) into buf starting at n.
    buf has one spill row at index CAP; rows past capacity land there.
    Returns (buf, true_total_appended_n) — caller tracks overflow by
    comparing against capacity."""
    cap = buf.shape[0] - 1
    rank = jnp.cumsum(is_row.astype(jnp.int32)) - 1
    dest = jnp.where(is_row, jnp.minimum(n + rank, cap), cap)
    buf = buf.at[dest].set(rows)
    return buf, n + jnp.sum(is_row.astype(jnp.int32))


# ---------------------------------------------------------------------------
# species (marker-gene) profiling
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpeciesState:
    uniq_count: jnp.ndarray   # [S+1] i32 (slot S = no-hit dump)
    uniq_bp: jnp.ndarray      # [S+1] f32
    amb_sp: jnp.ndarray       # [CAP+1, C] i32, -1 padded
    amb_bp: jnp.ndarray       # [CAP+1, C] i32
    amb_seq: jnp.ndarray      # [CAP+1, C] i32 pack seq idx (tie ordering:
    #                           hs-blastn emits equal-score hits in
    #                           subject-index order — measured on the real
    #                           binary — and the reference's RNG draw
    #                           consumes ids in that order, species.py:104-119)
    amb_ord: jnp.ndarray      # [CAP+1] i32 global stream rank of the read
    #                           (batch_global_index * batch_size + row): the
    #                           reference consumes its RNG draws in stream
    #                           order (species.py:104-119), so a multi-host
    #                           merge must SORT rows by this key before
    #                           assignment to stay byte-identical to a
    #                           single-process run (dist/driver.py)
    amb_n: jnp.ndarray        # scalar i32 (true count, may exceed CAP)
    total_alns: jnp.ndarray   # scalar i32


def species_init(n_species: int, num_cands: int, amb_cap: int) -> SpeciesState:
    return SpeciesState(
        uniq_count=jnp.zeros(n_species + 1, jnp.int32),
        uniq_bp=jnp.zeros(n_species + 1, jnp.float32),
        amb_sp=jnp.full((amb_cap + 1, num_cands), -1, jnp.int32),
        amb_bp=jnp.zeros((amb_cap + 1, num_cands), jnp.int32),
        amb_seq=jnp.zeros((amb_cap + 1, num_cands), jnp.int32),
        amb_ord=jnp.zeros(amb_cap + 1, jnp.int32),
        amb_n=jnp.zeros((), jnp.int32),
        total_alns=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("scoring", "seed_params", "max_len", "aln_cov",
                     "n_species", "dblen"),
    donate_argnames=("state",),
)
def species_update(
    state: SpeciesState,
    index_arrays: Dict[str, jnp.ndarray],
    pack_arrays: Dict[str, jnp.ndarray],
    seq_species: jnp.ndarray,   # [num_seqs] i32
    seq_cutoff: jnp.ndarray,    # [num_seqs] f32 per-marker %id cutoffs
    codes: jnp.ndarray,
    qlens: jnp.ndarray,
    n_reads: jnp.ndarray,       # scalar i32: real rows in this batch
    ord_base: jnp.ndarray,      # scalar i32: global stream rank of row 0
    scoring: ScoringParams,
    seed_params: SeedParams,
    max_len: int,
    aln_cov: float,
    n_species: int,
    dblen: float = 0.0,
) -> SpeciesState:
    """One batch of the species classifier, entirely on device
    (reference semantics: species.py:64-119). dblen > 0 enables the
    hs-blastn `-evalue 1e-3` gate (the binary pre-thresholds the m8
    the reference parses, midas/run/species.py:39-46) as a per-read
    minimum score (ScoringParams.evalue_score_threshold)."""
    out = _align_batch_stages(index_arrays, pack_arrays,
                              codes, qlens, scoring, seed_params, max_len)
    B, C = out["score"].shape
    real = jnp.arange(B) < n_reads
    pid = 100.0 * out["matches"].astype(jnp.float32) / jnp.maximum(
        (out["matches"] + out["mismatches"] + out["gap_cols"]).astype(jnp.float32), 1.0)
    aln = out["matches"] + out["mismatches"] + out["gap_cols"]
    cutoff = seq_cutoff[out["seq_idx"]]
    qcov = aln.astype(jnp.float32) / jnp.maximum(qlens[:, None].astype(jnp.float32), 1.0)
    keep = (out["valid"] & (out["score"] > 0) & (pid >= cutoff)
            & (qcov >= aln_cov) & real[:, None])
    if dblen > 0:
        ethr = scoring.evalue_score_threshold(
            jnp.maximum(qlens, 1), float(dblen))
        keep = keep & (out["score"] >= ethr[:, None])
    scores = jnp.where(keep, out["score"], NEG_INF)
    best = jnp.max(scores, axis=1)
    has_hit = best > NEG_INF / 2
    best_mask = keep & (scores == best[:, None])
    n_best = jnp.sum(best_mask, axis=1)
    sp = seq_species[out["seq_idx"]]                       # [B, C]

    uniq_row = has_hit & (n_best == 1)
    col = jnp.argmax(best_mask, axis=1)
    spu = jnp.where(uniq_row, _pick(sp, col), n_species)
    uniq_count = state.uniq_count.at[spu].add(1)
    uniq_bp = state.uniq_bp.at[spu].add(
        jnp.where(uniq_row, _pick(aln, col).astype(jnp.float32), 0.0))

    amb_row = has_hit & (n_best >= 2)
    amb_sp_rows = jnp.where(best_mask, sp, -1)
    amb_bp_rows = jnp.where(best_mask, aln, 0)
    amb_seq_rows = jnp.where(best_mask, out["seq_idx"], 0)
    amb_ord_rows = ord_base + jnp.arange(B, dtype=jnp.int32)
    amb_sp, _ = _append_rows(state.amb_sp, state.amb_n, amb_sp_rows, amb_row)
    amb_bp, _ = _append_rows(state.amb_bp, state.amb_n, amb_bp_rows, amb_row)
    amb_seq, _ = _append_rows(state.amb_seq, state.amb_n, amb_seq_rows,
                              amb_row)
    amb_ord, amb_n = _append_rows(state.amb_ord, state.amb_n, amb_ord_rows,
                                  amb_row)

    total_alns = state.total_alns + jnp.sum(
        (out["valid"] & real[:, None]).astype(jnp.int32))
    return SpeciesState(uniq_count, uniq_bp, amb_sp, amb_bp, amb_seq, amb_ord,
                        amb_n, total_alns)


def species_state_host(state: SpeciesState) -> Dict[str, np.ndarray]:
    """Host snapshot with spill buffers sliced to occupied rows (see
    sliced_spill_host). Used for the end-of-stream readback and for
    checkpoints; amb_n in the result is the TRUE count (may exceed the
    rows present if the buffer overflowed)."""
    cap = state.amb_sp.shape[0] - 1
    spill, amb_n = sliced_spill_host(
        dict(amb_sp=state.amb_sp, amb_bp=state.amb_bp,
             amb_seq=state.amb_seq, amb_ord=state.amb_ord),
        state.amb_n, cap)
    small = jax.device_get(dict(uniq_count=state.uniq_count,
                                uniq_bp=state.uniq_bp,
                                total_alns=state.total_alns))
    out = {k: np.asarray(v) for k, v in small.items()}
    out.update(spill)
    out["amb_n"] = np.int64(amb_n)
    return out


def species_state_restore(h: Dict[str, np.ndarray], amb_cap: int) -> SpeciesState:
    """Rebuild device state from a species_state_host snapshot."""
    n_species = h["uniq_count"].shape[0] - 1
    C = h["amb_sp"].shape[1]
    st = species_init(n_species, C, amb_cap)
    rows = h["amb_sp"].shape[0]
    return SpeciesState(
        uniq_count=jnp.asarray(h["uniq_count"]),
        uniq_bp=jnp.asarray(h["uniq_bp"]),
        amb_sp=st.amb_sp.at[:rows].set(jnp.asarray(h["amb_sp"])),
        amb_bp=st.amb_bp.at[:rows].set(jnp.asarray(h["amb_bp"])),
        amb_seq=st.amb_seq.at[:rows].set(jnp.asarray(h["amb_seq"])),
        amb_ord=st.amb_ord.at[:rows].set(jnp.asarray(h["amb_ord"])),
        amb_n=jnp.asarray(np.int32(h["amb_n"])),
        total_alns=jnp.asarray(np.int32(h["total_alns"])),
    )


# ---------------------------------------------------------------------------
# pangenome CNV (genes) profiling
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GenesState:
    aligned_reads: jnp.ndarray  # [G+1] i32
    mapped_reads: jnp.ndarray   # [G+1] i32
    bp: jnp.ndarray             # [G+1] i32 aligned bp (exact; depth =
    #                             bp/gene_len in f64 on host at the end,
    #                             headroom to ~100,000x coverage/gene)


def genes_init(num_genes: int) -> GenesState:
    return GenesState(
        aligned_reads=jnp.zeros(num_genes + 1, jnp.int32),
        mapped_reads=jnp.zeros(num_genes + 1, jnp.int32),
        bp=jnp.zeros(num_genes + 1, jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_genes", "scoring", "seed_params", "max_len",
                     "mapid", "readq", "min_mapq", "aln_cov", "paired",
                     "maxins"),
    donate_argnames=("state",),
)
def genes_update(
    state: GenesState,
    index_arrays: Dict[str, jnp.ndarray],
    pack_arrays: Dict[str, jnp.ndarray],
    num_genes: int,
    codes: jnp.ndarray,
    quals: jnp.ndarray,         # [B, L] i8 (bowtie2 quality-scaled --mp)
    qlens: jnp.ndarray,
    mean_qual: jnp.ndarray,     # [B] f32
    n_reads: jnp.ndarray,
    scoring: ScoringParams,
    seed_params: SeedParams,
    max_len: int,
    mapid: float,
    readq: float,
    min_mapq: int,
    aln_cov: float,
    paired: bool = False,
    maxins: int = 500,
) -> GenesState:
    """One batch of CNV counting on device (genes.py:153-203).

    Two-pass alignment: score-only DP over every candidate for
    selection/MAPQ, then the full-statistics DP over just each read's
    chosen candidate — num_cands times less stat-plane DP work, same
    results (scores identical, stats recomputed exactly; tested)."""
    out1, aux = align_candidates_score(index_arrays, pack_arrays,
                                       codes, qlens, scoring, seed_params,
                                       max_len, quals=quals)
    B = out1["score"].shape[0]
    G = num_genes
    real = jnp.arange(B) < n_reads
    if paired:
        aligned, best_col, mapq = paired_best_hit_device(
            out1, qlens, scoring, maxins=maxins)
    else:
        aligned, best_col, mapq = best_hit_device(out1, qlens, scoring)
    full = align_chosen_full(pack_arrays, aux, codes, qlens, best_col,
                             scoring, seed_params)
    aligned = aligned & real
    g = _pick(out1["seq_idx"], best_col)
    ga = jnp.where(aligned, g, G)
    aligned_reads = state.aligned_reads.at[ga].add(1)
    keep = aligned & keep_mask_chosen(full, qlens, mean_qual, mapq,
                                      mapid, readq, min_mapq, aln_cov)
    gk = jnp.where(keep, g, G)
    mapped_reads = state.mapped_reads.at[gk].add(1)
    alen = full["qend"] - full["qstart"]
    bp = state.bp.at[gk].add(jnp.where(keep, alen, 0))
    return GenesState(aligned_reads, mapped_reads, bp)


def genes_state_host(state: GenesState) -> Dict[str, np.ndarray]:
    h = jax.device_get(dict(aligned_reads=state.aligned_reads,
                            mapped_reads=state.mapped_reads, bp=state.bp))
    return {k: np.asarray(v) for k, v in h.items()}


def genes_state_restore(h: Dict[str, np.ndarray]) -> GenesState:
    return GenesState(aligned_reads=jnp.asarray(h["aligned_reads"]),
                      mapped_reads=jnp.asarray(h["mapped_reads"]),
                      bp=jnp.asarray(h["bp"]))


# ---------------------------------------------------------------------------
# SNP pileup profiling
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SnpsState:
    counts: jnp.ndarray         # [4 * (G+1)] i32 flat pileup counts
    aligned_reads: jnp.ndarray  # [S+1] i32 per species
    mapped_reads: jnp.ndarray   # [S+1] i32
    gap_codes: jnp.ndarray      # [CAP+1, L] i8 kept gapped reads (as aligned strand)
    gap_quals: jnp.ndarray      # [CAP+1, L] i8
    gap_meta: jnp.ndarray       # [CAP+1, 4] i32: seq_idx, tstart, tend, qlen
    gap_n: jnp.ndarray          # scalar i32 true count


def snps_init(total_len: int, n_species: int, gap_cap: int,
              max_len: int) -> SnpsState:
    return SnpsState(
        counts=jnp.zeros(4 * (total_len + 1), jnp.int32),
        aligned_reads=jnp.zeros(n_species + 1, jnp.int32),
        mapped_reads=jnp.zeros(n_species + 1, jnp.int32),
        gap_codes=jnp.full((gap_cap + 1, max_len), 4, jnp.int8),
        gap_quals=jnp.zeros((gap_cap + 1, max_len), jnp.int8),
        gap_meta=jnp.zeros((gap_cap + 1, 4), jnp.int32),
        gap_n=jnp.zeros((), jnp.int32),
    )


def counts_host(counts: jnp.ndarray) -> np.ndarray:
    """Pull a pileup count tensor to host through the narrowest exact
    dtype: one scalar max() readback picks uint8/int16/int32, cutting
    the D2H bytes 4x/2x for typical coverages. On the tunneled chip
    D2H runs at ~1-25 MB/s, so at Mb-scale genomes the end-of-stream
    [4 x G] readback (32 MB per 2 Mb of genome) otherwise dominates
    the whole SNP pipeline (measured: 2.4 s of a 3.0 s run)."""
    mx = int(jax.device_get(jnp.max(counts)))
    if mx < 2**8:
        h = jax.device_get(counts.astype(jnp.uint8))
    elif mx < 2**15:
        h = jax.device_get(counts.astype(jnp.int16))
    else:
        h = jax.device_get(counts)
    return np.asarray(h).astype(np.int32)


def snps_state_host(state: SnpsState,
                    counts_async: bool = False) -> Dict[str, np.ndarray]:
    """Host snapshot; gap spill buffers sliced to occupied rows (the
    full [CAP+1, L] buffers measured 157 s to read over the tunnel vs
    1 s sliced — this readback was the entire SNP-pipeline slowdown in
    rounds 1-2) and the counts tensor pulled through the sparse
    run-encoded readback (profile/sparse_counts.py — at Mb-scale
    genomes the dense [4 x G] pull dominated whole runs over the
    ~1-25 MB/s tunnel, SCALE_BENCH.md).

    With counts_async=True, out["counts"] is a concurrent Future whose
    result() is the array — the end-of-stream caller overlaps the
    transfer with the host gapped-read oracle (resolve_counts)."""
    from midas_tpu.profile.sparse_counts import counts_host_sparse

    G = state.counts.shape[0] // 4 - 1
    if counts_async:
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(1)
        counts_out = ex.submit(counts_host_sparse, state.counts, G)
        ex.shutdown(wait=False)
    else:
        counts_out = counts_host_sparse(state.counts, G)
    cap = state.gap_codes.shape[0] - 1
    spill, gap_n = sliced_spill_host(
        dict(gap_codes=state.gap_codes, gap_quals=state.gap_quals,
             gap_meta=state.gap_meta), state.gap_n, cap)
    small = jax.device_get(dict(aligned_reads=state.aligned_reads,
                                mapped_reads=state.mapped_reads))
    out = {k: np.asarray(v) for k, v in small.items()}
    out["counts"] = counts_out
    out.update(spill)
    out["gap_n"] = np.int64(gap_n)
    return out


def resolve_counts(counts) -> np.ndarray:
    """Resolve a (possibly async) snps_state_host counts field."""
    if hasattr(counts, "result"):
        return np.asarray(counts.result())
    return np.asarray(counts)


def snps_state_restore(h: Dict[str, np.ndarray], gap_cap: int) -> SnpsState:
    total_len = h["counts"].shape[0] // 4 - 1
    n_species = h["aligned_reads"].shape[0] - 1
    L = h["gap_codes"].shape[1]
    st = snps_init(total_len, n_species, gap_cap, L)
    rows = h["gap_codes"].shape[0]
    return SnpsState(
        counts=jnp.asarray(h["counts"]),
        aligned_reads=jnp.asarray(h["aligned_reads"]),
        mapped_reads=jnp.asarray(h["mapped_reads"]),
        gap_codes=st.gap_codes.at[:rows].set(jnp.asarray(h["gap_codes"])),
        gap_quals=st.gap_quals.at[:rows].set(jnp.asarray(h["gap_quals"])),
        gap_meta=st.gap_meta.at[:rows].set(jnp.asarray(h["gap_meta"])),
        gap_n=jnp.asarray(np.int32(h["gap_n"])),
    )


@functools.partial(
    jax.jit,
    static_argnames=("scoring", "seed_params", "max_len",
                     "mapid", "readq", "min_mapq", "baseq", "aln_cov",
                     "paired", "maxins"),
    donate_argnames=("state",),
)
def snps_update(
    state: SnpsState,
    index_arrays: Dict[str, jnp.ndarray],
    pack_arrays: Dict[str, jnp.ndarray],
    contig_species: jnp.ndarray,  # [num_seqs] i32
    codes: jnp.ndarray,
    quals: jnp.ndarray,           # [B, L] i8
    qlens: jnp.ndarray,
    mean_qual: jnp.ndarray,
    n_reads: jnp.ndarray,
    scoring: ScoringParams,
    seed_params: SeedParams,
    max_len: int,
    mapid: float,
    readq: float,
    min_mapq: int,
    baseq: int,
    aln_cov: float,
    paired: bool = False,
    maxins: int = 500,
) -> SnpsState:
    """One pileup batch on device: gapless kept reads scatter base
    counts directly (the closed-form column map of snps.py's pileup);
    gapped kept reads spill to a buffer for exact host traceback.

    Two-pass alignment (see genes_update): score-only DP over all
    candidates, full stats only for the chosen one."""
    out1, aux = align_candidates_score(index_arrays, pack_arrays,
                                       codes, qlens, scoring, seed_params,
                                       max_len, quals=quals)
    B, L = codes.shape
    # genome length from the counts buffer, NOT the pack length:
    # the pack carries a GUARD pad beyond total_len (refpack.py)
    G = state.counts.shape[0] // 4 - 1
    S = state.aligned_reads.shape[0] - 1
    real = jnp.arange(B) < n_reads
    if paired:
        aligned, best_col, mapq = paired_best_hit_device(
            out1, qlens, scoring, maxins=maxins)
    else:
        aligned, best_col, mapq = best_hit_device(out1, qlens, scoring)
    full = align_chosen_full(pack_arrays, aux, codes, qlens, best_col,
                             scoring, seed_params)
    aligned = aligned & real
    ci = _pick(out1["seq_idx"], best_col)
    sp = contig_species[ci]
    aligned_reads = state.aligned_reads.at[jnp.where(aligned, sp, S)].add(1)
    keep = aligned & keep_mask_chosen(full, qlens, mean_qual, mapq,
                                      mapid, readq, min_mapq, aln_cov)
    mapped_reads = state.mapped_reads.at[jnp.where(keep, sp, S)].add(1)

    strand = _pick(out1["strand"], best_col)
    rc_codes = revcomp_batch(codes, qlens)
    # per-read reversed quals in the same left-aligned frame
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    rc_quals = reverse_batch(quals, qlens, fill=0)
    qsel = jnp.where(strand[:, None] == 1, rc_codes, codes)
    qqsel = jnp.where(strand[:, None] == 1, rc_quals, quals).astype(jnp.int32)

    gapless = full["gap_cols"] == 0
    qs = full["qstart"]
    qe = full["qend"]
    ts = full["tstart"]
    seq_lo = pack_arrays["offsets"][ci].astype(jnp.int32)
    scatter_row = keep & gapless
    in_aln = (j >= qs[:, None]) & (j < qe[:, None])
    tpos = seq_lo[:, None] + ts[:, None] + (j - qs[:, None])
    base = qsel.astype(jnp.int32)
    ok = (scatter_row[:, None] & in_aln & (qqsel >= baseq) & (base < 4)
          & (tpos >= 0) & (tpos < G))
    flat_idx = jnp.where(ok, jnp.clip(base, 0, 3) * (G + 1) + tpos, G)
    counts = state.counts.at[flat_idx.reshape(-1)].add(1)

    # spill kept gapped reads (strand-adjusted) for exact host traceback.
    # Gapped kept reads are rare (<=1-2% even on indel-bearing data), but
    # a naive append scatters ALL B rows (mostly into the dump slot) into
    # the [CAP+1, L] buffers every batch. Instead: compact the gapped
    # rows to the front with a stable argsort (stream order preserved)
    # and append only a fixed small block; a batch with zero gapped
    # reads skips the appends entirely, and the rare batch with more
    # than the block falls back to the full-row append via lax.cond.
    is_gap = keep & ~gapless
    te = full["tend"]
    meta = jnp.stack([ci, ts, te, qlens], axis=1)
    K = min(512, B)
    n_gap_b = jnp.sum(is_gap.astype(jnp.int32))
    order = jnp.argsort(~is_gap, stable=True).astype(jnp.int32)
    topk = order[:K]
    sel_gap = jnp.take(is_gap, topk)
    rows_codes = jnp.take(qsel.astype(jnp.int8), topk, axis=0)
    rows_quals = jnp.take(qqsel.astype(jnp.int8), topk, axis=0)
    rows_meta = jnp.take(meta, topk, axis=0)

    def no_append():
        return state.gap_codes, state.gap_quals, state.gap_meta, state.gap_n

    def compact_append():
        gc, _ = _append_rows(state.gap_codes, state.gap_n, rows_codes,
                             sel_gap)
        gq, _ = _append_rows(state.gap_quals, state.gap_n, rows_quals,
                             sel_gap)
        gm, gn = _append_rows(state.gap_meta, state.gap_n, rows_meta,
                              sel_gap)
        return gc, gq, gm, gn

    def full_append():
        gc, _ = _append_rows(state.gap_codes, state.gap_n,
                             qsel.astype(jnp.int8), is_gap)
        gq, _ = _append_rows(state.gap_quals, state.gap_n,
                             qqsel.astype(jnp.int8), is_gap)
        gm, gn = _append_rows(state.gap_meta, state.gap_n, meta, is_gap)
        return gc, gq, gm, gn

    gap_codes, gap_quals, gap_meta, gap_n = jax.lax.cond(
        n_gap_b == 0, no_append,
        lambda: jax.lax.cond(n_gap_b <= K, compact_append, full_append))
    return SnpsState(counts, aligned_reads, mapped_reads,
                     gap_codes, gap_quals, gap_meta, gap_n)
