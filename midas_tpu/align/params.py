"""Alignment scoring models.

The reference delegates scoring to two black boxes whose *outputs* feed
its filters: HS-BLASTN (megablast scoring; %id + aln length + bitscore
ranking, midas/run/species.py:64-85) and Bowtie2 (end-to-end and local
presets; NM tag and MAPQ feed keep_read, midas/run/genes.py:153-169,
snps.py:141-162). We define three explicit scoring personalities with
the same downstream contract:

- MARKER_SCORING: megablast-like (match +1 / mismatch -2), bitscore +
  e-value via Karlin-Altschul, multi-hit reporting. Drives species
  profiling exactly like the reference's m8 parsing.
- GLOBAL_SCORING: bowtie2 end-to-end-like (all penalties <= 0, perfect
  read scores 0, min score -0.6-0.6*L). Drives SNP pileup mapping.
- LOCAL_SCORING: bowtie2 local-like (match bonus +2, min score
  20+8*ln(L)). Drives pangenome CNV mapping.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class ScoringParams:
    match: int
    mismatch: int          # negative
    gap_open: int          # positive cost; a gap of length g costs open + g*extend
    gap_extend: int        # positive cost
    mode: str              # 'local' (free query+ref ends) or 'glocal' (full query, free ref ends)
    # Karlin-Altschul parameters for e-value/bitscore (marker personality).
    ka_lambda: float = 1.28
    ka_k: float = 0.46

    def score_min(self, read_len: int) -> float:
        """Minimum acceptable alignment score, bowtie2-style defaults:
        end-to-end: -0.6 - 0.6*L ; local: 20 + 8*ln(L)."""
        if self.mode == "glocal":
            return -0.6 - 0.6 * read_len
        return 20.0 + 8.0 * math.log(read_len)

    def score_perfect(self, read_len: int) -> float:
        return float(self.match * read_len)

    def bitscore(self, raw: float) -> float:
        return (self.ka_lambda * raw - math.log(self.ka_k)) / math.log(2.0)

    def evalue(self, raw: float, qlen: int, dblen: int) -> float:
        return float(qlen) * float(dblen) * 2.0 ** (-self.bitscore(raw))


# megablast-like scoring for the 15-marker-gene search
MARKER_SCORING = ScoringParams(match=1, mismatch=-2, gap_open=2, gap_extend=1, mode="local")

# bowtie2 end-to-end-like scoring (rep-genome SNP mapping default,
# run_midas.py:404 mode default 'global')
GLOBAL_SCORING = ScoringParams(match=0, mismatch=-6, gap_open=5, gap_extend=3, mode="glocal")

# bowtie2 local-like scoring (pangenome CNV mapping default,
# run_midas.py:269 mode default 'local')
LOCAL_SCORING = ScoringParams(match=2, mismatch=-6, gap_open=5, gap_extend=3, mode="local")


def mapq_from_scores(best: float, second: float, score_min: float,
                     score_perfect: float, has_second: bool) -> int:
    """Bowtie2 MapqV2-shaped MAPQ from best/second-best scores.

    The no-competitor branch reproduces bowtie2's documented unique-
    alignment table EXACTLY (bowtie2 mapq.h MapqV2: thresholds
    0.8/0.7/0.6/0.5/0.4/0.3 of the score range above score_min map to
    42/40/24/23/8/3/0 — widely documented, e.g. the public 'how does
    bowtie2 assign MAPQ' analyses). The with-competitor branch keeps
    bowtie2's two-factor structure (score-gap band x absolute-score
    band) with calibrated values: exact reproduction of that half is
    unverifiable in this checkout (bowtie2-align binaries absent per
    .MISSING_LARGE_BLOBS, no network egress to fetch the source); the
    contract the reference pipeline needs from it is the mapq>=20 gate
    (scripts/run_midas.py:413) separating confident hits from ties,
    unit-tested in tests/test_aligner.py/test_paired.py.
    """
    span = max(score_perfect - score_min, 1.0)
    if best < score_min:
        return 0
    norm_best = (best - score_min) / span
    if not has_second:
        if norm_best >= 0.8:
            return 42
        if norm_best >= 0.7:
            return 40
        if norm_best >= 0.6:
            return 24
        if norm_best >= 0.5:
            return 23
        if norm_best >= 0.4:
            return 8
        if norm_best >= 0.3:
            return 3
        return 0
    diff = max(best - second, 0.0)
    norm_diff = diff / span
    if norm_diff == 0.0:
        return 1 if norm_best >= 0.67 else 0
    if norm_diff >= 0.6:
        return 42
    if norm_diff >= 0.4:
        return 40
    if norm_diff >= 0.25:
        return 35 if norm_best >= 0.67 else 25
    if norm_diff >= 0.1:
        return 28 if norm_best >= 0.67 else 18
    return 15 if norm_best >= 0.67 else 5
