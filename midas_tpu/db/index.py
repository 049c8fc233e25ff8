"""K-mer seed index: hashed lookup tables that replace the FM-indexes of
bowtie2-build and `hs-blastn index` (reference invocation sites:
midas/run/genes.py:108-114, midas/run/snps.py:89-95,
midas/build/build_db.py:449-456).

Design: instead of an FM-index (pointer-chasing, hostile to TPUs), we
store an open-addressing hash table over all reference k-mers. A query
k-mer costs O(1) vectorized gathers; hits are contiguous runs in a
position array sorted by k-mer. The whole structure is three flat
arrays that live in HBM and are consumed by gathers inside jit.

Build is host-side vectorized numpy (no Python per-kmer loops).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from midas_tpu.db.refpack import ReferencePack

EMPTY_KEY = np.uint32(0xFFFFFFFF)
MAX_PROBES = 32  # linear-probe cap (load factor <= 0.5 keeps real probes ~1-2)


def fmix32(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 32-bit finalizer (public-domain mixing constants)."""
    h = np.asarray(h, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h


@dataclasses.dataclass
class SeedIndex:
    """Open-addressing k-mer hash table over a ReferencePack."""

    k: int
    table_key: np.ndarray    # [T] uint32, EMPTY_KEY where unoccupied
    table_start: np.ndarray  # [T] int32 index into positions
    table_count: np.ndarray  # [T] int32 number of occurrences (capped)
    positions: np.ndarray    # [N] int32 global pack positions, kmer-sorted

    @property
    def table_size(self) -> int:
        return len(self.table_key)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, k=self.k, table_key=self.table_key,
            table_start=self.table_start, table_count=self.table_count,
            positions=self.positions,
        )

    @staticmethod
    def load(path: str) -> "SeedIndex":
        z = np.load(path)
        return SeedIndex(
            k=int(z["k"]), table_key=z["table_key"],
            table_start=z["table_start"], table_count=z["table_count"],
            positions=z["positions"],
        )


def pack_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """2-bit pack every k-mer starting position: [len(codes)-k+1] uint32.

    Positions whose window contains a sentinel base are set to EMPTY_KEY.
    """
    codes = np.asarray(codes)
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint32)
    kmers = np.zeros(n, dtype=np.uint32)
    valid = np.ones(n, dtype=bool)
    for i in range(k):
        c = codes[i: i + n]
        kmers = (kmers << np.uint32(2)) | (c.astype(np.uint32) & np.uint32(3))
        valid &= c < 4
    kmers[~valid] = EMPTY_KEY
    return kmers


def build_seed_index(
    pack: ReferencePack,
    k: int = 14,
    max_occ: int = 256,
    min_table_size: int = 1024,
) -> SeedIndex:
    """Build the hash table from a ReferencePack.

    max_occ caps hits per k-mer (repetitive-seed masking, same idea as
    minimap2's repeat filtering): positions beyond the cap are dropped at
    build time so query-side gather counts stay bounded.
    """
    if not 4 <= k <= 15:
        raise ValueError("k must be in [4, 15] so kmers fit uint32 below EMPTY_KEY")
    if pack.total_len >= 2**31:
        raise ValueError("pack too large for int32 positions; shard it first")
    kmers = pack_kmers(pack.codes[: pack.total_len], k)
    # Mask windows that cross sequence boundaries.
    starts = pack.offsets[:-1]
    ends = pack.offsets[1:]
    pos = np.arange(len(kmers), dtype=np.int64)
    seq_idx = np.searchsorted(pack.offsets, pos, side="right") - 1
    in_seq = pos + k <= ends[seq_idx]
    del seq_idx, ends, starts
    valid = (kmers != EMPTY_KEY) & in_seq
    vpos = pos[valid].astype(np.int32)
    vkmers = kmers[valid]
    # Sort positions by kmer; ties keep ascending position (stable).
    order = np.argsort(vkmers, kind="stable")
    vkmers = vkmers[order]
    vpos = vpos[order]
    uniq, start, count = np.unique(vkmers, return_index=True, return_counts=True)
    count = np.minimum(count, max_occ).astype(np.int32)

    # Open-addressing insert, fully vectorized over probe rounds: in each
    # round every unplaced key proposes slot (h + r) mod T; the first
    # proposer of each still-empty slot wins.
    U = len(uniq)
    T = max(min_table_size, 1 << int(np.ceil(np.log2(max(2 * U, 2)))))
    table_key = np.full(T, EMPTY_KEY, dtype=np.uint32)
    table_start = np.zeros(T, dtype=np.int32)
    table_count = np.zeros(T, dtype=np.int32)
    h0 = fmix32(uniq)
    unplaced = np.arange(U)
    r = 0
    while len(unplaced):
        if r >= T:
            raise RuntimeError("seed index hash table insert failed to converge")
        slots = (h0[unplaced] + np.uint32(r)) & np.uint32(T - 1)
        empty = table_key[slots] == EMPTY_KEY
        cand = unplaced[empty]
        cand_slots = slots[empty]
        # first proposer per slot wins this round
        uniq_slots, first = np.unique(cand_slots, return_index=True)
        winners = cand[first]
        table_key[uniq_slots] = uniq[winners]
        table_start[uniq_slots] = start[winners].astype(np.int32)
        table_count[uniq_slots] = count[winners]
        placed = np.zeros(U, dtype=bool)
        placed[winners] = True
        unplaced = unplaced[~placed[unplaced]]
        r += 1
    return SeedIndex(
        k=k, table_key=table_key, table_start=table_start,
        table_count=table_count, positions=vpos,
    )


def lookup_host(index: SeedIndex, kmer: int) -> np.ndarray:
    """Host-side single-kmer lookup (tests / debugging)."""
    T = index.table_size
    h = int(fmix32(np.uint32(kmer)))
    for r in range(MAX_PROBES + T):
        slot = (h + r) & (T - 1)
        key = index.table_key[slot]
        if key == EMPTY_KEY:
            return np.zeros(0, dtype=np.int32)
        if key == np.uint32(kmer):
            s, c = index.table_start[slot], index.table_count[slot]
            return index.positions[s: s + c]
    return np.zeros(0, dtype=np.int32)
