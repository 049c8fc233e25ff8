"""Seed-and-vote candidate generation (pure JAX, runs under jit).

Replaces the seeding half of bowtie2 / hs-blastn: query k-mers at a
fixed stride are looked up in the hashed SeedIndex (db/index.py), every
hit votes for an alignment diagonal (ref_pos - query_pos), and the
top-C diagonals per read by vote count become banded-extension
candidates. Both strands are searched by seeding the reverse-complement
read (the reference gets this from the aligner binaries implicitly).

Everything is fixed-shape: [B, 2, S, H] hit tensors flatten to
[B, M] vote keys; top-C selection is C rounds of argmax + neighborhood
masking. No data-dependent shapes anywhere.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from midas_tpu.db.index import EMPTY_KEY, SeedIndex

# plain ints: jnp constants at module level would initialize the JAX
# backend on import, which breaks when a TPU plugin registers lazily
INVALID_KEY = 2**31 - 1
STRAND_OFFSET = 2**30  # keys: strand * STRAND_OFFSET + diag + L


@dataclasses.dataclass(frozen=True)
class SeedParams:
    k: int = 14
    stride: int = 7          # query seed stride
    max_hits: int = 16       # hits gathered per seed
    num_cands: int = 4       # banded-extension candidates per read
    band_width: int = 16     # D of the banded DP
    probes: int = 16         # hash probes (index built at load factor <=0.5)


def fmix32_jnp(h: jnp.ndarray) -> jnp.ndarray:
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def revcomp_batch(codes: jnp.ndarray, qlens: jnp.ndarray) -> jnp.ndarray:
    """Per-read reverse complement, keeping reads left-aligned.
    codes [B, L] int8 (4 = pad); rc[i, j] = comp(codes[i, qlen_i-1-j])."""
    B, L = codes.shape
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    idx = qlens[:, None] - 1 - j
    valid = idx >= 0
    gathered = jnp.take_along_axis(codes, jnp.clip(idx, 0, L - 1).astype(jnp.int32), axis=1)
    comp = jnp.where(gathered < 4, 3 - gathered, 4).astype(jnp.int8)
    return jnp.where(valid, comp, jnp.int8(4))


def _query_kmers(codes: jnp.ndarray, qlens: jnp.ndarray, k: int, stride: int,
                 max_len: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K-mers at stride positions. Returns (kmers [B,S] uint32,
    qpos [S] int32, valid [B,S] bool)."""
    B, L = codes.shape
    n_seeds = max(1, (max_len - k) // stride + 1)
    qpos = jnp.arange(n_seeds, dtype=jnp.int32) * stride  # [S]
    # gather k consecutive codes per seed
    gather_idx = qpos[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]  # [S,k]
    gather_idx = jnp.clip(gather_idx, 0, L - 1)
    window = codes[:, gather_idx]  # [B, S, k]
    valid = jnp.all(window < 4, axis=-1) & (qpos[None, :] + k <= qlens[:, None])
    km = jnp.zeros((B, n_seeds), jnp.uint32)
    for i in range(k):
        km = (km << 2) | (window[:, :, i].astype(jnp.uint32) & 3)
    return km, qpos, valid


def _hash_lookup(index_arrays: Dict[str, jnp.ndarray], kmers: jnp.ndarray,
                 probes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Open-addressing probe. kmers [...]; returns (start, count) int32,
    count 0 when absent."""
    table_key = index_arrays["table_key"]
    T = table_key.shape[0]
    mask = jnp.uint32(T - 1)
    h = fmix32_jnp(kmers)
    start = jnp.zeros(kmers.shape, jnp.int32)
    count = jnp.zeros(kmers.shape, jnp.int32)
    done = jnp.zeros(kmers.shape, jnp.bool_)

    def body(r, carry):
        start, count, done = carry
        slot = ((h + jnp.uint32(r)) & mask).astype(jnp.int32)
        key = table_key[slot]
        found = (key == kmers) & ~done
        empty = (key == jnp.uint32(EMPTY_KEY))
        start = jnp.where(found, index_arrays["table_start"][slot], start)
        count = jnp.where(found, index_arrays["table_count"][slot], count)
        done = done | found | empty
        return start, count, done

    start, count, done = jax.lax.fori_loop(0, probes, body, (start, count, done))
    return start, count


@functools.partial(jax.jit, static_argnames=("sp", "max_len"))
def find_candidates(
    index_arrays: Dict[str, jnp.ndarray],
    codes: jnp.ndarray,   # [B, L] int8
    qlens: jnp.ndarray,   # [B] int32
    sp: SeedParams,
    max_len: int,
) -> Dict[str, jnp.ndarray]:
    """Top-C (diagonal, strand) candidates per read by seed votes.

    Returns dict with [B, C] arrays: diag (ref_pos - query_pos in pack
    coords), strand (0 fwd / 1 rc), votes (seed hits on that diagonal),
    valid (bool).
    """
    B, L = codes.shape
    rc = revcomp_batch(codes, qlens)
    positions = index_arrays["positions"]

    keys_all = []
    for strand, strand_codes in enumerate((codes, rc)):
        km, qpos, valid = _query_kmers(strand_codes, qlens, sp.k, sp.stride, max_len)
        start, count = _hash_lookup(index_arrays, km, sp.probes)  # [B,S]
        count = jnp.where(valid, count, 0)
        h_idx = jnp.arange(sp.max_hits, dtype=jnp.int32)  # [H]
        gidx = start[:, :, None] + h_idx[None, None, :]   # [B,S,H]
        hit_valid = h_idx[None, None, :] < jnp.minimum(count, sp.max_hits)[:, :, None]
        pos = positions[jnp.clip(gidx, 0, positions.shape[0] - 1)]  # [B,S,H]
        diag = pos - qpos[None, :, None]
        key = jnp.int32(strand * STRAND_OFFSET) + diag + jnp.int32(L)
        key = jnp.where(hit_valid, key, INVALID_KEY)
        keys_all.append(key.reshape(B, -1))
    keys = jnp.concatenate(keys_all, axis=1)  # [B, M]

    keys = jnp.sort(keys, axis=1)
    # votes per run of equal keys, via prefix scans (a vmapped
    # searchsorted lowers to per-element while loops — ~10x slower on TPU)
    M = keys.shape[1]
    j_idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), jnp.bool_), keys[:, 1:] != keys[:, :-1]], axis=1)
    # index of the next run start strictly after j (reverse exclusive
    # cumulative min of start positions), computed as an explicit
    # log-doubling suffix min: lax.associative_scan here makes TPU XLA
    # compile superlinearly in B*M when composed with the hit-gather
    # producer above (measured 100s+ at B=1024, M=1088 — vs 3s for the
    # unrolled doubling, which computes the identical result)
    start_pos = jnp.where(is_start, j_idx, M)
    next_start = jnp.concatenate(
        [start_pos[:, 1:], jnp.full((B, 1), M, jnp.int32)], axis=1)
    shift = 1
    while shift < M:
        shifted = jnp.concatenate(
            [next_start[:, shift:], jnp.full((B, shift), M, jnp.int32)],
            axis=1)
        next_start = jnp.minimum(next_start, shifted)
        shift *= 2
    votes = next_start - j_idx  # valid at run starts
    eligible = is_start & (keys != INVALID_KEY)
    score = jnp.where(eligible, votes, -1)

    # C rounds of argmax + neighborhood masking (dedup near-diagonals)
    tol = sp.band_width // 2
    cand_key = []
    cand_votes = []
    for _ in range(sp.num_cands):
        best_j = jnp.argmax(score, axis=1)  # ties -> smallest index = smallest key
        bvotes = jnp.take_along_axis(score, best_j[:, None], axis=1)[:, 0]
        bkey = jnp.take_along_axis(keys, best_j[:, None], axis=1)[:, 0]
        cand_key.append(bkey)
        cand_votes.append(bvotes)
        near = jnp.abs(keys - bkey[:, None]) <= tol
        score = jnp.where(near, -1, score)
    cand_key = jnp.stack(cand_key, axis=1)    # [B, C]
    cand_votes = jnp.stack(cand_votes, axis=1)
    valid = cand_votes > 0
    strand = (cand_key // STRAND_OFFSET).astype(jnp.int32)
    diag = cand_key - strand * STRAND_OFFSET - jnp.int32(L)
    return dict(diag=diag, strand=strand, votes=cand_votes, valid=valid)


@functools.partial(jax.jit, static_argnames=("window_len",))
def gather_windows(
    pack_codes: jnp.ndarray,   # [G] int8
    pack_offsets: jnp.ndarray, # [S+1] int64/int32
    winstart: jnp.ndarray,     # [B, C] int32 global pack coords
    window_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather reference windows, masking outside the target sequence so
    alignments never cross packed-sequence boundaries.

    Returns (ref_win [B, C, W] int8, seq_idx [B, C] int32)."""
    W = window_len
    center = winstart + W // 2
    seq_idx = (
        jnp.searchsorted(pack_offsets, center.astype(pack_offsets.dtype), side="right") - 1
    ).astype(jnp.int32)
    seq_idx = jnp.clip(seq_idx, 0, pack_offsets.shape[0] - 2)
    seq_lo = pack_offsets[seq_idx].astype(jnp.int32)
    seq_hi = pack_offsets[seq_idx + 1].astype(jnp.int32)
    w = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    pos = winstart[:, :, None] + w
    in_seq = (pos >= seq_lo[:, :, None]) & (pos < seq_hi[:, :, None])
    gathered = pack_codes[jnp.clip(pos, 0, pack_codes.shape[0] - 1)]
    ref_win = jnp.where(in_seq, gathered, jnp.int8(4))
    return ref_win, seq_idx
