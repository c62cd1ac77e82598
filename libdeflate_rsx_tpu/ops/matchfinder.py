"""Vectorized LZ77 match finding on TPU (JAX/XLA ops).

The reference walks per-position hash chains with SIMD match-length kernels
(reference src/compress/matchfinder.rs). That shape is wrong for a vector
machine, so this module re-derives match finding as whole-block array ops:

 - hash4 of every position via shifts/multiplies (no table),
 - nearest previous occurrence via one stable argsort over the hash array
   (the predecessor in (hash, pos) order IS the most recent prior position
   with the same hash — a 1-probe HT matchfinder, reference's level-1 tier),
 - match lengths for all positions at once by a word-compare extension loop
   (while_loop with early exit; each round extends all still-active lanes
   by 4 bytes via two gathers), the vector analog of the reference's
   match-length SIMD kernels.

All functions operate on a single padded block; batch via jax.vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..common import MAX_MATCH_LEN, WINDOW_SIZE

HASH4_MULT = np.uint32(0x9E3779B1)
HASH_BITS = 15
MIN_VEC_MATCH = 4  # hash4 cannot see length-3 matches

# Extra zero padding the caller must provide past the block so the
# extension loop's gathers stay in bounds.
BLOCK_PAD = MAX_MATCH_LEN + 8


def words4(data: jnp.ndarray) -> jnp.ndarray:
    """(S+pad,) uint8 -> (S,) uint32 little-endian 4-byte words at each pos."""
    d = data.astype(jnp.uint32)
    s = data.shape[0] - 3
    return (d[:s] | (d[1:s + 1] << jnp.uint32(8))
            | (d[2:s + 2] << jnp.uint32(16)) | (d[3:s + 3] << jnp.uint32(24)))


def hash4(w: jnp.ndarray) -> jnp.ndarray:
    return ((w * HASH4_MULT) >> jnp.uint32(32 - HASH_BITS)).astype(jnp.int32)


def nearest_prev_occurrence(h: jnp.ndarray) -> jnp.ndarray:
    """For each position i, the largest j < i with h[j] == h[i], else -1.

    One stable sort: positions sorted by hash keep index order within equal
    hashes, so each element's predecessor in sorted order is its nearest
    previous occurrence.
    """
    n = h.shape[0]
    order = jnp.argsort(h, stable=True)
    h_sorted = h[order]
    prev_sorted = jnp.where(
        jnp.concatenate([jnp.array([False]), h_sorted[1:] == h_sorted[:-1]]),
        jnp.concatenate([jnp.array([-1], jnp.int32), order[:-1]]),
        jnp.int32(-1),
    )
    cand = jnp.zeros(n, jnp.int32).at[order].set(prev_sorted)
    return cand


def match_lengths(data_padded: jnp.ndarray, w: jnp.ndarray,
                  cand: jnp.ndarray, valid_len: jnp.ndarray) -> jnp.ndarray:
    """Match length at every position against its candidate (0 if no match).

    data_padded: (S + BLOCK_PAD,) uint8; w: 4-byte words (≥ S entries);
    cand: (S,) candidate positions (-1 = none); valid_len: traced scalar.

    Extends 4 bytes per round for all still-active lanes (two dynamic
    gathers per round), early-exits when every lane has resolved. Returns
    lengths capped at min(MAX_MATCH_LEN, valid_len - i).
    """
    s = cand.shape[0]
    idx = jnp.arange(s, dtype=jnp.int32)
    has_cand = (cand >= 0) & (idx - cand <= WINDOW_SIZE)
    cap = jnp.clip(valid_len - idx, 0, MAX_MATCH_LEN).astype(jnp.int32)
    # first word compare decides whether there is a match at all (≥4)
    wj = w[jnp.clip(cand, 0, s - 1)]
    first_eq = has_cand & (wj == w[idx]) & (cap >= MIN_VEC_MATCH)

    wpad = words4(data_padded)  # (S + BLOCK_PAD - 3,) words at any offset

    def body(state):
        length, active, _ = state
        # compare the next 4 bytes at i+length vs j+length
        ia = jnp.clip(idx + length, 0, wpad.shape[0] - 1)
        ja = jnp.clip(cand + length, 0, wpad.shape[0] - 1)
        wa = wpad[ia]
        wb = wpad[ja]
        eq = wa == wb
        full = active & eq & (length + 4 <= cap)
        # lanes that mismatch now: count matching low bytes of the xor word
        x = wa ^ wb
        b0 = (x & jnp.uint32(0xFF)) == 0
        b1 = (x & jnp.uint32(0xFFFF)) == 0
        b2 = (x & jnp.uint32(0xFFFFFF)) == 0
        partial = b0.astype(jnp.int32) + b1.astype(jnp.int32) + b2.astype(jnp.int32)
        add = jnp.where(full, 4, jnp.where(active, partial, 0))
        length = jnp.minimum(length + add, cap)
        new_active = full & (length < cap)
        return length, new_active, jnp.any(new_active)

    def cond(state):
        return state[2]

    length0 = jnp.where(first_eq, 0, 0).astype(jnp.int32)
    init = (length0, first_eq, jnp.any(first_eq))
    length, _, _ = jax.lax.while_loop(cond, body, init)
    return jnp.where(first_eq, jnp.maximum(length, 0), 0)


def find_matches(data_padded: jnp.ndarray, valid_len: jnp.ndarray,
                 block_size: int):
    """Full pipeline for one padded block: returns (match_len, match_dist)
    arrays of shape (block_size,); match_len < MIN_VEC_MATCH means literal."""
    w = words4(data_padded)[:block_size]
    h = hash4(w)
    cand = nearest_prev_occurrence(h)
    idx = jnp.arange(block_size, dtype=jnp.int32)
    ml = match_lengths(data_padded, w, cand, valid_len)
    dist = jnp.where(ml >= MIN_VEC_MATCH, idx - cand, 0).astype(jnp.int32)
    ml = jnp.where(ml >= MIN_VEC_MATCH, ml, 0)
    # positions at/after valid_len never match (their cap is 0 already)
    return ml, dist
