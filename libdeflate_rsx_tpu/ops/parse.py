"""Parallel greedy parse (cover selection) on TPU.

The reference's greedy loop walks the block byte-by-byte, jumping over each
emitted match (reference src/compress/mod.rs decide_greedy_sequences). That
walk is a linked-list traversal: next(i) = i + len(i) for a match, i + 1
for a literal. Here it is resolved for the whole block at once by
pointer-jumping (log-depth list ranking): the set of emitted token
positions is exactly the orbit of position 0 under `next`, marked with
ceil(log2(S)) rounds of scatter-or + pointer doubling.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .matchfinder import MIN_VEC_MATCH


def greedy_cover(match_len: jnp.ndarray, valid_len: jnp.ndarray) -> jnp.ndarray:
    """Boolean (S,) mask of token-start positions under the greedy parse.

    match_len[i] >= MIN_VEC_MATCH means a match of that length starts at i
    (consuming match_len bytes); otherwise position i would emit a literal.
    """
    s = match_len.shape[0]
    idx = jnp.arange(s, dtype=jnp.int32)
    step = jnp.where(match_len >= MIN_VEC_MATCH, match_len, 1)
    step = jnp.where(idx < valid_len, step, 1)
    nxt = jnp.minimum(idx + step, s)
    # sentinel node s is an absorbing self-loop
    j = jnp.concatenate([nxt, jnp.array([s], jnp.int32)])
    visited = jnp.zeros(s + 1, jnp.int32).at[0].set(1)
    rounds = max(1, math.ceil(math.log2(s + 1)))
    for _ in range(rounds):
        visited = visited.at[j].max(visited)
        j = j[j]
    return (visited[:s] == 1) & (idx < valid_len)
