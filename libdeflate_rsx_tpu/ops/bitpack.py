"""Device bitstream packer: LSB-first variable-length token concatenation.

The TPU analog of the reference's 64-bit speculative bitbuffer writer
(reference src/compress/bitstream.rs): instead of a serial bit buffer, all
token bit-offsets come from one exclusive scan, and each token scatters its
shifted value into 5 byte planes. Bit ranges are disjoint, so scatter-ADD
equals scatter-OR and no carries can occur. 32-bit only (TPU has no native
uint64): a token is ≤ 31 bits, so value<<(start%8) spans ≤ 38 bits, split
into a 32-bit low part and a ≤6-bit high part.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_TOKEN_BITS = 31


def pack_tokens(values: jnp.ndarray, nbits: jnp.ndarray, out_bytes: int):
    """Pack (T,) uint32 values of (T,) int32 widths into a byte array.

    Tokens with nbits == 0 are skipped (their value is forced to 0).
    Returns (packed uint8 (out_bytes,), total_bits int32). The caller must
    size out_bytes ≥ ceil(total_bits/8) + 5; trailing bits are zero.
    """
    nbits = nbits.astype(jnp.int32)
    mask = (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1)
    vals = values & jnp.where(nbits == 32, jnp.uint32(0xFFFFFFFF), mask)
    ends = jnp.cumsum(nbits)
    starts = ends - nbits
    total_bits = ends[-1]
    shift = (starts % 8).astype(jnp.uint32)
    byte0 = starts // 8
    lo = vals << shift
    hi_raw = vals >> ((jnp.uint32(32) - shift) & jnp.uint32(31))
    hi = jnp.where(shift == 0, jnp.uint32(0), hi_raw)
    out = jnp.zeros(out_bytes, jnp.int32)
    for k in range(4):
        out = out.at[byte0 + k].add(
            ((lo >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32))
    out = out.at[byte0 + 4].add((hi & jnp.uint32(0xFF)).astype(jnp.int32))
    return out.astype(jnp.uint8), total_bits
