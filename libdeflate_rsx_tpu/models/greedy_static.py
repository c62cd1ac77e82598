"""TPU level-1 encoder: greedy parse + static Huffman, whole-block vector ops.

This is the flagship device model: each fixed-size block (default 64 KiB)
is encoded entirely with array ops — vectorized hash4 matchfinding
(ops/matchfinder.py), pointer-jumping greedy cover (ops/parse.py), fused
static-Huffman token composition, and the scan+scatter bit packer
(ops/bitpack.py). Blocks are independent (the reference's intra-buffer
chunk parallelism, reference src/compress/mod.rs:699-772) and joined with
SYNC flushes so their byte streams concatenate into one valid DEFLATE
stream; batches of blocks run under jax.vmap / shard_map.

Wire-format parity: the emitted stream is standard RFC 1951 static-Huffman
DEFLATE — decodable by any inflate, tested against CPython zlib.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    MAX_MATCH_LEN,
    LENGTH_TO_SYMBOL,
    LENGTH_SYM_BASE,
    LENGTH_SYM_EXTRA,
    OFFSET_SYM_BASE,
    OFFSET_SYM_EXTRA,
    static_litlen_lens,
)
from ..ops.bitpack import pack_tokens
from ..ops.matchfinder import BLOCK_PAD, MIN_VEC_MATCH, find_matches
from ..ops.parse import greedy_cover
from .portable.huffman import canonical_codes

DEFAULT_BLOCK = 65536
_OUT_FACTOR = 1.25  # worst case static: 9 bits/byte + headers


# ---------------------------------------------------------------------------
# Host-built constant tables (static Huffman)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _static_tables():
    ll_lens = static_litlen_lens()
    ll_codes = canonical_codes(ll_lens)  # bit-reversed canonical
    lit_code = ll_codes[:256].astype(np.uint32)
    lit_nbits = ll_lens[:256].astype(np.int32)
    eob_code = np.uint32(ll_codes[256])
    eob_nbits = np.int32(ll_lens[256])
    # per-length fused (code | extra << codelen, nbits) for lengths 0..258
    len_pack = np.zeros(MAX_MATCH_LEN + 1, np.uint32)
    len_nbits = np.zeros(MAX_MATCH_LEN + 1, np.int32)
    for l in range(3, MAX_MATCH_LEN + 1):
        sym = int(LENGTH_TO_SYMBOL[l])
        li = sym - 257
        extra = int(LENGTH_SYM_EXTRA[li])
        code = int(ll_codes[sym])
        clen = int(ll_lens[sym])
        len_pack[l] = code | ((l - int(LENGTH_SYM_BASE[li])) << clen)
        len_nbits[l] = clen + extra
    # offset symbol tables (static: 5-bit code = bit-reversed symbol)
    off_code = np.zeros(30, np.uint32)
    for s in range(30):
        r = 0
        c = s
        for _ in range(5):
            r = (r << 1) | (c & 1)
            c >>= 1
        off_code[s] = r
    off_extra = OFFSET_SYM_EXTRA.astype(np.int32)
    off_base = OFFSET_SYM_BASE.astype(np.int32)
    return (lit_code, lit_nbits, eob_code, eob_nbits, len_pack, len_nbits,
            off_code, off_extra, off_base)


def _bsr_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Index of highest set bit via the f32 exponent (exact for 1 <= x < 2^24)."""
    f = x.astype(jnp.float32)
    e = jax.lax.bitcast_convert_type(f, jnp.int32) >> 23
    return (e & 0xFF) - 127


def offset_symbol(dist: jnp.ndarray) -> jnp.ndarray:
    """DEFLATE offset symbol for distance >= 1 (no 32K-entry table gather)."""
    o = dist - 1
    b = _bsr_f32(jnp.maximum(o, 1))
    hi = 2 * b + ((o >> jnp.maximum(b - 1, 0)) & 1)
    return jnp.where(o < 4, o, hi).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Per-block encoder (vmapped over the batch)
# ---------------------------------------------------------------------------


def encode_block_static(data_padded: jnp.ndarray, valid_len: jnp.ndarray,
                        is_final: jnp.ndarray, block_size: int):
    """Encode one padded block as a static-Huffman DEFLATE block.

    Returns (packed bytes (OUT,), nbytes scalar). Ends byte-aligned: with a
    SYNC empty-stored-block if not final, plain zero padding if final.
    """
    t = _static_tables()
    (lit_code, lit_nbits, eob_code, eob_nbits, len_pack, len_nbits,
     off_code, off_extra, off_base) = (jnp.asarray(a) for a in t)
    s = block_size
    ml, dist = find_matches(data_padded, valid_len, s)
    sel = greedy_cover(ml, valid_len)
    is_match = sel & (ml >= MIN_VEC_MATCH)

    lit = data_padded[:s].astype(jnp.int32)
    v_lit = lit_code[lit]
    n_lit = lit_nbits[lit]

    mlc = jnp.clip(ml, 0, MAX_MATCH_LEN)
    lp = len_pack[mlc]
    ln = len_nbits[mlc]
    osym = offset_symbol(jnp.maximum(dist, 1))
    ocode = off_code[osym]
    oebits = off_extra[osym]
    oeval = (dist - off_base[osym]).astype(jnp.uint32)
    code_bits = ln.astype(jnp.uint32)
    v_m = lp | (ocode << code_bits) | (oeval << (code_bits + jnp.uint32(5)))
    n_m = ln + 5 + oebits

    v_pos = jnp.where(is_match, v_m, v_lit)
    n_pos = jnp.where(sel, jnp.where(is_match, n_m, n_lit), 0)

    # slots: [header][S positions][EOB][sync header][pad][LEN][NLEN]
    # non-final blocks append a SYNC empty stored block (3-bit header,
    # byte-align, LEN=0x0000, NLEN=0xFFFF); final blocks just byte-align.
    hdr_v = (jnp.where(is_final, jnp.uint32(1), jnp.uint32(0))
             | jnp.uint32(1 << 1))
    sync_hdr_bits = jnp.where(is_final, 0, 3)
    sync_bits = jnp.where(is_final, 0, 16)
    body_bits = 3 + jnp.sum(n_pos) + eob_nbits + sync_hdr_bits
    pad = (-body_bits) % 8
    values = jnp.concatenate([
        hdr_v[None], v_pos,
        eob_code[None],
        jnp.zeros(3, jnp.uint32),
        jnp.asarray([0xFFFF], jnp.uint32),
    ])
    nbits = jnp.concatenate([
        jnp.asarray([3], jnp.int32), n_pos,
        eob_nbits[None],
        sync_hdr_bits[None], pad[None], sync_bits[None], sync_bits[None],
    ])
    out_bytes = int(s * _OUT_FACTOR) + 16
    packed, total_bits = pack_tokens(values, nbits, out_bytes)
    return packed, total_bits // 8


@functools.lru_cache(maxsize=8)
def _jit_encoder(block_size: int):
    f = functools.partial(encode_block_static, block_size=block_size)
    return jax.jit(jax.vmap(f, in_axes=(0, 0, 0)))


# ---------------------------------------------------------------------------
# Host-facing batch entry
# ---------------------------------------------------------------------------


def _bucket(num: int) -> int:
    """Round the batch dimension up to a power of two to bound the number
    of compiled shapes (padding rows are discarded at assembly)."""
    b = 1
    while b < num:
        b *= 2
    return b


def blocks_of(data: bytes, block_size: int, bucket: bool = True):
    """Split one buffer into (padded_blocks, valid_lens, is_final) arrays."""
    n = len(data)
    num = max(1, -(-n // block_size))
    rows = _bucket(num) if bucket else num
    arr = np.zeros((rows, block_size + BLOCK_PAD), dtype=np.uint8)
    valid = np.zeros(rows, np.int32)
    flat = np.frombuffer(data, np.uint8)
    for b in range(num):
        lo = b * block_size
        hi = min(lo + block_size, n)
        arr[b, : hi - lo] = flat[lo:hi]
        valid[b] = hi - lo
    final = np.zeros(rows, bool)
    final[num - 1:] = True
    return arr, valid, final, num


def deflate_device_static(data: bytes, block_size: int = DEFAULT_BLOCK) -> bytes:
    """Whole-buffer raw-DEFLATE encode on the device (level-1 tier)."""
    arr, valid, final, num = blocks_of(data, block_size)
    enc = _jit_encoder(block_size)
    packed, nbytes = enc(jnp.asarray(arr), jnp.asarray(valid),
                         jnp.asarray(final))
    packed = np.asarray(packed)
    nbytes = np.asarray(nbytes)
    return b"".join(packed[b, : int(nbytes[b])].tobytes()
                    for b in range(num))
