"""Device dynamic-Huffman DEFLATE block encoder (per-block code tables).

The static tier (ops/encode_v2.py) trades ratio for zero table state; this
tier adds per-block dynamic Huffman coding — the reference's dynamic-block
path (reference src/compress/mod.rs:1775-1883 header construction,
:509-541 per-block code tables) re-split for the TPU execution model:

  jit A  analyze_block — the shared match pipeline (sort matchfinder,
         run extension, token selection) plus per-block litlen/offset
         symbol HISTOGRAMS, computed as one extra sort + searchsorted
         (no scatter-add: binning 64K symbols into 288 bins is a sorted
         run-length count).
  host   dyn_tables_c (native/codec.c) — histograms (288+30 u32 per
         block, a few KB over the link) become optimal length-limited
         canonical code tables + the serialized dynamic header via
         package-merge; microseconds per block in C.
  jit B  emit_pack — tokens are coded through the per-block tables (two
         64K-element gathers — the one place gather wins: 288-entry
         tables stay in registers/VMEM) and bit-packed by the shared
         pack_rows MXU packer, starting at the header's bit length.

A match token can exceed 32 bits under dynamic codes (15+5 length part,
15+13 offset part), so it is emitted as TWO lanes: the length part at the
match position p, the offset part at p+1 (always a covered lane: matches
are >= 4 long, so p+1 carries no token of its own). The cumsum in
pack_rows then interleaves them in exactly DEFLATE's required order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..common import WINDOW_SIZE
from .encode_v2 import (
    MIN_MATCH,
    extend_runs,
    find_matches_v2,
    pack_rows,
    select_tokens,
)
from .static_codes import length_sym_fields, offset_sym_fields

U = jnp.uint32
ROW_OUT_DYN = 64      # 32 lanes x <=15-bit literals = 480 bits = 60 B max
NUM_LITLEN = 288
NUM_OFFSET = 30
_NOSYM_LL = NUM_LITLEN      # histogram discard bin
_NOSYM_OF = NUM_OFFSET


def _hist(sym: jnp.ndarray, nbins: int) -> jnp.ndarray:
    """Fixed-bin histogram without scatter-add: sort + run boundaries.
    `sym` may contain values == nbins (discard bin, not counted)."""
    ss = jnp.sort(sym)
    edges = jnp.arange(nbins + 1, dtype=sym.dtype)
    idx = jnp.searchsorted(ss, edges, side="left")
    return (idx[1:] - idx[:-1]).astype(jnp.int32)


def analyze_block(data_padded: jnp.ndarray, valid_len: jnp.ndarray,
                  block_size: int):
    """Match pipeline + per-block symbol histograms.

    Returns (ml, dist, sel, lit, ll_hist (288,), of_hist (30,)); the
    token arrays stay on device as inputs to emit_pack."""
    s = block_size
    ml, dist = find_matches_v2(data_padded, valid_len, s)
    ml = extend_runs(ml, dist, valid_len)
    ml, sel, lit = select_tokens(ml, dist, valid_len)

    lsym, _, _ = length_sym_fields(jnp.maximum(ml, MIN_MATCH))
    dsym, _, _ = offset_sym_fields(jnp.clip(dist, 1, WINDOW_SIZE))
    byte = data_padded[:s].astype(jnp.int32)
    hsym = jnp.where(sel, lsym, jnp.where(lit, byte, _NOSYM_LL))
    # saturating uint16 counts halve the histogram bytes crossing the
    # host link (the package-merge weights only need relative magnitude;
    # saturation at 65535 on a 64 KiB block is lossless in practice)
    ll_hist = jnp.minimum(_hist(hsym, NUM_LITLEN), 65535
                          ).astype(jnp.uint16)
    of_hist = jnp.minimum(_hist(jnp.where(sel, dsym, _NOSYM_OF),
                                NUM_OFFSET), 65535).astype(jnp.uint16)
    return ml, dist, sel, lit, ll_hist, of_hist


def emit_pack(data_padded: jnp.ndarray, ml: jnp.ndarray, dist: jnp.ndarray,
              sel: jnp.ndarray, lit: jnp.ndarray, ll_tab: jnp.ndarray,
              of_tab: jnp.ndarray, start_bits: jnp.ndarray,
              block_size: int):
    """Code the selected tokens through per-block tables and bit-pack.

    ll_tab (288,) / of_tab (30,): uint32 entries `code | len << 16`
    (codes bit-reversed for LSB-first emission). start_bits: bit length
    of the block's serialized header (body starts there).

    Returns (rows, byte_off, row_bit0, end_bits) from pack_rows."""
    s = block_size
    byte = data_padded[:s].astype(jnp.int32)
    lsym, lev, leb = length_sym_fields(jnp.maximum(ml, MIN_MATCH))
    dsym, dev, deb = offset_sym_fields(jnp.clip(dist, 1, WINDOW_SIZE))

    # litlen lane: literal byte or match-length symbol (+ extra bits)
    ent = ll_tab[jnp.where(sel, lsym, byte)]
    code = ent & U(0xFFFF)
    clen = ent >> U(16)
    val = code | (jnp.where(sel, lev, U(0)) << clen)
    nb = clen + jnp.where(sel, leb, U(0))
    active = sel | lit
    val = jnp.where(active, val, U(0))
    nb = jnp.where(active, nb, U(0)).astype(jnp.int32)

    # offset part rides the (always covered) next lane
    dent = of_tab[dsym]
    dcode = dent & U(0xFFFF)
    dlen = dent >> U(16)
    dval = jnp.where(sel, dcode | (dev << dlen), U(0))
    dnb = jnp.where(sel, dlen + deb, U(0)).astype(jnp.int32)
    val = val | jnp.concatenate([jnp.zeros(1, U), dval[:-1]])
    nb = nb + jnp.concatenate([jnp.zeros(1, jnp.int32), dnb[:-1]])

    return pack_rows(val, nb, start_bits, ROW_OUT_DYN)


@functools.lru_cache(maxsize=8)
def jit_analyze(block_size: int):
    f = functools.partial(analyze_block, block_size=block_size)
    return jax.jit(jax.vmap(f, in_axes=(0, 0)))


@functools.lru_cache(maxsize=8)
def jit_emit(block_size: int):
    f = functools.partial(emit_pack, block_size=block_size)
    return jax.jit(jax.vmap(f, in_axes=(0,) * 8))


def build_tables_host(ll_hist, of_hist, finals: np.ndarray):
    """Histograms -> (ll_tabs (B,288) u32, of_tabs (B,30) u32,
    headers list[bytes], hdr_bits (B,) int32). Native C fast path
    (dyn_tables_c), pure-Python package-merge fallback.

    Accepts device arrays: both histograms come down in ONE transfer —
    on a high-latency link two sequential np.asarray round trips would
    dominate the whole host step."""
    import jax

    ll_hist, of_hist = (np.asarray(x).astype(np.uint32) for x in
                        jax.device_get((ll_hist, of_hist)))
    from ..native import dyn_tables_native
    b = ll_hist.shape[0]
    ll_tabs = np.zeros((b, NUM_LITLEN), np.uint32)
    of_tabs = np.zeros((b, NUM_OFFSET), np.uint32)
    headers: list[bytes] = []
    hdr_bits = np.zeros(b, np.int32)
    for i in range(b):
        res = dyn_tables_native(ll_hist[i], of_hist[i], bool(finals[i]))
        if res is None:
            res = _build_tables_py(ll_hist[i], of_hist[i], bool(finals[i]))
        ll_tabs[i], of_tabs[i], hdr, hdr_bits[i] = res
        headers.append(hdr)
    return ll_tabs, of_tabs, headers, hdr_bits


def _build_tables_py(ll_hist: np.ndarray, of_hist: np.ndarray,
                     final: bool):
    """Pure-Python fallback mirroring native dyn_tables_c."""
    from ..models.portable.deflate import (
        TokenStream,
        _dynamic_header_tokens,
        _ensure_complete,
    )
    from ..models.portable.huffman import canonical_codes, make_huffman_code

    llf = ll_hist.astype(np.int64).copy()
    llf[256] += 1
    # litlen limited to 14 bits (matches native MAX_LL_LEN and the
    # reference's limit, src/compress/mod.rs:127-129, so fused
    # multi-symbol emit writes fit fixed-width words); offsets 15.
    ll_lens, _ = make_huffman_code(llf, 14)
    of_lens, _ = make_huffman_code(of_hist.astype(np.int64), 15)
    ll_lens = _ensure_complete(ll_lens)
    of_lens = _ensure_complete(of_lens)
    ll_codes = canonical_codes(ll_lens)
    of_codes = canonical_codes(of_lens)
    ts = TokenStream(0)
    ts.put((1 if final else 0) | 0b100, 3)         # BFINAL | BTYPE=10
    values, nbits, _ = _dynamic_header_tokens(ll_lens, of_lens)
    ts.put_arrays(values, nbits)
    hdr = ts.pack()
    bits = ts.bitcount
    ll_tab = ll_codes.astype(np.uint32) | (ll_lens.astype(np.uint32) << 16)
    of_tab = (of_codes[:NUM_OFFSET].astype(np.uint32)
              | (of_lens[:NUM_OFFSET].astype(np.uint32) << 16))
    return ll_tab, of_tab, hdr, bits
