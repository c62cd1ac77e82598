"""Pallas TPU kernel: production batch DEFLATE decoder (all block types).

One grid cell decodes one independent stream — the device analog of the
reference's per-thread batch decompression (reference src/batch.rs:74-101)
and of its table-driven decode core (reference src/decompress/mod.rs:
509-1072, re-designed for the TPU scalar core).

Design
------
DEFLATE decode is bit-serial within a stream, so per-stream work runs as
a scalar symbol loop over SMEM-resident state; parallelism comes from the
grid (streams are independent). Unlike the round-1 prototype
(inflate_static.py: bit-serial static/stored only), this kernel is
*table-driven* and handles BTYPE 00/01/10:

- Decode tables are built IN-KERNEL from the compressed header (precode
  decode, RLE expansion, canonical fill) — no host pre-pass, no
  per-block host<->device traffic. The entry layout is the one proven in
  the host codec (native/codec.c build_table2):
    bits 0..4 codeword length, 5..7 type (0 literal, 1 base/extra,
    2 end-of-block, 3 subtable pointer), 8..15 extra bits / subtable
    bits, 16..31 payload (literal byte / base value / subtable base).
- Bit reading is word-based: `peek32` loads two int32 words from SMEM
  and funnel-shifts — no per-byte refill loop.
- Length/offset base+extra values come from closed-form arithmetic on
  the symbol index (no base/extra tables to ship).
- Every write is bounds-guarded; malformed streams set bad=1 and the
  host wrapper returns None (callers fall back to the host decoder, the
  reference's device->CPU fallback pattern, reference src/batch.rs:23-27).

Caps: 64 KiB compressed input, 64 KiB decoded output per stream (one
batch row each); streams beyond either cap yield None.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IN_WORDS = 16384            # 64 KiB compressed cap per stream
OUT_WORDS = 16384 + 128     # 64 KiB + slack; last word = count / -1
LL_WORDS = 4096             # 2048-entry root + 2048 subtable space
OF_WORDS = 2048             # 256-entry root + subtable space
PRE_WORDS = 128             # flat 7-bit precode table
LENS_WORDS = 320            # up to 286 + 30 code lengths

_LL_ROOT = 10
_OF_ROOT = 8

# entry field helpers (shared layout with native/codec.c)
_T_LIT = 0
_T_BASE = 1
_T_EOB = 2
_T_SUB = 3


def _kernel(len_ref, words_hbm, out_ref, in_s, out_s, ll_s, of_s, pre_s,
            lens_s, cnt_s, sem):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    me = pl.program_id(0)
    in_len = len_ref[me]
    in_bits = in_len * 8
    # data area excludes BOTH reserved trailer words (bad-flag at
    # OUT_WORDS-2, count at OUT_WORDS-1) — a stream decoding into the
    # flag word would otherwise report success with zeroed tail bytes
    out_cap = jnp.int32((OUT_WORDS - 2) * 4)

    dma = pltpu.make_async_copy(words_hbm.at[me], in_s, sem)
    dma.start()
    dma.wait()

    U = jnp.uint32
    I = jnp.int32

    def peek32(bitpos):
        """32 bits starting at bitpos (LSB-first), via funnel shift."""
        w = bitpos >> 5
        b = (bitpos & 31).astype(U)
        w0 = in_s[0, w & (IN_WORDS - 1)].astype(U)
        w1 = in_s[0, (w + 1) & (IN_WORDS - 1)].astype(U)
        lo = w0 >> b
        hi = jnp.where(b == U(0), U(0), w1 << (U(32) - b))
        return lo | hi

    def inbyte(idx):
        w = in_s[0, (idx >> 2) & (IN_WORDS - 1)].astype(U)
        return ((w >> ((idx & 3) * 8).astype(U)) & U(0xFF)).astype(I)

    def outwrite(pos, byte):
        wi = pos >> 2
        sh = (pos & 3) * 8
        old = out_s[0, wi]
        out_s[0, wi] = (old & ~(0xFF << sh)) | ((byte & 0xFF) << sh)

    def outread(pos):
        w = out_s[0, pos >> 2]
        return (w >> ((pos & 3) * 8)) & 0xFF

    def rev15(x):
        """Bit-reverse a 15-bit value (branchless swap ladder)."""
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 1   # 16-bit reversal -> 15-bit

    # closed-form litlen entry for symbol s (RFC 1951 3.2.5)
    def litlen_entry(sym):
        ls = sym - 257
        eb = jnp.where(ls < 8, 0, jnp.where(ls == 28, 0, (ls - 4) >> 2))
        base = jnp.where(ls < 8, ls + 3,
                         jnp.where(ls == 28, 258,
                                   ((4 + (ls & 3)) << eb) + 3))
        match_e = (base << 16) | (eb << 8) | (_T_BASE << 5)
        lit_e = (sym << 16) | (_T_LIT << 5)
        eob_e = jnp.int32(_T_EOB << 5)
        bad_e = jnp.int32(-1)   # syms 286/287: no decode
        return jnp.where(
            sym < 256, lit_e,
            jnp.where(sym == 256, eob_e,
                      jnp.where(sym <= 285, match_e, bad_e)))

    def offset_entry(sym):
        oeb = jnp.maximum(sym // 2 - 1, 0)
        obase = jnp.where(sym < 4, sym + 1, ((2 + (sym & 1)) << oeb) + 1)
        e = (obase << 16) | (oeb << 8) | (_T_BASE << 5)
        return jnp.where(sym <= 29, e, jnp.int32(-1))

    def build_table(tab, tab_words, root_bits, nsym, lens_at, entry_fn,
                    bad):
        """Canonical two-level table build from lens_s[lens_at + i].
        Returns bad flag ORed with over-subscription/overflow. The fill
        mirrors native/codec.c build_table2 (same entry layout)."""
        root_size = 1 << root_bits
        # counts per length
        for l in range(16):
            cnt_s[0, l] = 0

        def cnt_body(i, bd):
            l = lens_s[0, lens_at + i]
            cnt_s[0, l & 15] = cnt_s[0, l & 15] + 1
            return bd

        bad = jax.lax.fori_loop(0, nsym, cnt_body, bad)
        cnt_s[0, 0] = 0
        # Kraft sum (over-subscribed codes are invalid; incomplete ones
        # decode until an unassigned entry is referenced)
        def kraft(l, acc):
            return acc + (cnt_s[0, l] << (15 - l))

        used = jax.lax.fori_loop(1, 16, kraft, jnp.int32(0))
        bad = bad | jnp.where(used > (1 << 15), 32, 0)
        # first canonical code per length -> next[] in cnt_s cols 16..31
        def first_codes2(l, code):
            code = (code + cnt_s[0, l - 1]) << 1
            cnt_s[0, 16 + l] = code
            return code

        jax.lax.fori_loop(1, 16, first_codes2, jnp.int32(0))
        # clear root
        def clr(i, _):
            tab[0, i] = 0
            return 0

        jax.lax.fori_loop(0, root_size, clr, 0)
        # sub-table pre-pass: max code length per root prefix is needed
        # to size subtables; single-pass variant: track per-prefix via a
        # first scan storing max (len - root) in the subtable area is
        # complex — instead allocate per-prefix subtables at the MAX
        # remaining length seen so far by doing a pre-scan over symbols.
        # We reuse lens_s cols [lens_at..] read-only and a compact loop
        # writing submax into tab[0, root_size + prefix]? That aliases
        # the allocation area. Simpler: subtables sized per-prefix by
        # max length, computed by scanning symbols twice with the same
        # canonical code enumeration.
        def pre_body(i, carry):
            # carry: packed (nothing) — uses cnt_s[0,16+l] clone in
            # cols 32..47 untouched; we recompute next codes afterwards
            l = lens_s[0, lens_at + i]

            def do(c):
                code = cnt_s[0, 16 + l]
                cnt_s[0, 16 + l] = code + 1
                rev = rev15(code << (15 - l))
                prefix = rev & (root_size - 1)
                cur = tab[0, prefix]
                sub = l - root_bits
                tab[0, prefix] = jnp.maximum(cur, sub)
                return c

            def skip(c):
                # short/zero codes still consume canonical code space
                code = cnt_s[0, 16 + l]
                cnt_s[0, 16 + l] = code + jnp.where(l > 0, 1, 0)
                return c

            return jax.lax.cond(l > root_bits, do, skip, carry)

        jax.lax.fori_loop(0, nsym, pre_body, 0)
        # root now holds submax per prefix for long codes (>=1), else 0.
        # Recompute next codes and do the real fill.
        jax.lax.fori_loop(1, 16, first_codes2, jnp.int32(0))

        def fill_body(i, st):
            alloc, bd = st
            l = lens_s[0, lens_at + i]

            def place(st2):
                alloc, bd = st2
                code = cnt_s[0, 16 + l]
                cnt_s[0, 16 + l] = code + 1
                rev = rev15(code << (15 - l))
                ent = entry_fn(i)
                ent_ok = jnp.where(ent < 0, 0, ent | l)

                def root_fill(st3):
                    alloc, bd = st3
                    step = 1 << l

                    def rep(k, _):
                        # clamp: over-subscribed (bad) codes can push
                        # rev past the root; valid codes never do
                        tab[0, jnp.minimum(rev + k * step,
                                           root_size - 1)] = ent_ok
                        return 0

                    jax.lax.fori_loop(0, root_size >> l, rep, 0)
                    return (alloc, bd)

                def sub_fill(st3):
                    alloc, bd = st3
                    prefix = rev & (root_size - 1)
                    cur = tab[0, prefix]
                    is_ptr = ((cur >> 5) & 7) == _T_SUB
                    # on the first long code at this prefix, the slot
                    # still holds the pre-pass submax (= subtable bits);
                    # clamp so corrupt codes can't blow up the shift
                    sub_bits = jnp.clip(
                        jnp.where(is_ptr, (cur >> 8) & 255, cur & 31),
                        1, 15 - root_bits if root_bits < 15 else 1)
                    # first long code at this prefix: allocate
                    sub_base = jnp.where(is_ptr, (cur >> 16) & 0xFFFF,
                                         alloc)
                    new_alloc = jnp.where(is_ptr, alloc,
                                          alloc + (1 << sub_bits))
                    bd = bd | jnp.where(new_alloc > tab_words, 64, 0)

                    def init_sub(_):
                        def z(k, _):
                            tab[0, jnp.minimum(
                                sub_base + k,
                                tab_words - 1)] = 0
                            return 0

                        jax.lax.fori_loop(0, 1 << sub_bits, z, 0)
                        tab[0, prefix] = (sub_base << 16) \
                            | (sub_bits << 8) | (_T_SUB << 5)
                        return 0

                    jax.lax.cond(is_ptr | (bd != 0),
                                 lambda _: 0, init_sub, 0)
                    hi = rev >> root_bits
                    step = 1 << (l - root_bits)
                    nrep = jnp.where(
                        bd != 0, 0,
                        (1 << sub_bits) >> (l - root_bits))

                    def rep(k, _):
                        tab[0, jnp.minimum(sub_base + hi + k * step,
                                           tab_words - 1)] = ent_ok
                        return 0

                    jax.lax.fori_loop(0, nrep, rep, 0)
                    return (new_alloc, bd)

                return jax.lax.cond(l <= root_bits, root_fill, sub_fill,
                                    (alloc, bd))

            def skip(st2):
                return st2

            return jax.lax.cond(l > 0, place, skip, (alloc, bd))

        alloc, bad = jax.lax.fori_loop(0, nsym, fill_body,
                                       (jnp.int32(root_size), bad))
        return bad

    # ---------------- dynamic header parse ---------------------------
    def pre_perm(k):
        j = k - 3
        odd = 8 + (j - 1) // 2
        even = jnp.where(j == 0, 0, 8 - j // 2)
        return jnp.where(k < 3, 16 + k, jnp.where(j % 2 == 1, odd, even))

    def parse_dynamic(bitpos, bad):
        pk = peek32(bitpos)
        num_ll = (pk & U(31)).astype(I) + 257
        num_of = ((pk >> U(5)) & U(31)).astype(I) + 1
        ne = ((pk >> U(10)) & U(15)).astype(I) + 4
        bitpos = bitpos + 14
        bad = bad | jnp.where((num_ll > 286) | (num_of > 30), 8, 0)

        # precode lengths (3 bits each, permuted order)
        def zpre(k, _):
            lens_s[0, k] = 0
            return 0

        jax.lax.fori_loop(0, 19, zpre, 0)

        def rdpre(k, bp):
            v = (peek32(bp) & U(7)).astype(I)
            lens_s[0, pre_perm(k)] = v
            return bp + 3

        bitpos = jax.lax.fori_loop(0, ne, rdpre, bitpos)
        bad = bad | jnp.where(bitpos > in_bits, 16, 0)
        bad = build_table(pre_s, PRE_WORDS, 7, 19, 0,
                          lambda s: (s << 16) | (_T_LIT << 5), bad)

        # decode nl+nd code lengths with RLE
        tot = num_ll + num_of

        def rle_cond(st):
            i, bp, bd = st
            return (i < tot) & (bd == 0) & (bp <= in_bits)

        def rle_body(st):
            i, bp, bd = st
            e = pre_s[0, (peek32(bp) & U(127)).astype(I)]
            l = e & 31
            bd = bd | jnp.where(l == 0, 128, 0)
            bp = bp + l
            sym = (e >> 16) & 0xFFFF
            pk = peek32(bp)

            def lit_case(args):
                i, bp, bd = args
                lens_s[0, jnp.minimum(i, LENS_WORDS - 1)] = sym
                return (i + 1, bp, bd)

            def rep_case(args):
                i, bp, bd = args
                # 16: repeat prev 3-6 | 17: zeros 3-10 | 18: zeros 11-138
                is16 = sym == 16
                is17 = sym == 17
                ebits = jnp.where(is16, 2, jnp.where(is17, 3, 7))
                base = jnp.where(is16, 3, jnp.where(is17, 3, 11))
                rep = base + (pk & ((U(1) << ebits.astype(U)) - U(1))
                              ).astype(I)
                bp2 = bp + ebits
                prev = lens_s[0, jnp.maximum(i - 1, 0)]
                val = jnp.where(is16, prev, 0)
                bd = bd | jnp.where(is16 & (i == 0), 256, 0) \
                    | jnp.where(i + rep > tot, 256, 0)

                def w(k, _):
                    lens_s[0, jnp.minimum(i + k, LENS_WORDS - 1)] = val
                    return 0

                jax.lax.fori_loop(0, jnp.where(bd != 0, 0, rep), w, 0)
                return (i + rep, bp2, bd)

            return jax.lax.cond(sym <= 15, lit_case, rep_case,
                                (i, bp, bd))

        i, bitpos, bad = jax.lax.while_loop(
            rle_cond, rle_body, (jnp.int32(0), bitpos, bad))
        bad = bad | jnp.where(i != tot, 512, 0) | \
            jnp.where(bitpos > in_bits, 1024, 0)
        # litlen lens at 0..num_ll; move offset lens to a fixed base and
        # zero-pad both alphabets
        # shift-right with overlapping ranges (num_ll < 288 => source
        # overlaps destination): iterate DESCENDING so reads at
        # num_ll + k always happen before the slot is overwritten
        def move(kk, _):
            k = 29 - kk
            v = jnp.where(k < num_of, lens_s[0, num_ll + k], 0)
            lens_s[0, 288 + k] = v
            return 0

        jax.lax.fori_loop(0, 30, move, 0)

        # zero litlen lens from num_ll..288
        def zll(k, _):
            idx = num_ll + k
            lens_s[0, jnp.minimum(idx, 287)] = jnp.where(
                idx < 288, 0, lens_s[0, jnp.minimum(idx, 287)])
            return 0

        jax.lax.fori_loop(0, 288 - 257, zll, 0)
        bad = bad | jnp.where(lens_s[0, 256] == 0, 2048, 0)
        bad = build_table(ll_s, LL_WORDS, _LL_ROOT, 288, 0,
                          litlen_entry, bad)
        bad = build_table(of_s, OF_WORDS, _OF_ROOT, 30, 288,
                          offset_entry, bad)
        return bitpos, bad

    def load_static(bad):
        # RFC 1951 3.2.6 fixed code lengths
        def ll_len(k, _):
            lens_s[0, k] = jnp.where(
                k < 144, 8, jnp.where(k < 256, 9,
                                      jnp.where(k < 280, 7, 8)))
            return 0

        jax.lax.fori_loop(0, 288, ll_len, 0)

        def of_len(k, _):
            lens_s[0, 288 + k] = 5
            return 0

        jax.lax.fori_loop(0, 30, of_len, 0)
        bad = build_table(ll_s, LL_WORDS, _LL_ROOT, 288, 0,
                          litlen_entry, bad)
        bad = build_table(of_s, OF_WORDS, _OF_ROOT, 30, 288,
                          offset_entry, bad)
        return bad

    # ---------------- huffman block body ------------------------------
    def huffman_body(bitpos, outpos, bad):
        def cond(st):
            bp, op, eob, bd = st
            return (eob == 0) & (bd == 0) & (bp <= in_bits)

        def body(st):
            bp, op, eob, bd = st
            pk = peek32(bp)
            e = ll_s[0, (pk & U((1 << _LL_ROOT) - 1)).astype(I)]
            is_sub = ((e >> 5) & 7) == _T_SUB
            sub_idx = ((e >> 16) & 0xFFFF) + (
                (pk >> U(_LL_ROOT)).astype(I)
                & ((1 << ((e >> 8) & 255)) - 1))
            e2 = ll_s[0, jnp.minimum(jnp.where(is_sub, sub_idx, 0),
                                     LL_WORDS - 1)]
            e = jnp.where(is_sub, e2, e)
            l = e & 31
            ty = (e >> 5) & 7
            bd = bd | jnp.where(l == 0, 4096, 0)
            bp = bp + l

            def lit_case(args):
                bp, op, bd = args
                over = jnp.where(op >= out_cap, 32768, 0)
                outwrite(jnp.minimum(op, out_cap - 1), (e >> 16) & 0xFF)
                return (bp, op + 1, jnp.int32(0), bd | over)

            def eob_case(args):
                bp, op, bd = args
                return (bp, op, jnp.int32(1), bd)

            def match_case(args):
                bp, op, bd = args
                ebits = (e >> 8) & 255
                pk2 = peek32(bp)
                length = ((e >> 16) & 0xFFFF) + (
                    pk2 & ((U(1) << ebits.astype(U)) - U(1))).astype(I)
                bp = bp + ebits
                pk3 = peek32(bp)
                oe = of_s[0, (pk3 & U((1 << _OF_ROOT) - 1)).astype(I)]
                o_sub = ((oe >> 5) & 7) == _T_SUB
                o_idx = ((oe >> 16) & 0xFFFF) + (
                    (pk3 >> U(_OF_ROOT)).astype(I)
                    & ((1 << ((oe >> 8) & 255)) - 1))
                oe2 = of_s[0, jnp.minimum(jnp.where(o_sub, o_idx, 0),
                                          OF_WORDS - 1)]
                oe = jnp.where(o_sub, oe2, oe)
                ol = oe & 31
                bd = bd | jnp.where(ol == 0, 8192, 0) \
                    | jnp.where(((oe >> 5) & 7) != _T_BASE, 8192, 0)
                bp = bp + ol
                oeb = (oe >> 8) & 255
                pk4 = peek32(bp)
                off = ((oe >> 16) & 0xFFFF) + (
                    pk4 & ((U(1) << oeb.astype(U)) - U(1))).astype(I)
                bp = bp + oeb
                bd = bd | jnp.where(off > op, 16384, 0) \
                    | jnp.where(op + length > out_cap - 4, 32768, 0) \
                    | jnp.where(bp > in_bits, 65536, 0)
                n = jnp.where(bd != 0, 0, length)

                # word-at-a-time copy: align dst to a word boundary with
                # byte steps, then emit whole words (a full-word store
                # may spill garbage past the match end — positions not
                # yet produced, which later symbols overwrite; the final
                # output reads only op bytes). off < 4 would read bytes
                # produced within the same word, so it stays bytewise.
                head = jnp.where(off < 4, n,
                                 jnp.minimum((4 - (op & 3)) & 3, n))

                def cpb(k, _):
                    outwrite(op + k, outread(op + k - off))
                    return 0

                jax.lax.fori_loop(0, head, cpb, 0)
                nw = (n - head) >> 2

                def outword(pos):   # 32 bits at byte pos (like peek32)
                    w = pos >> 2
                    b = ((pos & 3) * 8).astype(U)
                    w0 = out_s[0, w].astype(U)
                    w1 = out_s[0, w + 1].astype(U)
                    lo = w0 >> b
                    hi = jnp.where(b == U(0), U(0), w1 << (U(32) - b))
                    return lo | hi

                def cpw(k, _):
                    dst = op + head + 4 * k
                    out_s[0, dst >> 2] = outword(dst - off).astype(I)
                    return 0

                jax.lax.fori_loop(0, nw, cpw, 0)

                def cpt(k, _):
                    p2 = op + head + 4 * nw + k
                    outwrite(p2, outread(p2 - off))
                    return 0

                jax.lax.fori_loop(0, n - head - 4 * nw, cpt, 0)
                return (bp, op + n, jnp.int32(0), bd)

            return jax.lax.cond(
                ty == _T_LIT, lit_case,
                lambda a: jax.lax.cond(ty == _T_EOB, eob_case,
                                       match_case, a),
                (bp, op, bd))

        bp, op, eob, bd = jax.lax.while_loop(
            cond, body, (bitpos, outpos, jnp.int32(0), bad))
        bd = bd | jnp.where(eob == 0, 131072, 0)
        return bp, op, bd

    # ---------------- stored block ------------------------------------
    def stored_body(bitpos, outpos, bad):
        bp = (bitpos + 7) & ~7
        pk = peek32(bp)
        ln = (pk & U(0xFFFF)).astype(I)
        nlen = ((pk >> U(16)) & U(0xFFFF)).astype(I)
        bad = bad | jnp.where(ln != ((~nlen) & 0xFFFF), 2, 0)
        bp = bp + 32
        start = bp >> 3
        bad = bad | jnp.where(start + ln > in_len, 4, 0) \
            | jnp.where(outpos + ln > out_cap, 4, 0)
        n = jnp.where(bad != 0, 0, ln)

        def cp(k, _):
            outwrite(outpos + k, inbyte(start + k))
            return 0

        jax.lax.fori_loop(0, n, cp, 0)
        return bp + 8 * n, outpos + n, bad

    # ---------------- block loop ---------------------------------------
    def blk_cond(st):
        bp, op, done, bd = st
        return (done == 0) & (bd == 0) & (bp + 3 <= in_bits)

    def blk_body(st):
        bp, op, done, bd = st
        hdr = (peek32(bp) & U(7)).astype(I)
        bp = bp + 3
        bfinal = hdr & 1
        btype = hdr >> 1
        bd = bd | jnp.where(btype == 3, 1, 0)

        def do_stored(args):
            bp, op, bd = args
            return stored_body(bp, op, bd)

        def do_huff(args):
            bp, op, bd = args

            def dyn(a):
                bp, bd = a
                return parse_dynamic(bp, bd)

            def sta(a):
                bp, bd = a
                return bp, load_static(bd)

            bp, bd = jax.lax.cond(btype == 2, dyn, sta, (bp, bd))
            return huffman_body(bp, op, bd)

        bp, op, bd = jax.lax.cond(btype == 0, do_stored, do_huff,
                                  (bp, op, bd))
        done = jnp.where(bd != 0, 1, bfinal)
        return (bp, op, done, bd)

    st = jax.lax.while_loop(
        blk_cond, blk_body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    bp, op, done, bd = st
    bd = bd | jnp.where(done == 0, 262144, 0)   # ran out of input mid-stream
    out_s[0, OUT_WORDS - 2] = bd
    out_s[0, OUT_WORDS - 1] = jnp.where(bd != 0, -1, op)
    dma_out = pltpu.make_async_copy(out_s, out_ref.at[me], sem)
    dma_out.start()
    dma_out.wait()


@functools.lru_cache(maxsize=4)
def _jit_inflate(batch: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run(lens, words):
        b = words.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((b, 1, OUT_WORDS),
                                   lambda i, l: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((1, IN_WORDS), jnp.int32),
                pltpu.SMEM((1, OUT_WORDS), jnp.int32),
                pltpu.SMEM((1, LL_WORDS), jnp.int32),
                pltpu.SMEM((1, OF_WORDS), jnp.int32),
                pltpu.SMEM((1, PRE_WORDS), jnp.int32),
                pltpu.SMEM((1, LENS_WORDS), jnp.int32),
                pltpu.SMEM((1, 32), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, 1, OUT_WORDS), jnp.int32),
            interpret=jax.default_backend() == "cpu",
        )(lens, words.reshape(b, 1, IN_WORDS))

    return jax.jit(run)


def inflate_device(streams: list[bytes]) -> list[bytes | None]:
    """Decode a batch of raw-DEFLATE streams (any block types) on the
    device. Streams over the caps, or that fail any validity check,
    yield None (callers fall back to the host decoder)."""
    b = len(streams)
    if b == 0:
        return []
    lens = np.zeros(b, np.int32)
    words = np.zeros((b, IN_WORDS), np.int32)
    ok = [True] * b
    for i, s in enumerate(streams):
        if len(s) > IN_WORDS * 4 or len(s) == 0:
            ok[i] = False
            continue
        lens[i] = len(s)
        arr = np.frombuffer(s, np.uint8)
        pad = (-len(arr)) % 4
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
        words[i, : len(arr) // 4] = arr.view("<i4")
    import jax.numpy as jnp_

    out_words = np.asarray(_jit_inflate(b)(jnp_.asarray(lens),
                                           jnp_.asarray(words)))
    out_words = out_words.reshape(b, OUT_WORDS)
    res: list[bytes | None] = []
    for i in range(b):
        n = int(out_words[i, OUT_WORDS - 1])
        if not ok[i] or n < 0:
            res.append(None)
            continue
        res.append(out_words[i].view("<u1")[:n].tobytes())
    return res
