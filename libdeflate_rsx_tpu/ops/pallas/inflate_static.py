"""Pallas TPU kernel: batch decode of stored/static-Huffman DEFLATE.

One grid cell decodes one independent stream — the device analog of the
reference's per-thread batch decompression (reference src/batch.rs) and
the inverse of the device encoder's output format (models/greedy_static.py
emits only stored and static-Huffman blocks, SYNC-joined).

Design: DEFLATE decode is bit-serial within a stream, so the kernel runs
a scalar symbol loop over SMEM-resident state (bit reader scalars, the
input stream packed as int32 words, and the output window packed as int32
words — SMEM supports the dynamic scalar indexing a bit-serial decoder
needs; VMEM does not). Static-code decode needs no tables: the litlen
code is inverted with closed-form arithmetic on 9 peeked bits.
Parallelism comes from the grid (streams decode independently), exactly
like the encoder's block parallelism.

Scope: BTYPE 00 (stored) and 01 (static); BTYPE 10 yields None and the
caller falls back to the host decoder.

Status: working prototype (verified byte-exact on TPU hardware against
the device encoder's output). Throughput is ~1 MB/s/stream — scalar SMEM
operations decode roughly one symbol per ~50 cycles and the grid runs
sequentially on a single core — so the production batch-decode path
remains the native host decoder (1.4-1.8 GB/s); this kernel is the
starting point for a future vectorized speculative decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IN_WORDS = 16384      # 64 KiB compressed cap per stream
OUT_WORDS = 16384 + 128   # 64 KiB + slack output cap per stream


def _kernel(len_ref, words_hbm, out_ref, in_s, out_s, sem):
    """Decode one stream per grid step: DMA the stream's words from HBM
    into SMEM scratch (scalar-indexable), run the bit-serial decode over
    SMEM, then vector-copy the finished row to the VMEM output. len_ref
    is the scalar-prefetch (B,) array of input byte lengths; the decoded
    byte count (or -1 on bad data) lands in the last output word."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    me = pl.program_id(0)
    in_len = len_ref[me]
    # output bound: the last word holds the decoded length, so the data
    # area is (OUT_WORDS - 1) words; a <=64 KiB stream can legally expand
    # ~1000x, so every write is guarded and over-cap streams decode to
    # bad=1 (the host wrapper returns None and callers fall back)
    out_cap = jnp.int32((OUT_WORDS - 1) * 4)
    dma = pltpu.make_async_copy(words_hbm.at[me], in_s, sem)  # (1, W)
    dma.start()
    dma.wait()

    U = jnp.uint32

    def getbyte(idx):
        w = in_s[0, idx >> 2].astype(U)
        return (w >> ((idx & 3) * 8).astype(U)) & U(0xFF)

    def outbyte_read(idx):
        w = out_s[0, idx >> 2].astype(U)
        return ((w >> ((idx & 3) * 8).astype(U)) & U(0xFF)).astype(jnp.int32)

    # state: (bitbuf, bitsleft, inpos, outpos, done, bad)
    def refill(st):
        bitbuf, bits, inpos, outpos, done, bad = st

        def body(s):
            bb, b, ip = s
            return (bb | (getbyte(ip) << b.astype(U)), b + 8, ip + 1)

        def cond(s):
            return (s[1] <= 24) & (s[2] < in_len)

        bitbuf, bits, inpos = jax.lax.while_loop(
            cond, body, (bitbuf, bits, inpos))
        return (bitbuf, bits, inpos, outpos, done, bad)

    def outwrite(outpos, byte):
        wi = outpos >> 2
        sh = (outpos & 3) * 8
        old = out_s[0, wi]
        out_s[0, wi] = (old & ~(0xFF << sh)) | ((byte & 0xFF) << sh)

    def step(st):
        st = refill(st)
        bitbuf, bits, inpos, outpos, done, bad = st
        hdr = (bitbuf & U(7)).astype(jnp.int32)
        bfinal = hdr & 1
        btype = (hdr >> 1) & 3
        bitbuf2 = bitbuf >> U(3)
        bits2 = bits - 3

        def do_stored(args):
            bitbuf, bits, inpos, outpos = args
            # align to byte: drop partial bits
            drop = bits & 7
            bitbuf = bitbuf >> drop.astype(U)
            bits = bits - drop
            st2 = refill((bitbuf, bits, inpos, outpos, 0, 0))
            bitbuf, bits, inpos = st2[0], st2[1], st2[2]
            ln = (bitbuf & U(0xFFFF)).astype(jnp.int32)
            nlen = ((bitbuf >> U(16)) & U(0xFFFF)).astype(jnp.int32)
            bad = jnp.where(ln != (~nlen & 0xFFFF), 1, 0)
            bitbuf = U(0)
            # bytes still in the bit buffer were consumed from inpos;
            # rewind so the copy reads from the byte stream directly
            inpos = inpos - ((bits - 32) >> 3)
            bits = jnp.int32(0)
            # bound both sides: truncated input and over-cap output
            bad = bad | jnp.where(inpos + ln > in_len, 1, 0) \
                | jnp.where(outpos + ln > out_cap, 1, 0)
            ln = jnp.where(bad == 1, 0, ln)

            def cp(i, op):
                outwrite(op, getbyte(inpos + i))
                return op + 1

            outpos = jax.lax.fori_loop(0, ln, cp, outpos)
            inpos = inpos + ln
            return (bitbuf, bits, inpos, outpos, bad)

        def do_static(args):
            bitbuf, bits, inpos, outpos = args

            def sym_cond(s):
                _, _, _, _, eob, bad2 = s
                return (eob == 0) & (bad2 == 0)

            def sym_body(s):
                bitbuf, bits, inpos, outpos, eob, bad2 = s
                st2 = refill((bitbuf, bits, inpos, outpos, 0, 0))
                bitbuf, bits, inpos = st2[0], st2[1], st2[2]
                # static litlen decode from up to 9 bits (LSB-first):
                # reverse 9 bits, then the canonical ranges identify len
                v = (bitbuf & U(0x1FF)).astype(jnp.int32)
                b0 = (v >> 0) & 1
                b1 = (v >> 1) & 1
                b2 = (v >> 2) & 1
                b3 = (v >> 3) & 1
                b4 = (v >> 4) & 1
                b5 = (v >> 5) & 1
                b6 = (v >> 6) & 1
                b7 = (v >> 7) & 1
                b8 = (v >> 8) & 1
                rev9 = (b0 << 8) | (b1 << 7) | (b2 << 6) | (b3 << 5) \
                    | (b4 << 4) | (b5 << 3) | (b6 << 2) | (b7 << 1) | b8
                rev7 = rev9 >> 2
                rev8 = rev9 >> 1
                # canonical static ranges (RFC 1951 3.2.6)
                is7 = rev7 < 0x18                    # syms 256-279
                is8a = (rev8 >= 0x30) & (rev8 < 0xC0)  # lits 0-143
                is8b = (rev8 >= 0xC0) & (rev8 < 0xC8)  # syms 280-287
                sym = jnp.where(
                    is7, 256 + rev7,
                    jnp.where(is8a, rev8 - 0x30,
                              jnp.where(is8b, 280 + (rev8 - 0xC0),
                                        144 + (rev9 - 0x190))))
                used = jnp.where(is7, 7, jnp.where(is8a | is8b, 8, 9))
                bitbuf = bitbuf >> used.astype(U)
                bits = bits - used

                def lit(args):
                    bitbuf, bits, inpos, outpos = args
                    over = jnp.where(outpos >= out_cap, 1, 0)
                    outwrite(jnp.minimum(outpos, out_cap - 1), sym)
                    return (bitbuf, bits, inpos, outpos + 1, 0, over)

                def eobf(args):
                    bitbuf, bits, inpos, outpos = args
                    return (bitbuf, bits, inpos, outpos, 1, 0)

                def match(args):
                    bitbuf, bits, inpos, outpos = args
                    st3 = refill((bitbuf, bits, inpos, outpos, 0, 0))
                    bitbuf, bits, inpos = st3[0], st3[1], st3[2]
                    ls = sym - 257
                    # length base/extra closed form
                    eb = jnp.where(ls < 8, 0,
                                   jnp.where(ls == 28, 0, (ls - 4) >> 2))
                    base = jnp.where(
                        ls < 8, ls + 3,
                        jnp.where(ls == 28, 258,
                                  ((4 + (ls & 3)) << eb) + 3))
                    mask = (U(1) << eb.astype(U)) - U(1)
                    length = base + (bitbuf & mask).astype(jnp.int32)
                    bitbuf = bitbuf >> eb.astype(U)
                    bits = bits - eb
                    # offset: 5-bit reversed symbol
                    ov = (bitbuf & U(0x1F)).astype(jnp.int32)
                    osym = ((ov & 1) << 4) | (((ov >> 1) & 1) << 3) \
                        | (((ov >> 2) & 1) << 2) | (((ov >> 3) & 1) << 1) \
                        | ((ov >> 4) & 1)
                    bitbuf = bitbuf >> U(5)
                    bits = bits - 5
                    st4 = refill((bitbuf, bits, inpos, outpos, 0, 0))
                    bitbuf, bits, inpos = st4[0], st4[1], st4[2]
                    oeb = jnp.maximum(osym // 2 - 1, 0)
                    obase = jnp.where(osym < 4, osym + 1,
                                      ((2 + (osym & 1)) << oeb) + 1)
                    omask = (U(1) << oeb.astype(U)) - U(1)
                    dist = obase + (bitbuf & omask).astype(jnp.int32)
                    bitbuf = bitbuf >> oeb.astype(U)
                    bits = bits - oeb
                    bad3 = jnp.where(dist > outpos, 1, 0) \
                        | jnp.where(outpos + length > out_cap, 1, 0)
                    length = jnp.where(bad3 == 1, 0, length)

                    def cp(i, op):
                        outwrite(op, outbyte_read(op - dist))
                        return op + 1

                    outpos2 = jax.lax.fori_loop(0, length, cp, outpos)
                    return (bitbuf, bits, inpos, outpos2, 0, bad3)

                return jax.lax.cond(
                    sym < 256, lit,
                    lambda a: jax.lax.cond(sym == 256, eobf, match, a),
                    (bitbuf, bits, inpos, outpos))

            out = jax.lax.while_loop(
                sym_cond, sym_body, (bitbuf, bits, inpos, outpos, 0, 0))
            return (out[0], out[1], out[2], out[3], out[5])

        bitbuf, bits, inpos, outpos, bad = jax.lax.cond(
            btype == 0, do_stored, do_static,
            (bitbuf2, bits2, inpos, outpos))
        bad = jnp.where(btype >= 2, 1, bad)
        done = jnp.where(bad == 1, 1, bfinal)
        return (bitbuf, bits, inpos, outpos, done, bad)

    def cond(st):
        _, bits, inpos, _, done, bad = st
        return (done == 0) & (bad == 0) & \
            ((inpos < in_len) | (bits >= 3))

    st0 = (jnp.uint32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
           jnp.int32(0), jnp.int32(0))
    st = jax.lax.while_loop(cond, step, st0)
    out_s[0, OUT_WORDS - 1] = jnp.where(st[5] == 1, -1, st[3])
    dma_out = pltpu.make_async_copy(out_s, out_ref.at[me], sem)
    dma_out.start()
    dma_out.wait()


@functools.lru_cache(maxsize=2)
def _jit_inflate():
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


def inflate_device_static(streams: list[bytes]) -> list[bytes | None]:
    """Decode a batch of stored/static DEFLATE streams on the device.

    Streams larger than the kernel caps, or using dynamic-Huffman blocks,
    yield None (callers fall back to the host decoder)."""
    b = len(streams)
    if b == 0:
        return []
    lens = np.zeros(b, np.int32)
    words = np.zeros((b, IN_WORDS), np.int32)
    ok = [True] * b
    for i, s in enumerate(streams):
        if len(s) > IN_WORDS * 4:
            ok[i] = False
            continue
        lens[i] = len(s)
        arr = np.frombuffer(s, np.uint8)
        pad = (-len(arr)) % 4
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
        words[i, : len(arr) // 4] = arr.view("<i4")
    import jax.numpy as jnp_

    out_words = np.asarray(_jit_inflate()(jnp_.asarray(lens),
                                          jnp_.asarray(words)))
    out_words = out_words.reshape(b, OUT_WORDS)
    out_lens = out_words[:, OUT_WORDS - 1]
    res: list[bytes | None] = []
    for i in range(b):
        n = int(out_lens[i])
        if not ok[i] or n < 0:
            res.append(None)
            continue
        res.append(out_words[i].view("<u1")[:n].tobytes())
    return res
