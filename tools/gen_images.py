#!/usr/bin/env python3
"""Deterministic image corpus for m02/m07's REAL decode path.

Writes 64 tiny images (16x16, 8-bit RGB) into
src/main/resources/graft/media/: even ids as PNG (public spec,
RFC 2083 / W3C), odd ids as BMP (public BITMAPINFOHEADER layout) —
committed resources, so the Spark side reads them from the classpath
with zero cwd/fixture-path dependence.

The pixel content is a CLOSED-FORM function of (image id k, x, y):

    j = k % 48                      # ids 48..63 replicate 0..15 ...
    r = (j*3  + x*5  + y*7 ) % 256
    g = (j*11 + x*13 + y*17) % 256
    b = (j*19 + x*23 + y*29) % 256
    if k >= 48 and (x, y) == (0, 0):
        g = (g + 100) % 256         # ... perturbed in ONE pixel

so the DuckDB oracle can recompute every expected pixel from
arithmetic alone — no decoder on the oracle side — while the Spark
side must actually parse PNG filters / BMP bottom-up rows to match.
Any decode bug (wrong filter reconstruction, row order, channel
order, stride padding) shifts pixels positionally and breaks the
quadrant/grid sums the queries aggregate.

The k>=48 twin-with-one-pixel-changed construction gives m07's
perceptual-hash near-dup a known answer: 16 constructed pairs
(k, k-48) at hamming 0-2 after 2x2-block aHash, plus one accidental
(43,44) at hamming 3 — 17 pairs, verified by the reference
implementation at the bottom of this file (run the script to
regenerate AND re-verify).

PNG encoding exercises ALL FIVE row filters (filter type = y % 5) so
the Scala decoder's Sub/Up/Average/Paeth reconstruction is load-
bearing, not decorative. BMPs are 24bpp, bottom-up; width 16*3 = 48
bytes is already 4-byte aligned, so the corpus itself never pads —
an extra spec-only fixture img_pad_05x03.bmp (width 5 → stride 16,
one pad byte per row) covers the stride-padding path in
ImageCodecSpec without disturbing the 64-image query corpus.

Usage: python3 tools/gen_images.py   (idempotent, byte-stable output)
"""
import struct
import sys
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/main/resources/graft/media"
W = H = 16
N = 64


def pixel(k, x, y):
    j = k % 48
    r = (j * 3 + x * 5 + y * 7) % 256
    g = (j * 11 + x * 13 + y * 17) % 256
    b = (j * 19 + x * 23 + y * 29) % 256
    if k >= 48 and x == 0 and y == 0:
        g = (g + 100) % 256
    return r, g, b


def raw_rows(k):
    return [bytes(v for x in range(W) for v in pixel(k, x, y))
            for y in range(H)]


# ── PNG (8-bit RGB, color type 2, no interlace) ─────────────────────

def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def filter_row(ftype, row, prev):
    # bpp = 3; a = left, b = up, c = up-left (per the PNG spec)
    out = bytearray()
    for i, v in enumerate(row):
        a = row[i - 3] if i >= 3 else 0
        b = prev[i]
        c = prev[i - 3] if i >= 3 else 0
        if ftype == 0:
            f = v
        elif ftype == 1:
            f = (v - a) % 256
        elif ftype == 2:
            f = (v - b) % 256
        elif ftype == 3:
            f = (v - (a + b) // 2) % 256
        else:
            f = (v - paeth(a, b, c)) % 256
        out.append(f)
    return bytes(out)


def chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload +
            struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png_bytes(k):
    rows = raw_rows(k)
    prev = bytes(W * 3)
    stream = bytearray()
    for y, row in enumerate(rows):
        ftype = y % 5           # exercise every filter type
        stream.append(ftype)
        stream.extend(filter_row(ftype, row, prev))
        prev = row
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(stream), 9)) +
            chunk(b"IEND", b""))


# ── BMP (24bpp, BITMAPINFOHEADER, bottom-up, 4-byte row padding) ────

def bmp_bytes_from(rows, w, h):
    stride = (w * 3 + 3) & ~3
    pad = bytes(stride - w * 3)
    body = bytearray()
    for y in range(h - 1, -1, -1):     # bottom-up
        row = rows[y]
        for x in range(w):             # BGR order
            r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            body.extend((b, g, r))
        body.extend(pad)
    pixel_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(body),
                           0, 0, pixel_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + bytes(body)


def bmp_bytes(k):
    return bmp_bytes_from(raw_rows(k), W, H)


# ── reference aHash (the m07 oracle's expected pair structure) ──────

def ahash(k):
    cells = []
    for cy in range(8):
        for cx in range(8):
            s = 0
            for dy in range(2):
                for dx in range(2):
                    r, g, b = pixel(k, cx * 2 + dx, cy * 2 + dy)
                    s += r + 2 * g + b
            cells.append(s)
    mn = sum(cells) // 64
    return sum(1 << i for i, v in enumerate(cells) if v >= mn)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for k in range(N):
        if k % 2 == 0:
            (OUT / f"img_{k:02d}.png").write_bytes(png_bytes(k))
        else:
            (OUT / f"img_{k:02d}.bmp").write_bytes(bmp_bytes(k))
    # spec-only stride-padding fixture: 5x3, pixel = (x*40+y)%256 on all
    # three channels shifted — ImageCodecSpec pins the decoded values
    pad_rows = [bytes(v for x in range(5)
                      for v in ((x * 40 + y) % 256, (x * 7 + y * 3) % 256,
                                (x * 11 + y * 5) % 256))
                for y in range(3)]
    (OUT / "img_pad_05x03.bmp").write_bytes(bmp_bytes_from(pad_rows, 5, 3))
    hs = [ahash(k) for k in range(N)]
    pairs = [(a, b, bin(hs[a] ^ hs[b]).count("1"))
             for a in range(N) for b in range(a + 1, N)
             if bin(hs[a] ^ hs[b]).count("1") <= 3]
    print(f"[gen_images] wrote {N} images to {OUT}")
    print(f"[gen_images] expected m07 pairs (hamming<=3): {len(pairs)}")
    for p in pairs:
        print("   ", p)
    if len(pairs) != 17:
        print("[gen_images] UNEXPECTED pair count — formula drifted",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
