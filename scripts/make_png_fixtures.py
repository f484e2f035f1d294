"""Build the PNG pixel-level media fixtures for generate_media_png.

Two committed artifacts:

1. ``fixtures/media/png/img_###.png`` — a deterministic corpus of small
   PNGs written by an INDEPENDENT pure-python-int encoder (we pick the
   per-scanline filter bytes ourselves, cycling none/sub/up/average/paeth,
   and zlib-compress the filtered stream; IDAT deliberately split in two
   chunks).  Covers color types 0 (gray), 2 (RGB), 3 (palette),
   4 (gray+alpha) and 6 (RGBA), all 8-bit.  Because the encoder applies
   the filters with its own integer arithmetic, the engine's numpy
   unfiltering in ``multimodal.png_decoder`` is verified by inversion —
   any defilter bug breaks the hash.
2. ``fixtures/media_png_pairs.parquet`` — the all-pairs exact-EMD oracle
   over the 27-bin RGB color-cube histograms of the KNOWN pre-encode
   pixels (pure-int quantization via make_media_fixtures.hist27, EMD via
   the successive-shortest-path solver in fixture_solver.py — no shared
   code with the engine).

Usage: python scripts/make_png_fixtures.py
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_media_fixtures import BINS, hist27  # noqa: E402

_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
PNG_DIR = os.path.join(_FIXDIR, "media", "png")
OUT_PAIRS = os.path.join(_FIXDIR, "media_png_pairs.parquet")

N_IMAGES = 48


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(
    rows: list[list[tuple[int, ...]]],
    colortype: int,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Pure-int PNG writer: 8-bit, non-interlaced, filter type f = y % 5
    per scanline (all five filters exercised on every image tall enough)."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    h, w = len(rows), len(rows[0])
    bpp = channels
    raw = bytearray()
    prev = [0] * (w * channels)
    for y, rowpx in enumerate(rows):
        row = [c for px in rowpx for c in px]
        assert len(row) == w * channels
        f = y % 5
        raw.append(f)
        for x in range(len(row)):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - a) & 255
            elif f == 2:
                v = (row[x] - b) & 255
            elif f == 3:
                v = (row[x] - ((a + b) >> 1)) & 255
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (row[x] - pred) & 255
            raw.append(v)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if colortype == 3:
        out += _chunk(b"PLTE", bytes(c for rgb in palette for c in rgb))
    comp = zlib.compress(bytes(raw), 6)
    mid = max(1, len(comp) // 2)  # two IDAT chunks: exercise concatenation
    out += _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    out += _chunk(b"IEND", b"")
    return out


def synth_rgb(rng: np.random.Generator) -> np.ndarray:
    """Structured (h, w, 3) uint8 image: gradient + blob, like the PPM
    corpus — concentrated histograms, not uniform noise."""
    w = int(rng.integers(14, 29))
    h = int(rng.integers(11, 23))
    yy, xx = np.mgrid[0:h, 0:w]
    base = rng.integers(0, 256, size=3)
    grad = rng.standard_normal(3) * 40
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[:, :, c] = base[c] + grad[c] * (xx / w + yy / h) / 2
    cx, cy, r = rng.integers(0, w), rng.integers(0, h), rng.integers(3, 8)
    mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r**2
    blob = rng.integers(0, 256, size=3)
    for c in range(3):
        img[:, :, c] = np.where(mask, blob[c], img[:, :, c])
    return np.clip(img + rng.standard_normal(img.shape) * 8, 0, 255).astype(
        np.uint8
    )


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fixture_solver import ssp_emd

    rng = np.random.default_rng(20260814)
    os.makedirs(PNG_DIR, exist_ok=True)
    hists = []
    for i in range(N_IMAGES):
        img = synth_rgb(rng)
        h, w, _ = img.shape
        ct = [2, 2, 0, 3, 4, 6][i % 6]
        if ct == 2:
            rows = [[tuple(int(v) for v in img[y, x]) for x in range(w)]
                    for y in range(h)]
            rgb = [tuple(int(v) for v in img[y, x])
                   for y in range(h) for x in range(w)]
        elif ct == 0:
            g = img[:, :, 0]
            rows = [[(int(g[y, x]),) for x in range(w)] for y in range(h)]
            rgb = [(int(g[y, x]),) * 3 for y in range(h) for x in range(w)]
        elif ct == 4:
            g = img[:, :, 0]
            alpha = rng.integers(0, 256, size=(h, w))
            rows = [[(int(g[y, x]), int(alpha[y, x])) for x in range(w)]
                    for y in range(h)]
            rgb = [(int(g[y, x]),) * 3 for y in range(h) for x in range(w)]
        elif ct == 6:
            alpha = rng.integers(0, 256, size=(h, w))
            rows = [[tuple(int(v) for v in img[y, x]) + (int(alpha[y, x]),)
                     for x in range(w)] for y in range(h)]
            rgb = [tuple(int(v) for v in img[y, x])
                   for y in range(h) for x in range(w)]
        else:  # palette: quantize this image to <= 16 colors
            flat = img.reshape(-1, 3)
            q = (flat >> 6) << 6  # 4 levels/channel before palette build
            uniq, inv = np.unique(q, axis=0, return_inverse=True)
            if uniq.shape[0] > 256:
                raise AssertionError("palette overflow")
            palette = [tuple(int(v) for v in u) for u in uniq]
            idx = inv.reshape(h, w)
            rows = [[(int(idx[y, x]),) for x in range(w)] for y in range(h)]
            rgb = [palette[int(idx[y, x])]
                   for y in range(h) for x in range(w)]
        data = encode_png(rows, ct, palette if ct == 3 else None)
        with open(os.path.join(PNG_DIR, f"img_{i:03d}.png"), "wb") as f:
            f.write(data)
        hists.append(hist27(rgb))

    pts = np.array(
        [[r, g, b] for r in range(3) for g in range(3) for b in range(3)],
        dtype=np.float64,
    )
    diff = pts[:, None, :] - pts[None, :, :]
    C = np.sqrt((diff**2).sum(axis=2))
    W = np.array(hists)
    rid, sid, emd = [], [], []
    for i in range(N_IMAGES):
        for j in range(i + 1, N_IMAGES):
            rid.append(i)
            sid.append(j)
            emd.append(ssp_emd(W[i], W[j], C))
    tbl = pa.table(
        {
            "rid": pa.array(rid, type=pa.int64()),
            "sid": pa.array(sid, type=pa.int64()),
            "emd": pa.array(emd, type=pa.float64()),
        }
    )
    pq.write_table(tbl, OUT_PAIRS)
    e = np.array(emd)
    print(f"wrote {OUT_PAIRS}: {len(e)} pairs, range [{e.min():.4f}, {e.max():.4f}]")
    for th in (0.3, 0.5, 0.7, 1.0, 1.3):
        print(f"  pairs <= {th}+1e-4: {(e <= th + 1e-4).sum()}")
    frac = np.abs((e * 1e6) % 1 - 0.5)
    print("  min |frac-0.5| at 6dp:", frac.min())
    assert BINS == 27


if __name__ == "__main__":
    main()
