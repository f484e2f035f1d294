"""Build the pixel-level media fixtures for generate_media_pixels.

Two committed artifacts:

1. ``fixtures/media/ppm/img_###.ppm`` — a deterministic corpus of small
   uncompressed PPM images (P6 binary + a few P3 ascii, some with header
   comments, mixed sizes/maxvals) synthesized from a seeded RNG.  These are
   the INPUT the Spark query reads through the real ``binaryFile`` source.
2. ``fixtures/media_pixels_pairs.parquet`` — the all-pairs exact-EMD oracle
   over the 27-bin (3x3x3 RGB cube) pixel histograms, computed by an
   INDEPENDENT re-implementation: header parsing + quantization in pure
   python ints (no numpy, no shared code with operators/multimodal.py) and
   EMD by the successive-shortest-path solver (scripts/fixture_solver.py —
   a different algorithm family from the engine's transportation simplex).

Also writes ``fixtures/media/wav/clip_###.wav`` (16-bit PCM) for the WAV
decoder tests.

Usage: python scripts/make_media_fixtures.py
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
PPM_DIR = os.path.join(_FIXDIR, "media", "ppm")
WAV_DIR = os.path.join(_FIXDIR, "media", "wav")
OUT_PAIRS = os.path.join(_FIXDIR, "media_pixels_pairs.parquet")

N_IMAGES = 72
BINS = 27  # 3x3x3 RGB cube — the reference's default d=3/B=27 shape


def synth_ppm(i: int, rng: np.random.Generator) -> bytes:
    """One deterministic structured image: colored gradient + blob, so the
    histograms are concentrated (like real photos), not uniform noise."""
    w = int(rng.integers(16, 33))
    h = int(rng.integers(12, 25))
    yy, xx = np.mgrid[0:h, 0:w]
    base = rng.integers(0, 256, size=3)
    grad = rng.standard_normal(3) * 40
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[:, :, c] = base[c] + grad[c] * (xx / w + yy / h) / 2
    # a blob of a second color
    cx, cy, r = rng.integers(0, w), rng.integers(0, h), rng.integers(3, 9)
    mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r**2
    blob = rng.integers(0, 256, size=3)
    for c in range(3):
        img[:, :, c] = np.where(mask, blob[c], img[:, :, c])
    img = np.clip(img + rng.standard_normal(img.shape) * 8, 0, 255).astype(
        np.uint8
    )
    maxval = 255 if i % 9 else 127  # exercise maxval rescaling
    if maxval != 255:
        img = (img.astype(np.int64) * maxval // 255).astype(np.uint8)
    if i % 11 == 0:  # a few ascii P3 files with a header comment
        body = " ".join(str(int(v)) for v in img.reshape(-1))
        return (
            f"P3\n# synthetic fixture {i}\n{w} {h}\n{maxval}\n{body}\n"
        ).encode()
    hdr = f"P6\n{w} {h}\n{maxval}\n".encode()
    if i % 7 == 0:
        hdr = f"P6\n# c{i}\n{w} {h} {maxval}\n".encode()
    return hdr + img.tobytes()


# --- independent parser/quantizer: pure-python ints, no numpy ------------


def parse_ppm_pixels(data: bytes) -> list[tuple[int, int, int]]:
    assert data[:2] in (b"P3", b"P6"), "magic"
    binary = data[:2] == b"P6"
    toks = []
    pos = 2
    while len(toks) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            nl = data.index(b"\n", pos)
            pos = nl + 1
            continue
        end = pos
        while end < len(data) and not data[end : end + 1].isspace():
            end += 1
        toks.append(data[pos:end])
        pos = end
    w, h, maxval = (int(t) for t in toks)
    pos += 1  # single whitespace after maxval
    vals: list[int] = []
    if binary:
        for k in range(w * h * 3):
            vals.append(data[pos + k])
    else:
        vals = [int(t) for t in data[pos - 1 :].split()[: w * h * 3]]
    if maxval != 255:
        vals = [v * 255 // maxval for v in vals]
    return [(vals[k], vals[k + 1], vals[k + 2]) for k in range(0, len(vals), 3)]


def hist27(pixels: list[tuple[int, int, int]]) -> list[float]:
    counts = [0] * BINS
    for r, g, b in pixels:
        counts[(r * 3 >> 8) * 9 + (g * 3 >> 8) * 3 + (b * 3 >> 8)] += 1
    n = len(pixels)
    return [c / n for c in counts]


def synth_wav(i: int, rng: np.random.Generator) -> bytes:
    n = int(rng.integers(500, 2000))
    t = np.arange(n)
    freq = rng.uniform(0.01, 0.2)
    amp = rng.uniform(0.2, 0.9)
    s = amp * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    pcm = np.clip(s * 32767, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fixture_solver import ssp_emd

    rng = np.random.default_rng(2026)
    os.makedirs(PPM_DIR, exist_ok=True)
    os.makedirs(WAV_DIR, exist_ok=True)
    hists = []
    for i in range(N_IMAGES):
        data = synth_ppm(i, rng)
        with open(os.path.join(PPM_DIR, f"img_{i:03d}.ppm"), "wb") as f:
            f.write(data)
        hists.append(hist27(parse_ppm_pixels(data)))
    for i in range(12):
        with open(os.path.join(WAV_DIR, f"clip_{i:03d}.wav"), "wb") as f:
            f.write(synth_wav(i, rng))

    # ground: L2 over the 3x3x3 quantization-level lattice, row-major
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
        sel = e <= th + 1e-4
        print(f"  pairs <= {th}+1e-4: {sel.sum()}")
    # 6-dp rounding safety: no pair within 1e-9 of a .5 ulp boundary
    frac = np.abs((e * 1e6) % 1 - 0.5)
    print("  min |frac-0.5| at 6dp:", frac.min())

    # --- spectral-audio oracle (round-9): same WAV corpus, frequency space
    out_audio = os.path.join(_FIXDIR, "media_audio_pairs.parquet")
    sh = []
    for i in range(12):
        with open(os.path.join(WAV_DIR, f"clip_{i:03d}.wav"), "rb") as f:
            sh.append(spectral_feature_dft(f.read(), AUDIO_BANDS))
    WS = np.array(sh)
    # ground: L1 distance between band indices (1-D frequency axis)
    bidx = np.arange(AUDIO_BANDS, dtype=np.float64).reshape(-1, 1)
    CA = np.abs(bidx - bidx.T)
    rida, sida, emda = [], [], []
    for i in range(12):
        for j in range(i + 1, 12):
            rida.append(i)
            sida.append(j)
            emda.append(ssp_emd(WS[i], WS[j], CA))
    pq.write_table(
        pa.table(
            {
                "rid": pa.array(rida, type=pa.int64()),
                "sid": pa.array(sida, type=pa.int64()),
                "emd": pa.array(emda, type=pa.float64()),
            }
        ),
        out_audio,
    )
    ea = np.array(emda)
    print(f"wrote {out_audio}: {len(ea)} pairs, range "
          f"[{ea.min():.4f}, {ea.max():.4f}]")
    for th in (0.5, 1.0, 2.0, 3.0, 4.0):
        print(f"  pairs <= {th}+1e-4: {(ea <= th + 1e-4).sum()}")
    fraca = np.abs((ea * 1e6) % 1 - 0.5)
    print("  min |frac-0.5| at 6dp:", fraca.min())


AUDIO_BANDS = 16
_SPECTRAL_FRAME = 256  # must match multimodal.AUDIO_SPECTRAL_FRAME


def spectral_feature_dft(wav: bytes, bins: int) -> np.ndarray:
    """INDEPENDENT re-implementation of the engine's spectral feature:
    same pipeline (channel-mean mono, 256-sample rectangular frames,
    per-frame power spectrum, frame mean, equal-width band pooling, L1
    normalize) but the transform is a DIRECT DFT — explicit cos/sin
    matmuls, a different algorithm family than numpy's FFT, so agreement
    is evidence, not tautology.  Parsing is its own struct walk too."""
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    i = 12
    nch, data = 1, b""
    while i + 8 <= len(wav):
        cid = wav[i:i + 4]
        sz = struct.unpack("<I", wav[i + 4:i + 8])[0]
        if cid == b"fmt ":
            nch = max(struct.unpack("<H", wav[i + 10:i + 12])[0], 1)
        elif cid == b"data":
            data = wav[i + 8:i + 8 + sz]
        i += 8 + sz + (sz & 1)
    s = np.frombuffer(data, "<i2").astype(np.float64)
    usable = (s.size // nch) * nch
    mono = s[:usable].reshape(-1, nch).mean(axis=1)
    fl = _SPECTRAL_FRAME
    if mono.size < fl:
        pad = np.zeros(fl)
        pad[:mono.size] = mono
        frames = pad.reshape(1, fl)
    else:
        frames = mono[: (mono.size // fl) * fl].reshape(-1, fl)
    k = np.arange(fl // 2 + 1).reshape(-1, 1)
    t = np.arange(fl).reshape(1, -1)
    ang = 2.0 * np.pi * k * t / fl
    re = frames @ np.cos(ang).T
    im = frames @ -np.sin(ang).T
    power = (re**2 + im**2).mean(axis=0)
    band = (np.arange(power.size) * bins) // power.size
    hist = np.zeros(bins)
    np.add.at(hist, band, power)
    return hist / hist.sum()


if __name__ == "__main__":
    main()
