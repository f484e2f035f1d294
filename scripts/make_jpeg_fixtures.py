"""Build the baseline-JPEG media fixtures for generate_media_jpeg.

Two committed artifacts:

1. ``fixtures/media/jpeg/img_###.jpg`` — a deterministic corpus of small
   baseline JPEGs written by an INDEPENDENT pure-python encoder: its own
   scalar forward DCT, quantization (Annex-K tables scaled to two quality
   levels), zigzag, Annex-K huffman coding, byte stuffing, and restart
   markers on some images.  Modes: grayscale, 4:4:4 color and 4:2:0
   color.  The engine's ``multimodal.jpeg_decoder`` shares NO code (and
   no tables — it reads DQT/DHT from the file).
2. ``fixtures/media_jpeg_pairs.parquet`` — the all-pairs exact-EMD oracle
   over the 27-bin RGB color-cube histograms of the EXPECTED DECODE,
   computed here with an independent scalar-loop IDCT + the JFIF color
   transform.  JPEG is lossy, so the contract is not round-tripping the
   source pixels but agreeing bit-for-bit on the decode of the committed
   bytes; a knife-edge guard asserts no pre-round sample sits within 1e-6
   of a .5 rounding boundary, so any IDCT association difference between
   the two implementations (BLAS matmul vs scalar loop, ~1e-12) cannot
   flip a pixel bucket.

Usage: python scripts/make_jpeg_fixtures.py
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_media_fixtures import BINS, hist27  # noqa: E402
from make_png_fixtures import synth_rgb  # noqa: E402

_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
JPEG_DIR = os.path.join(_FIXDIR, "media", "jpeg")
OUT_PAIRS = os.path.join(_FIXDIR, "media_jpeg_pairs.parquet")

N_IMAGES = 48

# ITU-T T.81 Annex K reference tables (public spec constants)
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]
# (counts per code length 1..16, symbol values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _huff_codes(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order."""
    counts, values = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        while self.nbits:
            self.put(1, 1)


def _fdct_scalar(block: np.ndarray) -> np.ndarray:
    """Scalar forward DCT-II with the JPEG normalization (independent of
    the decoder's matrix IDCT)."""
    out = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for v in range(8):
            cv = (1.0 / math.sqrt(2.0)) if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y, x]
                        * math.cos((2 * x + 1) * v * math.pi / 16.0)
                        * math.cos((2 * y + 1) * u * math.pi / 16.0)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def _idct_scalar(coef: np.ndarray) -> np.ndarray:
    """Scalar IDCT — the fixture's INDEPENDENT inverse (the decoder uses a
    basis-matrix matmul; association differs, values agree to ~1e-12)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
                for v in range(8):
                    cv = (1.0 / math.sqrt(2.0)) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * math.cos((2 * x + 1) * v * math.pi / 16.0)
                        * math.cos((2 * y + 1) * u * math.pi / 16.0)
                    )
            out[y, x] = 0.25 * s
    return out


def _scale_qt(base: list[int], quality: int) -> list[int]:
    """IJG-style quality scaling of an Annex-K table."""
    sc = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (b * sc + 50) // 100)) for b in base]


def _encode_block(
    bw: _BitWriter, qcoef_zz: list[int], dc_pred: int, dc_codes, ac_codes
) -> int:
    diff = qcoef_zz[0] - dc_pred
    s = diff if diff >= 0 else -diff
    size = s.bit_length()
    bw.put(*dc_codes[size])
    if size:
        v = diff if diff >= 0 else diff + (1 << size) - 1
        bw.put(v & ((1 << size) - 1), size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if qcoef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        c = qcoef_zz[k]
        if c == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        s = c if c >= 0 else -c
        size = s.bit_length()
        bw.put(*ac_codes[(run << 4) | size])
        v = c if c >= 0 else c + (1 << size) - 1
        bw.put(v & ((1 << size) - 1), size)
        run = 0
    if last_nz < 63:
        bw.put(*ac_codes[0x00])  # EOB
    return qcoef_zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(tc: int, th: int, spec) -> bytes:
    counts, values = spec
    return bytes([tc << 4 | th]) + bytes(counts) + bytes(values)


def encode_jpeg(
    img: np.ndarray,
    mode: str,
    quality: int,
    restart: int = 0,
) -> tuple[bytes, np.ndarray]:
    """Encode (h, w, 3) uint8 RGB as baseline JPEG; returns (bytes,
    expected-decode RGB (h, w, 3) int array) — the expected decode is
    computed with the scalar IDCT + replication upsampling + JFIF color
    transform, with a knife-edge assertion on every rounding boundary.
    mode: 'gray' | '444' | '420'."""
    h, w, _ = img.shape
    R = img[:, :, 0].astype(np.float64)
    G = img[:, :, 1].astype(np.float64)
    B = img[:, :, 2].astype(np.float64)
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = 128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B
    Cr = 128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B

    qly = _scale_qt(QT_LUMA, quality)
    qlc = _scale_qt(QT_CHROMA, quality)
    dcl = _huff_codes(HUFF_DC_LUMA)
    acl = _huff_codes(HUFF_AC_LUMA)
    dcc = _huff_codes(HUFF_DC_CHROMA)
    acc = _huff_codes(HUFF_AC_CHROMA)

    if mode == "gray":
        comps = [(1, 1, 1, 0, qly, dcl, acl)]
    elif mode == "444":
        comps = [
            (1, 1, 1, 0, qly, dcl, acl),
            (2, 1, 1, 1, qlc, dcc, acc),
            (3, 1, 1, 1, qlc, dcc, acc),
        ]
    elif mode == "420":
        comps = [
            (1, 2, 2, 0, qly, dcl, acl),
            (2, 1, 1, 1, qlc, dcc, acc),
            (3, 1, 1, 1, qlc, dcc, acc),
        ]
    else:
        raise ValueError(mode)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def comp_plane(cid):
        src = {1: Y, 2: Cb, 3: Cr}[cid]
        _, hs, vs, _, _, _, _ = next(c for c in comps if c[0] == cid)
        if hs < hmax or vs < vmax:
            # subsample by block averaging over the sampling ratio
            fy, fx = vmax // vs, hmax // hs
            hh = -(-h // fy) * fy
            ww = -(-w // fx) * fx
            p = np.zeros((hh, ww))
            p[:h, :w] = src
            p[h:hh, :w] = src[-1:, :]  # edge-replicate padding
            p[:, w:ww] = p[:, w - 1:w]
            src = p.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))
        th_, tw_ = mcuy * vs * 8, mcux * hs * 8
        p = np.zeros((th_, tw_))
        sh, sw = src.shape
        p[:sh, :sw] = src
        if sh < th_:
            p[sh:, :sw] = src[-1:, :]
        if sw < tw_:
            p[:, sw:] = p[:, sw - 1:sw]
        return p

    plane = {c[0]: comp_plane(c[0]) for c in comps}
    qzz = {c[0]: [c[4][k] for k in range(64)] for c in comps}

    bw = _BitWriter()
    dc_pred = {c[0]: 0 for c in comps}
    dec_coef: dict[int, np.ndarray] = {
        c[0]: np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8)) for c in comps
    }
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.align()
                bw.out.append(0xFF)
                bw.out.append(0xD0 + (rst_n & 7))
                rst_n += 1
                dc_pred = {c[0]: 0 for c in comps}
            mcu_count += 1
            for cid, hs, vs, _tq, qtab, dct, act in comps:
                for byy in range(vs):
                    for bxx in range(hs):
                        y0 = (my * vs + byy) * 8
                        x0 = (mx * hs + bxx) * 8
                        blk = plane[cid][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = _fdct_scalar(blk)
                        qc = [
                            int(round(coef.reshape(-1)[ZIGZAG[k]] / qtab[k]))
                            for k in range(64)
                        ]
                        dc_pred[cid] = _encode_block(
                            bw, qc, dc_pred[cid],
                            dct, act,
                        )
                        # expected dequantized coefficients for the decode
                        deq = np.zeros(64)
                        for k in range(64):
                            deq[ZIGZAG[k]] = qc[k] * qtab[k]
                        dec_coef[cid][y0:y0 + 8, x0:x0 + 8] = _idct_scalar(
                            deq.reshape(8, 8)
                        ) + 128.0
    bw.align()

    # container
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qly))
    if mode != "gray":
        out += _seg(0xDB, bytes([1]) + bytes(qlc))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, hs, vs, tq, _, _, _ in comps:
        sof += bytes([cid, hs << 4 | vs, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, HUFF_DC_LUMA))
    out += _seg(0xC4, _dht_payload(1, 0, HUFF_AC_LUMA))
    if mode != "gray":
        out += _seg(0xC4, _dht_payload(0, 1, HUFF_DC_CHROMA))
        out += _seg(0xC4, _dht_payload(1, 1, HUFF_AC_CHROMA))
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for cid, _, _, _, _, _, _ in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"

    # expected decode: replication upsample, crop, color transform
    full = {}
    for cid, hs, vs, _, _, _, _ in comps:
        p = dec_coef[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:h, :w]

    def guard_round(x: np.ndarray) -> np.ndarray:
        frac = np.abs(x - np.floor(x) - 0.5)
        assert frac.min() > 1e-6, "knife-edge sample: regenerate the corpus"
        return np.clip(np.round(x), 0, 255).astype(np.int64)

    if mode == "gray":
        g = guard_round(full[1])
        exp = np.stack([g, g, g], axis=2)
    else:
        Yd = full[1]
        Cbd = full[2] - 128.0
        Crd = full[3] - 128.0
        exp = np.stack(
            [
                guard_round(Yd + 1.402 * Crd),
                guard_round(Yd - 0.344136 * Cbd - 0.714136 * Crd),
                guard_round(Yd + 1.772 * Cbd),
            ],
            axis=2,
        )
    return bytes(out), exp


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fixture_solver import ssp_emd

    rng = np.random.default_rng(20260815)
    os.makedirs(JPEG_DIR, exist_ok=True)
    hists = []
    for i in range(N_IMAGES):
        img = synth_rgb(rng)
        mode = ["444", "420", "gray", "444", "420", "444"][i % 6]
        quality = [75, 90, 60, 50, 75, 85][i % 6]
        restart = [0, 0, 2, 3, 0, 0][i % 6]
        data, exp = encode_jpeg(img, mode, quality, restart=restart)
        with open(os.path.join(JPEG_DIR, f"img_{i:03d}.jpg"), "wb") as f:
            f.write(data)
        rgb = [tuple(int(v) for v in exp[y, x])
               for y in range(exp.shape[0]) for x in range(exp.shape[1])]
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

    # --- progressive corpus (round-7): same contract, SOF2 multi-scan ---
    jpeg2_dir = os.path.join(_FIXDIR, "media", "jpeg2")
    out_pairs2 = os.path.join(_FIXDIR, "media_jpeg2_pairs.parquet")
    os.makedirs(jpeg2_dir, exist_ok=True)
    n2 = 24
    hists2 = []
    for i in range(n2):
        img = synth_rgb(rng)  # rng continues after the baseline corpus
        mode = ["444", "420", "gray"][i % 3]
        quality = [75, 90, 60, 85][i % 4]
        rst = [0, 0, 3][i % 3]
        data, exp = encode_jpeg_progressive(img, mode, quality, dc_restart=rst)
        with open(os.path.join(jpeg2_dir, f"img_{i:03d}.jpg"), "wb") as f:
            f.write(data)
        rgb = [tuple(int(v) for v in exp[y, x])
               for y in range(exp.shape[0]) for x in range(exp.shape[1])]
        hists2.append(hist27(rgb))
    W2 = np.array(hists2)
    rid2, sid2, emd2 = [], [], []
    for i in range(n2):
        for j in range(i + 1, n2):
            rid2.append(i)
            sid2.append(j)
            emd2.append(ssp_emd(W2[i], W2[j], C))
    pq.write_table(
        pa.table(
            {
                "rid": pa.array(rid2, type=pa.int64()),
                "sid": pa.array(sid2, type=pa.int64()),
                "emd": pa.array(emd2, type=pa.float64()),
            }
        ),
        out_pairs2,
    )
    e2 = np.array(emd2)
    print(f"wrote {out_pairs2}: {len(e2)} pairs, range "
          f"[{e2.min():.4f}, {e2.max():.4f}]")
    for th in (0.3, 0.5, 0.7, 1.0, 1.3):
        print(f"  pairs <= {th}+1e-4: {(e2 <= th + 1e-4).sum()}")
    frac2 = np.abs((e2 * 1e6) % 1 - 0.5)
    print("  min |frac-0.5| at 6dp:", frac2.min())

    # --- arithmetic corpus (round-9): same contract, SOF9 QM coding ---
    jpeg3_dir = os.path.join(_FIXDIR, "media", "jpeg_arith")
    out_pairs3 = os.path.join(_FIXDIR, "media_jpeg_arith_pairs.parquet")
    os.makedirs(jpeg3_dir, exist_ok=True)
    n3 = 24
    hists3 = []
    for i in range(n3):
        img = synth_rgb(rng)  # rng continues after the progressive corpus
        mode = ["444", "420", "gray"][i % 3]
        quality = [75, 90, 60, 85][i % 4]
        rst = [0, 0, 3, 0, 2][i % 5]
        kx = [5, 5, 5, 3, 8][i % 5]  # non-default Kx exercises DAC parsing
        data, exp = encode_jpeg_arith(img, mode, quality, restart=rst, kx=kx)
        with open(os.path.join(jpeg3_dir, f"img_{i:03d}.jpg"), "wb") as f:
            f.write(data)
        rgb = [tuple(int(v) for v in exp[y, x])
               for y in range(exp.shape[0]) for x in range(exp.shape[1])]
        hists3.append(hist27(rgb))
    W3 = np.array(hists3)
    rid3, sid3, emd3 = [], [], []
    for i in range(n3):
        for j in range(i + 1, n3):
            rid3.append(i)
            sid3.append(j)
            emd3.append(ssp_emd(W3[i], W3[j], C))
    pq.write_table(
        pa.table(
            {
                "rid": pa.array(rid3, type=pa.int64()),
                "sid": pa.array(sid3, type=pa.int64()),
                "emd": pa.array(emd3, type=pa.float64()),
            }
        ),
        out_pairs3,
    )
    e3 = np.array(emd3)
    print(f"wrote {out_pairs3}: {len(e3)} pairs, range "
          f"[{e3.min():.4f}, {e3.max():.4f}]")
    for th in (0.3, 0.5, 0.7, 1.0, 1.3):
        print(f"  pairs <= {th}+1e-4: {(e3 <= th + 1e-4).sum()}")
    frac3 = np.abs((e3 * 1e6) % 1 - 0.5)
    print("  min |frac-0.5| at 6dp:", frac3.min())

    # --- AVI-MJPEG video corpus (round-9): frame-mean feature space ---
    video_dir = os.path.join(_FIXDIR, "media", "video")
    out_pairs4 = os.path.join(_FIXDIR, "media_video_pairs.parquet")
    os.makedirs(video_dir, exist_ok=True)
    n4 = 16
    hists4 = []
    for i in range(n4):
        n_frames = [3, 4, 5, 6][i % 4]
        mode = ["444", "gray", "420"][i % 3]
        quality = [75, 90, 60][i % 3]
        frames, fhists = [], []
        base = synth_rgb(rng)  # rng continues after the arith corpus
        for t in range(n_frames):
            # temporal evolution: roll the base frame so consecutive
            # frames are correlated (video-like), not independent draws
            img = np.roll(base, shift=3 * t, axis=1)
            data, exp = encode_jpeg(img, mode, quality)
            if (i + t) % 2 == 1:
                # MJPEG convention: strip DHT; the decoder must splice the
                # Annex-K tables and reproduce the same decode exactly
                data = _strip_dht(data)
            frames.append(data)
            rgb = [tuple(int(v) for v in exp[y, x])
                   for y in range(exp.shape[0]) for x in range(exp.shape[1])]
            fhists.append(hist27(rgb))
        h_img, w_img = base.shape[:2]
        avi = write_avi_mjpeg(frames, w_img, h_img)
        with open(os.path.join(video_dir, f"vid_{i:03d}.avi"), "wb") as f:
            f.write(avi)
        # expected video feature: unweighted mean of per-frame histograms
        # (same accumulation the engine uses: float64 np.mean over frames)
        hists4.append(np.mean(np.array(fhists, dtype=np.float64), axis=0))
    W4 = np.array(hists4)
    rid4, sid4, emd4 = [], [], []
    for i in range(n4):
        for j in range(i + 1, n4):
            rid4.append(i)
            sid4.append(j)
            emd4.append(ssp_emd(W4[i], W4[j], C))
    pq.write_table(
        pa.table(
            {
                "rid": pa.array(rid4, type=pa.int64()),
                "sid": pa.array(sid4, type=pa.int64()),
                "emd": pa.array(emd4, type=pa.float64()),
            }
        ),
        out_pairs4,
    )
    e4 = np.array(emd4)
    print(f"wrote {out_pairs4}: {len(e4)} pairs, range "
          f"[{e4.min():.4f}, {e4.max():.4f}]")
    for th in (0.3, 0.5, 0.7, 1.0, 1.3):
        print(f"  pairs <= {th}+1e-4: {(e4 <= th + 1e-4).sum()}")
    frac4 = np.abs((e4 * 1e6) % 1 - 0.5)
    print("  min |frac-0.5| at 6dp:", frac4.min())




# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — round-7, the last S6 sliver.
#
# Same INDEPENDENT-implementation contract as the baseline encoder above:
# the engine's decoder shares no code and reads every table from the file.
# The scan script mirrors the common libjpeg shape — DC first at Al=1,
# banded AC first scans at Al=2, two one-bit AC refinement passes, DC
# refinement — so all four T.81 G.2 scan kinds (DC/AC x first/refine),
# spectral selection, successive approximation, true EOB-runs with
# buffered correction bits, and a restarted DC scan are all exercised.
# AC scans use per-scan CUSTOM canonical huffman tables (fixed-length
# codes over exactly the symbols the scan emits) because the Annex-K
# tables lack the (r, 0) EOB-run symbols progressive coding needs.
# ---------------------------------------------------------------------------


def _custom_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """(counts, values) canonical DHT spec: every symbol at one fixed code
    length L = ceil(log2(n+1)) — Kraft-satisfying, never the all-ones
    code (n < 2^L), trivially canonical."""
    vals = sorted(symbols)
    n = len(vals)
    L = max(1, (n + 1 - 1).bit_length()) if n else 1
    while (1 << L) <= n:
        L += 1
    counts = [0] * 16
    counts[L - 1] = n
    return counts, vals


class _ScanEncoder:
    """One progressive scan's entropy stream with EOB-run + correction-bit
    buffering (the T.81 G emission discipline).  With ``codes=None`` it
    runs in RECORD mode: no bits are written, the huffman symbols the scan
    would emit accumulate in ``recorded`` — pass 1 of the two-pass custom-
    table build (the emission logic itself is the single source of truth
    for which symbols a scan needs, EOB-run codes included)."""

    def __init__(self, bw, codes: dict | None):
        self.bw = bw
        self.codes = codes
        self.recorded: set[int] = set()
        self.eobrun = 0
        self.bits: list[int] = []  # correction bits buffered across EOB units

    def sym(self, s: int) -> None:
        if self.codes is None:
            self.recorded.add(s)
            return
        self.bw.put(*self.codes[s])

    def flush_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            self.bw.put(b, 1)
        self.bits = []


class _NullBW:
    """Bit sink for _ScanEncoder record mode."""

    def put(self, code: int, length: int) -> None:
        pass

    def align(self) -> None:
        pass


def _enc_ac_first(se_: _ScanEncoder, a, sign, ss, se, al) -> None:
    """AC first scan for one block: run-length code the [ss, se] band of
    (abs >> al), accumulating cross-block EOB-runs."""
    vals = [(a[k] >> al) for k in range(ss, se + 1)]
    last = -1
    for idx, v in enumerate(vals):
        if v:
            last = idx
    if last < 0:
        se_.eobrun += 1
        if se_.eobrun == 0x7FFF:
            se_.flush_eobrun()
        return
    se_.flush_eobrun()
    r = 0
    for idx in range(last + 1):
        v = vals[idx]
        if v == 0:
            r += 1
            continue
        while r > 15:
            se_.sym(0xF0)
            r -= 16
        s = v.bit_length()
        se_.sym((r << 4) | s)
        k = ss + idx
        bits = v if sign[k] >= 0 else (~v & ((1 << s) - 1))
        se_.bw.put(bits, s)
        r = 0
    if last < se - ss:
        se_.eobrun += 1
        if se_.eobrun == 0x7FFF:
            se_.flush_eobrun()


def _enc_ac_refine(se_: _ScanEncoder, a, sign, ss, se, ah, al) -> None:
    """AC refinement scan for one block (T.81 G.7.2), emitted in exactly
    the order the decoder consumes it: newly-significant coefficients as
    (r, 1)+sign where r counts ZERO-HISTORY slots only; each ZRL carries
    the correction bits of the already-significant coefficients crossed
    inside ITS 16-zero window (decoder-window-consistent buffering); the
    remaining window's bits follow the (r, 1) code's sign bit; a block
    ending in zeros/corrections folds into the cross-block EOB-run whose
    correction bits buffer until the run flushes."""
    # event sequence since the last emitted code: ('z',) zero-history slot,
    # ('b', bit) correction bit of an already-significant slot
    seq: list = []
    r = 0
    for k in range(ss, se + 1):
        v = a[k] >> al
        hv = a[k] >> ah
        if hv:
            seq.append(v & 1)  # correction bit (int)
            continue
        if v == 0:
            seq.append(None)  # zero-history slot
            r += 1
            continue
        # newly significant: magnitude exactly 1 at Ah = Al+1
        se_.flush_eobrun()
        while r > 15:
            se_.sym(0xF0)
            zseen = 0
            while zseen < 16:
                it = seq.pop(0)
                if it is None:
                    zseen += 1
                else:
                    se_.bw.put(it, 1)
            r -= 16
        se_.sym((r << 4) | 1)
        se_.bw.put(1 if sign[k] >= 0 else 0, 1)
        for it in seq:  # remaining r zeros interleave these bits
            if it is not None:
                se_.bw.put(it, 1)
        seq = []
        r = 0
    if seq:
        # trailing zeros / correction bits: one EOB-run unit; its bits
        # buffer until the run flushes (decoder reads them in its
        # pending-EOB tail, block order == buffer order)
        se_.eobrun += 1
        se_.bits.extend(it for it in seq if it is not None)
        if se_.eobrun == 0x7FFF:
            se_.flush_eobrun()


def encode_jpeg_progressive(
    img: np.ndarray,
    mode: str,
    quality: int,
    dc_restart: int = 0,
) -> tuple[bytes, np.ndarray]:
    """Encode (h, w, 3) uint8 RGB as PROGRESSIVE JPEG (SOF2); returns
    (bytes, expected-decode RGB) — the quantized coefficients (and so the
    expected decode, computed with the scalar IDCT + knife-edge guard) are
    IDENTICAL to the baseline encoder's at the same (mode, quality):
    progressive transmission reorders bits, never values.  ``dc_restart``
    puts a DRI/RSTn interval on the first (DC) scan."""
    h, w, _ = img.shape
    R = img[:, :, 0].astype(np.float64)
    G = img[:, :, 1].astype(np.float64)
    B = img[:, :, 2].astype(np.float64)
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = 128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B
    Cr = 128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B

    qly = _scale_qt(QT_LUMA, quality)
    qlc = _scale_qt(QT_CHROMA, quality)
    if mode == "gray":
        comps = [(1, 1, 1, 0, qly)]
    elif mode == "444":
        comps = [(1, 1, 1, 0, qly), (2, 1, 1, 1, qlc), (3, 1, 1, 1, qlc)]
    elif mode == "420":
        comps = [(1, 2, 2, 0, qly), (2, 1, 1, 1, qlc), (3, 1, 1, 1, qlc)]
    else:
        raise ValueError(mode)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def comp_plane(cid):
        src = {1: Y, 2: Cb, 3: Cr}[cid]
        _, hs, vs, _, _ = next(c for c in comps if c[0] == cid)
        if hs < hmax or vs < vmax:
            fy, fx = vmax // vs, hmax // hs
            hh = -(-h // fy) * fy
            ww = -(-w // fx) * fx
            p = np.zeros((hh, ww))
            p[:h, :w] = src
            p[h:hh, :w] = src[-1:, :]
            p[:, w:ww] = p[:, w - 1:w]
            src = p.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))
        th_, tw_ = mcuy * vs * 8, mcux * hs * 8
        p = np.zeros((th_, tw_))
        sh, sw = src.shape
        p[:sh, :sw] = src
        if sh < th_:
            p[sh:, :sw] = src[-1:, :]
        if sw < tw_:
            p[:, sw:] = p[:, sw - 1:sw]
        return p

    # pass 1: quantized coefficients (zigzag order) + expected decode
    qc: dict[int, list] = {}
    dec_coef: dict[int, np.ndarray] = {}
    for cid, hs, vs, _tq, qtab in comps:
        plane = comp_plane(cid)
        bh, bw_ = mcuy * vs, mcux * hs
        grid = [[None] * bw_ for _ in range(bh)]
        dec = np.zeros((bh * 8, bw_ * 8))
        for by in range(bh):
            for bx in range(bw_):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coefs = _fdct_scalar(blk)
                z = [
                    int(round(coefs.reshape(-1)[ZIGZAG[k]] / qtab[k]))
                    for k in range(64)
                ]
                grid[by][bx] = z
                deq = np.zeros(64)
                for k in range(64):
                    deq[ZIGZAG[k]] = z[k] * qtab[k]
                dec[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = _idct_scalar(
                    deq.reshape(8, 8)
                ) + 128.0
        qc[cid] = grid
        dec_coef[cid] = dec

    nblk = {}
    for cid, hs, vs, _tq, _q in comps:
        comp_h = -(-h * vs // vmax)
        comp_w = -(-w * hs // hmax)
        nblk[cid] = (-(-comp_h // 8), -(-comp_w // 8))

    # container head
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qly))
    if mode != "gray":
        out += _seg(0xDB, bytes([1]) + bytes(qlc))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, hs, vs, tq, _q in comps:
        sof += bytes([cid, hs << 4 | vs, tq])
    out += _seg(0xC2, sof)

    def sos_seg(scan_comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(scan_comps)])
        for cid, td, ta in scan_comps:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    # --- scan 1: DC first, all components interleaved, Al=1, optional DRI
    dc_codes = {0: _huff_codes(HUFF_DC_LUMA)}
    out += _seg(0xC4, _dht_payload(0, 0, HUFF_DC_LUMA))
    if mode != "gray":
        dc_codes[1] = _huff_codes(HUFF_DC_CHROMA)
        out += _seg(0xC4, _dht_payload(0, 1, HUFF_DC_CHROMA))
    if dc_restart:
        out += _seg(0xDD, dc_restart.to_bytes(2, "big"))
    out += sos_seg(
        [(c[0], 0 if c[0] == 1 else 1, 0) for c in comps], 0, 0, 0, 1
    )
    bw = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dc_restart and mcu_count and mcu_count % dc_restart == 0:
                bw.align()
                bw.out.append(0xFF)
                bw.out.append(0xD0 + (rst_n & 7))
                rst_n += 1
                pred = {c[0]: 0 for c in comps}
            mcu_count += 1
            for cid, hs, vs, _tq, _q in comps:
                codes = dc_codes[0 if cid == 1 else 1]
                for byy in range(vs):
                    for bxx in range(hs):
                        v = qc[cid][my * vs + byy][mx * hs + bxx][0] >> 1
                        diff = v - pred[cid]
                        pred[cid] = v
                        s = abs(diff).bit_length()
                        bw.put(*codes[s])
                        if s:
                            b = diff if diff >= 0 else diff + (1 << s) - 1
                            bw.put(b & ((1 << s) - 1), s)
    bw.align()
    out += bw.out
    if dc_restart:
        out += _seg(0xDD, (0).to_bytes(2, "big"))  # scans below: no restart

    # --- AC scans per component: banded first passes then two refinements
    ac_scripts = []
    for cid, _hs, _vs, _tq, _q in comps:
        ac_scripts.append((cid, 1, 5, 0, 2))
        ac_scripts.append((cid, 6, 63, 0, 2))
    for al_pair in ((2, 1), (1, 0)):
        for cid, _hs, _vs, _tq, _q in comps:
            ac_scripts.append((cid, 1, 63, al_pair[0], al_pair[1]))

    for cid, ss, se, ah, al in ac_scripts:
        bh, bw_n = nblk[cid]
        blocks = [qc[cid][by][bx] for by in range(bh) for bx in range(bw_n)]
        prep = [
            ([abs(v) for v in z], [0 if v >= 0 else -1 for v in z])
            for z in blocks
        ]
        # pass 1: record the symbols this scan emits (the emission logic
        # itself is the source of truth — EOB-run codes included)
        rec = _ScanEncoder(_NullBW(), None)
        for a, sign in prep:
            if ah == 0:
                _enc_ac_first(rec, a, sign, ss, se, al)
            else:
                _enc_ac_refine(rec, a, sign, ss, se, ah, al)
        rec.flush_eobrun()
        spec = _custom_table(rec.recorded or {0x00})
        out += _seg(0xC4, _dht_payload(1, 0, spec))
        out += sos_seg([(cid, 0, 0)], ss, se, ah, al)
        bw = _BitWriter()
        enc = _ScanEncoder(bw, _huff_codes(spec))
        for a, sign in prep:
            if ah == 0:
                _enc_ac_first(enc, a, sign, ss, se, al)
            else:
                _enc_ac_refine(enc, a, sign, ss, se, ah, al)
        enc.flush_eobrun()
        bw.align()
        out += bw.out

    # --- final scan: DC refinement (Ah=1 -> Al=0), interleaved
    out += sos_seg(
        [(c[0], 0 if c[0] == 1 else 1, 0) for c in comps], 0, 0, 1, 0
    )
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hs, vs, _tq, _q in comps:
                for byy in range(vs):
                    for bxx in range(hs):
                        bw.put(qc[cid][my * vs + byy][mx * hs + bxx][0] & 1, 1)
    bw.align()
    out += bw.out
    out += b"\xff\xd9"

    # expected decode: identical tail to encode_jpeg
    full = {}
    for cid, hs, vs, _tq, _q in comps:
        p = dec_coef[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:h, :w]

    def guard_round(x: np.ndarray) -> np.ndarray:
        frac = np.abs(x - np.floor(x) - 0.5)
        assert frac.min() > 1e-6, "knife-edge sample: regenerate the corpus"
        return np.clip(np.round(x), 0, 255).astype(np.int64)

    if mode == "gray":
        g = guard_round(full[1])
        exp = np.stack([g, g, g], axis=2)
    else:
        Yd = full[1]
        Cbd = full[2] - 128.0
        Crd = full[3] - 128.0
        exp = np.stack(
            [
                guard_round(Yd + 1.402 * Crd),
                guard_round(Yd - 0.344136 * Cbd - 0.714136 * Crd),
                guard_round(Yd + 1.772 * Cbd),
            ],
            axis=2,
        )
    return bytes(out), exp




# ---------------------------------------------------------------------------
# Arithmetic-coded (SOF9) encoder — round-9, the last S6 codec sliver.
#
# Same INDEPENDENT-implementation contract: the engine's QM decoder
# (multimodal._jpeg_decode_arith) shares no code with this encoder — the
# only common artifact is the standard's own Table D.3 state machine
# (ITU-T T.81), which both sides transcribe from the published standard.
# The encoder implements T.81 Annex D.1: interval subdivision with the
# MPS at the bottom, conditional MPS/LPS exchange, renormalization with
# byte-out at bit 19, carry resolution through a held-byte + stacked-0xFF
# pipeline, 0xFF00 byte stuffing, CLEARBITS flush, and RSTn restarts that
# re-initialize registers, statistics and DC conditioning state.
# Validated three ways in tests/test_jpeg_oracle.py: our decoder, and the
# system libjpeg (via the dev-time oracle) must both reproduce the
# expected decode of these bytes.
# ---------------------------------------------------------------------------

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from melody_join_spark.operators._qm_table import QM_TABLE  # noqa: E402


class _QMEncoder:
    """T.81 D.1 QM arithmetic encoder (dev-time, fixtures only)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11  # D.1.7 INITENC: 11 spacer bits before the first byte
        self.out = bytearray()
        self._held: int | None = None
        self._nff = 0  # completed 0xFF bytes awaiting carry resolution
        self._fixed = bytearray((113,))

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # byte stuffing

    def _push(self, b: int) -> None:
        """New completed byte enters the pipeline.  Invariant: _held (if
        any) is <= 0xFE, _nff counts 0xFF bytes completed after it — only
        that suffix is carry-mutable, everything before is final."""
        if b == 0xFF:
            self._nff += 1  # keep: a later carry may flip it to 0x00
        else:
            if self._held is not None:
                self._emit(self._held)
            for _ in range(self._nff):
                self._emit(0xFF)
            self._nff = 0
            self._held = b

    def _byteout(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        if t > 0xFF:
            # carry: the held byte absorbs it (held+1 <= 0xFF by the _push
            # invariant); stacked 0xFFs roll to plain 0x00 data bytes
            assert self._held is not None, "carry with empty byte pipeline"
            self._emit(self._held + 1)
            for _ in range(self._nff):
                self.out.append(0x00)
            self._nff = 0
            self._held = None
            self._push(t & 0xFF)
        else:
            self._push(t)

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        s = stats[i]
        mps = s >> 7
        qe, nmps, nlps, sw = QM_TABLE[s & 0x7F]
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if self.a < qe:
                pass  # exchange: LPS takes the bottom — code base unchanged
            else:
                self.c += self.a
                self.a = qe
            stats[i] = ((mps ^ sw) << 7) | nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def encode_fixed(self, d: int) -> None:
        self.encode(self._fixed, 0, d)

    def flush(self) -> bytes:
        """D.1.9: choose the code point in [C, C+A) with the most trailing
        zeros, push out the remaining register bits, drain the pipeline."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        if t < self.c:
            t += 0x8000
        self.c = t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self._held is not None:
            self._emit(self._held)
        for _ in range(self._nff):
            self._emit(0xFF)
        out = bytes(self.out)
        # trailing zero bytes are redundant (the decoder feeds zeros);
        # trimming them is what libjpeg does and keeps fixtures minimal
        while out.endswith(b"\x00") and not out.endswith(b"\xff\x00"):
            out = out[:-1]
        return out


def _qm_encode_dc(enc, stats, ctx, lo, hi, diff) -> int:
    """T.81 F.1.4.1: one DC difference; returns the NEXT context index."""
    if diff == 0:
        enc.encode(stats, ctx, 0)
        return 0
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, ctx + 1, sign)
    sz = (diff if diff > 0 else -diff) - 1
    pos = ctx + 2 + sign
    m = 0
    if sz == 0:
        enc.encode(stats, pos, 0)
    else:
        enc.encode(stats, pos, 1)
        m = 1
        pos = 20  # X1
        v2 = sz
        while True:
            v2 >>= 1
            if not v2:
                break
            enc.encode(stats, pos, 1)
            m <<= 1
            pos += 1
        enc.encode(stats, pos, 0)
    if m < lo:
        nctx = 0
    elif m > hi:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    pos += 14
    mm = m >> 1
    while mm:
        enc.encode(stats, pos, 1 if (sz & mm) else 0)
        mm >>= 1
    return nctx


def _qm_encode_ac_block(enc, stats, kx, coef_zz) -> None:
    """T.81 F.1.4.2: one block's AC coefficients (zigzag order)."""
    last = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last = k
            break
    k = 1
    while k <= last:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        while coef_zz[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = coef_zz[k]
        sign = 1 if v < 0 else 0
        enc.encode_fixed(sign)
        sz = (v if v > 0 else -v) - 1
        pos = st + 2
        m = 0
        if sz == 0:
            enc.encode(stats, pos, 0)
        else:
            enc.encode(stats, pos, 1)
            m = 1
            if sz >> 1 == 0:
                enc.encode(stats, pos, 0)  # second decision shares the bin
            else:
                enc.encode(stats, pos, 1)
                m = 2
                pos = 189 if k <= kx else 217
                v2 = sz >> 1
                while True:
                    v2 >>= 1
                    if not v2:
                        break
                    enc.encode(stats, pos, 1)
                    m <<= 1
                    pos += 1
                enc.encode(stats, pos, 0)
        pos += 14
        mm = m >> 1
        while mm:
            enc.encode(stats, pos, 1 if (sz & mm) else 0)
            mm >>= 1
        k += 1
    if last < 63:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def encode_jpeg_arith(
    img: np.ndarray,
    mode: str,
    quality: int,
    restart: int = 0,
    kx: int = 5,
) -> tuple[bytes, np.ndarray]:
    """Encode (h, w, 3) uint8 RGB as a sequential ARITHMETIC-coded JPEG
    (SOF9); returns (bytes, expected-decode RGB) with the same scalar
    DCT / quantization / expected-decode contract as :func:`encode_jpeg`.
    ``kx`` is the AC conditioning bound — a DAC segment is emitted when it
    differs from the 5 the standard defaults to, so the decoder's DAC
    parsing is exercised by the corpus."""
    h, w, _ = img.shape
    R = img[:, :, 0].astype(np.float64)
    G = img[:, :, 1].astype(np.float64)
    B = img[:, :, 2].astype(np.float64)
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = 128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B
    Cr = 128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B

    qly = _scale_qt(QT_LUMA, quality)
    qlc = _scale_qt(QT_CHROMA, quality)
    if mode == "gray":
        comps = [(1, 1, 1, 0, qly)]
    elif mode == "444":
        comps = [(1, 1, 1, 0, qly), (2, 1, 1, 1, qlc), (3, 1, 1, 1, qlc)]
    elif mode == "420":
        comps = [(1, 2, 2, 0, qly), (2, 1, 1, 1, qlc), (3, 1, 1, 1, qlc)]
    else:
        raise ValueError(mode)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def comp_plane(cid):
        src = {1: Y, 2: Cb, 3: Cr}[cid]
        _, hs, vs, _, _ = next(c for c in comps if c[0] == cid)
        if hs < hmax or vs < vmax:
            fy, fx = vmax // vs, hmax // hs
            hh = -(-h // fy) * fy
            ww = -(-w // fx) * fx
            p = np.zeros((hh, ww))
            p[:h, :w] = src
            p[h:hh, :w] = src[-1:, :]
            p[:, w:ww] = p[:, w - 1:w]
            src = p.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))
        th_, tw_ = mcuy * vs * 8, mcux * hs * 8
        p = np.zeros((th_, tw_))
        sh, sw = src.shape
        p[:sh, :sw] = src
        if sh < th_:
            p[sh:, :sw] = src[-1:, :]
        if sw < tw_:
            p[:, sw:] = p[:, sw - 1:sw]
        return p

    plane = {c[0]: comp_plane(c[0]) for c in comps}

    # entropy state: DC conditioning defaults L=0, U=1 (lo=0, hi=1)
    lo, hi = (1 << 0) >> 1, (1 << 1) >> 1

    def fresh():
        return (
            {0: bytearray(64), 1: bytearray(64)},
            {0: bytearray(256), 1: bytearray(256)},
            {c[0]: 0 for c in comps},  # dc ctx
            {c[0]: 0 for c in comps},  # dc last
        )

    enc = _QMEncoder()
    dc_stats, ac_stats, dc_ctx, dc_last = fresh()
    dec_coef: dict[int, np.ndarray] = {
        c[0]: np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8)) for c in comps
    }
    scan_chunks: list[bytes] = []
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                scan_chunks.append(enc.flush())
                scan_chunks.append(bytes([0xFF, 0xD0 + (rst_n & 7)]))
                rst_n += 1
                enc = _QMEncoder()
                dc_stats, ac_stats, dc_ctx, dc_last = fresh()
            mcu_count += 1
            for cid, hs, vs, tq, qtab in comps:
                for byy in range(vs):
                    for bxx in range(hs):
                        y0 = (my * vs + byy) * 8
                        x0 = (mx * hs + bxx) * 8
                        blk = plane[cid][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = _fdct_scalar(blk)
                        qc = [
                            int(round(coef.reshape(-1)[ZIGZAG[k]] / qtab[k]))
                            for k in range(64)
                        ]
                        diff = qc[0] - dc_last[cid]
                        dc_last[cid] = qc[0]
                        dc_ctx[cid] = _qm_encode_dc(
                            enc, dc_stats[tq], dc_ctx[cid], lo, hi, diff
                        )
                        _qm_encode_ac_block(enc, ac_stats[tq], kx, qc)
                        deq = np.zeros(64)
                        for k in range(64):
                            deq[ZIGZAG[k]] = qc[k] * qtab[k]
                        dec_coef[cid][y0:y0 + 8, x0:x0 + 8] = _idct_scalar(
                            deq.reshape(8, 8)
                        ) + 128.0
    scan_chunks.append(enc.flush())

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qly))
    if mode != "gray":
        out += _seg(0xDB, bytes([1]) + bytes(qlc))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, hs, vs, tq, _ in comps:
        sof += bytes([cid, hs << 4 | vs, tq])
    out += _seg(0xC9, sof)  # SOF9: sequential DCT, arithmetic coding
    if kx != 5:
        # DAC: AC conditioning for both tables (DC stays at default 0/1)
        out += _seg(0xCC, bytes([0x10, kx, 0x11, kx]))
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for cid, _, _, tq, _ in comps:
        sos += bytes([cid, tq << 4 | tq])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    for ch in scan_chunks:
        out += ch
    out += b"\xff\xd9"

    # expected decode: replication upsample, crop, color transform
    full = {}
    for cid, hs, vs, _, _ in comps:
        p = dec_coef[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:h, :w]

    def guard_round(x: np.ndarray) -> np.ndarray:
        frac = np.abs(x - np.floor(x) - 0.5)
        assert frac.min() > 1e-6, "knife-edge sample: regenerate the corpus"
        return np.clip(np.round(x), 0, 255).astype(np.int64)

    if mode == "gray":
        g = guard_round(full[1])
        exp = np.stack([g, g, g], axis=2)
    else:
        Yd = full[1]
        Cbd = full[2] - 128.0
        Crd = full[3] - 128.0
        exp = np.stack(
            [
                guard_round(Yd + 1.402 * Crd),
                guard_round(Yd - 0.344136 * Cbd - 0.714136 * Crd),
                guard_round(Yd + 1.772 * Cbd),
            ],
            axis=2,
        )
    return bytes(out), exp




# ---------------------------------------------------------------------------
# AVI-MJPEG fixtures — round-9 (the video modality made real).
#
# Same independence contract: the container writer here and the engine's
# avi_mjpeg_frames parser share no code; frames come from the INDEPENDENT
# baseline encoder above (some with their DHT segments STRIPPED — the
# MJPEG-in-AVI convention — so the engine's Annex-K splice path is
# exercised by the committed corpus, not just unit tests).
# ---------------------------------------------------------------------------


def _strip_dht(frame: bytes) -> bytes:
    """Remove every DHT segment from a baseline JPEG (encode_jpeg emits the
    Annex-K tables, so a compliant MJPEG decoder must reconstruct exactly
    the same decode from the table-less frame)."""
    out = bytearray(frame[:2])
    i = 2
    while i < len(frame):
        assert frame[i] == 0xFF
        j = i
        while frame[j] == 0xFF:
            j += 1
        m = frame[j]
        if m == 0xD9:
            out += frame[i:]
            break
        if m == 0xDA:  # SOS: entropy data follows to EOI — copy the rest
            out += frame[i:]
            break
        ln = int.from_bytes(frame[j + 1:j + 3], "big")
        if m != 0xC4:
            out += frame[i:j + 1 + ln]
        i = j + 1 + ln
    return bytes(out)


def write_avi_mjpeg(frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """Minimal standards-shaped AVI container around MJPEG frames:
    RIFF('AVI ') / LIST('hdrl': avih + LIST('strl': strh('vids','MJPG') +
    strf(BITMAPINFOHEADER))) / LIST('movi': '00dc' chunks, word-aligned)."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    u32 = lambda v: int(v).to_bytes(4, "little")  # noqa: E731
    avih = b"".join([
        u32(1_000_000 // fps), u32(0), u32(0), u32(0x10),  # usec/frame..flags
        u32(len(frames)), u32(0), u32(1), u32(0),          # totalframes..bufsz
        u32(w), u32(h), u32(0), u32(0), u32(0), u32(0),
    ])
    strh = b"".join([
        b"vids", b"MJPG", u32(0), u32(0), u32(0),
        u32(1), u32(fps), u32(0), u32(len(frames)),        # scale rate start len
        u32(0), u32(0xFFFFFFFF), u32(0), u32(0), u32(0),   # bufsz quality smpsz rc
    ])
    strf = b"".join([
        u32(40), u32(w), u32(h), (1).to_bytes(2, "little"),
        (24).to_bytes(2, "little"), b"MJPG", u32(w * h * 3),
        u32(0), u32(0), u32(0), u32(0),
    ])
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


if __name__ == "__main__":
    main()
