"""Measure the pure-python vs codec-backed (libjpeg) JPEG decode
throughput ratio — the number the 100-TB media cost model's ``decoder=``
swap claim rests on (SCALE.md round 9 priced pure-python at ~1 Mpx/s/core
and named the swap as the mitigation; round-9 VERDICT next #1 asks for the
measured ratio).

Method: encode a deterministic 512x512 RGB ramp with the SYSTEM libjpeg
(scripts/jpeg_arith_oracle.c encode mode) in the four coding shapes the
engine decodes (huffman/arithmetic x 4:4:4 / 4:2:0), then time
- the repo's pure-python ``jpeg_decoder`` in-process, and
- libjpeg via the oracle's ``decodebench`` mode (an in-process decode loop
  timed with CLOCK_MONOTONIC, so process spawn is excluded and the ratio
  compares CODECS, not fork+exec).

Run: python scripts/measure_codec_ratio.py   (skips without gcc/libjpeg)
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from melody_join_spark.operators.multimodal import jpeg_decoder  # noqa: E402

ORACLE_SRC = Path(__file__).resolve().parent / "jpeg_arith_oracle.c"


def build_oracle(tmp: Path) -> Path:
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        sys.exit("no C compiler — ratio needs the libjpeg oracle")
    exe = tmp / "jpeg_arith_oracle"
    r = subprocess.run(
        [gcc, "-O2", "-o", str(exe), str(ORACLE_SRC), "-ljpeg"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        sys.exit(f"oracle does not build: {r.stderr[:300]}")
    return exe


def ramp(w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255) // max(w - 1, 1)
    g = (yy * 255) // max(h - 1, 1)
    b = ((xx + yy) * 255) // max(w + h - 2, 1)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def main() -> None:
    w = h = 512
    img = ramp(w, h)
    mpx = w * h / 1e6
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        exe = build_oracle(tmp)
        raw = tmp / "in.raw"
        raw.write_bytes(img.tobytes())
        print(f"image {w}x{h} RGB ({mpx:.3f} Mpx)")
        for coding in ("huff", "arith"):
            for mode in ("444", "420"):
                jpg = tmp / f"{coding}_{mode}.jpg"
                subprocess.run(
                    [str(exe), "encode", str(w), str(h), mode, "90",
                     coding, "0", str(raw), str(jpg)],
                    check=True,
                )
                data = jpg.read_bytes()
                # pure python: min-of-3 in-process
                py_best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    jpeg_decoder(data, 27)
                    py_best = min(py_best, time.perf_counter() - t0)
                # libjpeg: in-process loop via decodebench (spawn excluded)
                iters = 50
                out = subprocess.run(
                    [str(exe), "decodebench", str(jpg), str(iters)],
                    check=True,
                    capture_output=True,
                    text=True,
                ).stdout.split()
                c_per = int(out[3]) / 1e9 / iters
                py_mpxs = mpx / py_best
                c_mpxs = mpx / c_per
                print(
                    f"{coding}/{mode}: pure-python {py_best*1e3:8.1f} ms "
                    f"({py_mpxs:6.2f} Mpx/s) | libjpeg {c_per*1e3:7.2f} ms "
                    f"({c_mpxs:7.1f} Mpx/s) | ratio {c_mpxs/py_mpxs:6.1f}x"
                )


if __name__ == "__main__":
    main()
