"""Histogram text source round-trip + multimodal plumbing tests."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from melody_join_spark.operators.multimodal import (
    decode_features,
    fake_decode_image,
    frame_sample,
    read_binary_dir,
)
from melody_join_spark.sources.histogram_text import (
    histograms_to_engine_format,
    read_flat_doubles,
    read_histogram_text,
    write_histogram_text,
)


def test_histogram_text_roundtrip(spark, tmp_path):
    path = str(tmp_path / "hist")
    rows = [(1, [0.5, 0.25, 0.25]), (2, [1.0, 0.0, 3.0]), (7, [0.1, 0.2, 0.3])]
    df = spark.createDataFrame(rows, "id long, w array<double>")
    write_histogram_text(df, path)
    back = read_histogram_text(spark, path)
    got = {r.id: r.w for r in back.collect()}
    assert got == {i: w for i, w in rows}


def test_read_reference_format_line(spark, tmp_path):
    # exact reference line format: "<id> <w0> ... <w_{B-1}>" (README.md:19-20)
    p = tmp_path / "ref.txt"
    p.write_text("116 1.0 2.0 3.0\n548 4 5 6\n")
    df = read_histogram_text(spark, str(p))
    got = {r.id: r.w for r in df.collect()}
    assert got == {116: [1.0, 2.0, 3.0], 548: [4.0, 5.0, 6.0]}
    eng = histograms_to_engine_format(df)
    r = {x.id: x for x in eng.collect()}
    assert r[116].total == 6.0
    assert r[116].cum == [1.0, 3.0, 6.0]


def test_read_flat_doubles(spark, tmp_path):
    p = tmp_path / "bins.txt"
    p.write_text("0 0 1.5 2.5 3 4\n")
    arr = read_flat_doubles(spark, str(p))
    assert arr.tolist() == [0, 0, 1.5, 2.5, 3, 4]


@pytest.fixture()
def media_dir(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    for i in range(3):
        (d / f"img_{i}.bin").write_bytes(bytes([i]) * (100 + i * 50))
    return str(d)


def test_read_binary_dir_and_decode(spark, media_dir):
    df = read_binary_dir(spark, media_dir)
    rows = df.collect()
    assert len(rows) == 3
    assert {r.content_length for r in rows} == {100, 150, 200}
    feats = decode_features(df, bins=8, fake=True).collect()
    assert len(feats) == 3
    for r in feats:
        v = np.array(r.features)
        assert v.shape == (8,)
        assert v.sum() == pytest.approx(1.0)
    # deterministic: same content -> same features
    again = decode_features(df, bins=8, fake=True).collect()
    assert {r.media_id: tuple(r.features) for r in again} == {
        r.media_id: tuple(r.features) for r in feats
    }


def test_decode_default_is_byte_histogram(spark, media_dir):
    """Default decode path is the REAL byte-histogram extractor: features
    equal the numpy reference computed on the same payload bytes."""
    from melody_join_spark.operators.multimodal import byte_histogram_decoder

    df = read_binary_dir(spark, media_dir)
    payloads = {r.media_id: bytes(r.content) for r in df.collect()}
    feats = decode_features(df, bins=8).collect()
    assert len(feats) == len(payloads)
    for r in feats:
        expect = byte_histogram_decoder(payloads[r.media_id], 8)
        assert np.allclose(np.array(r.features), expect)
        assert np.isclose(sum(r.features), 1.0)


def test_frame_sample(spark, media_dir):
    df = read_binary_dir(spark, media_dir, modality="video")
    frames = frame_sample(df, every_n=2, max_frames=4, frame_bytes=16).collect()
    assert frames
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, lst in by_id.items():
        idxs = sorted(r.frame_idx for r in lst)
        assert idxs == list(range(len(idxs)))  # contiguous from 0
        for r in lst:
            assert 1 <= len(r.frame) <= 16


def test_fake_decoder_stability():
    a = fake_decode_image(b"hello", 16)
    b = fake_decode_image(b"hello", 16)
    c = fake_decode_image(b"world", 16)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_custom_decoder_plugs_through_generate_to_join(spark):
    """The production decoder= hook end to end (round-2 VERDICT item 8): a
    custom callable flows through decode_features -> generate_histograms ->
    emd_join_nd and changes the result the way its features dictate."""
    import numpy as np
    from pyspark.sql import functions as F

    from melody_join_spark.operators.emd_join_nd import emd_join_nd
    from melody_join_spark.plans.generate import generate_histograms

    def first_byte_decoder(content: bytes, bins: int) -> np.ndarray:
        # deterministic custom feature: all mass at the first byte's bucket
        h = np.zeros(bins)
        h[(content[0] if content else 0) % bins] = 1.0
        return h

    rows = [
        (1, "m://1", "image", bytes([0, 9, 9]), 3, "{}"),
        (2, "m://2", "image", bytes([0, 1, 2]), 3, "{}"),   # same first byte as 1
        (3, "m://3", "image", bytes([4, 1, 2]), 3, "{}"),   # one bucket away
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, path string, modality string, content binary, "
        "content_length long, meta string",
    )
    hist = generate_histograms(spark, media=media, bins=8, decoder=first_byte_decoder)
    got = {r.media_id: r.w for r in hist.select(F.col("id").alias("media_id"), "w").collect()}
    assert got[1] == got[2] != got[3]
    bins = np.arange(8, dtype=np.float64).reshape(-1, 1)
    pairs = {
        (r.rid, r.sid): r.emd
        for r in emd_join_nd(hist, bins, 0.5, strategy="grid", grid=2).collect()
    }
    assert pairs[(1, 2)] == 0.0          # identical custom features
    assert (1, 3) not in pairs or pairs[(1, 3)] > 0.5  # 4 buckets apart: pruned


def test_resize_media_plumbing(spark):
    """resize: schema preserved, content downsampled deterministically,
    meta records the original length, custom resizer plugs in; composes
    with decode_features downstream."""
    import json

    from melody_join_spark.operators.multimodal import (
        decode_features,
        default_byte_resizer,
        resize_media,
    )

    rows = [
        (1, "p1", "image", bytes(range(256)) * 40, 256 * 40, "{}"),
        (2, "p2", "image", b"tiny", 4, '{"k": 1}'),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, path string, modality string, content binary, "
        "content_length long, meta string",
    )
    out = {r.media_id: r for r in resize_media(media, target_bytes=128).collect()}
    assert out[1].content_length == 128
    assert json.loads(out[1].meta)["resized_from"] == 256 * 40
    assert bytes(out[2].content) == b"tiny"  # identity below target
    assert json.loads(out[2].meta)["k"] == 1
    # deterministic
    assert default_byte_resizer(bytes(range(256)) * 40, 128) == bytes(out[1].content)
    # custom resizer hook
    got = resize_media(
        media, target_bytes=8, resizer=lambda c, n: c[:n]
    ).collect()
    assert all(len(bytes(r.content)) <= 8 for r in got)
    # composes with the feature extractor
    feats = decode_features(resize_media(media, target_bytes=128), bins=8)
    assert feats.count() == 2


def _tiny_ppm_p6(pixels, w, h, maxval=255, comment=False):
    c = "# c\n" if comment else ""
    hdr = f"P6\n{c}{w} {h}\n{maxval}\n".encode()
    return hdr + bytes(v for px in pixels for v in px)


def test_ppm_decoder_known_pixels():
    from melody_join_spark.operators.multimodal import ppm_bin_points, ppm_decoder

    # 2x2 image: pure black, pure red, pure green, pure white
    px = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (255, 255, 255)]
    h = ppm_decoder(_tiny_ppm_p6(px, 2, 2), 27)
    assert h.shape == (27,) and abs(h.sum() - 1.0) < 1e-12
    # cube index (r*3>>8)*9 + (g*3>>8)*3 + (b*3>>8): black->0, red->18,
    # green->6, white->26
    assert h[0] == h[18] == h[6] == h[26] == 0.25
    # P3 ascii form decodes identically
    body = " ".join(str(v) for p in px for v in p)
    h3 = ppm_decoder(f"P3\n2 2\n255\n{body}\n".encode(), 27)
    assert np.array_equal(h, h3)
    # header comment + maxval rescale: 127-max encodes the same colors
    px127 = [tuple(c * 127 // 255 for c in p) for p in px]
    h127 = ppm_decoder(_tiny_ppm_p6(px127, 2, 2, maxval=127, comment=True), 27)
    assert np.array_equal(h, h127)
    # bin points match the bucket order geometry
    pts = ppm_bin_points(27)
    assert pts.shape == (27, 3)
    assert list(pts[18]) == [2.0, 0.0, 0.0]  # pure red bucket
    with pytest.raises(ValueError):
        ppm_decoder(b"JFIF....", 27)


def test_wav_pcm_decoder_known_samples():
    import struct

    from melody_join_spark.operators.multimodal import wav_pcm_decoder

    samples = [-32768, -1, 0, 32767]
    pcm = struct.pack("<4h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    h = wav_pcm_decoder(data, 4)
    # buckets: (-32768+32768)*4>>16=0, (32767)*4>>16=1, 32768*4>>16=2, 65535*4>>16=3
    assert list(h) == [0.25, 0.25, 0.25, 0.25]
    with pytest.raises(ValueError):
        wav_pcm_decoder(b"RIFFxxxxWAVE", 4)
    with pytest.raises(ValueError):
        wav_pcm_decoder(b"OggS....", 4)


def test_sniff_decoder_dispatch():
    from melody_join_spark.operators.multimodal import (
        byte_histogram_decoder,
        ppm_decoder,
        sniff_decoder,
    )

    ppm = _tiny_ppm_p6([(10, 20, 30)], 1, 1)
    assert np.array_equal(sniff_decoder(ppm, 27), ppm_decoder(ppm, 27))
    blob = b"\x89PNG arbitrary compressed payload"
    assert np.array_equal(
        sniff_decoder(blob, 8), byte_histogram_decoder(blob, 8)
    )


def test_ppm_decoder_matches_independent_fixture_parser(spark):
    """Engine decoder == the fixture script's pure-python-int parser on the
    committed corpus (the two implementations share no code)."""
    import os
    import sys

    from melody_join_spark.operators.multimodal import ppm_decoder

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from make_media_fixtures import PPM_DIR, hist27, parse_ppm_pixels

    names = sorted(os.listdir(PPM_DIR))[:20]
    assert names, "committed PPM fixtures missing"
    for name in names:
        with open(os.path.join(PPM_DIR, name), "rb") as f:
            data = f.read()
        got = ppm_decoder(data, 27)
        want = np.array(hist27(parse_ppm_pixels(data)))
        assert np.allclose(got, want, atol=1e-12), name


def test_png_decoder_known_pixels():
    """Hand-built PNGs with known pixels, every filter type, every
    supported color type."""
    import os
    import sys

    from melody_join_spark.operators.multimodal import (
        UnsupportedMediaFormatError,
        png_decoder,
        ppm_decoder,
    )

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from make_png_fixtures import encode_png

    # 2x2 RGB: black, red, green, white — same buckets as the PPM test
    px = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (255, 255, 255)]
    rows = [px[:2], px[2:]]
    h = png_decoder(encode_png(rows, 2), 27)
    assert h.shape == (27,) and abs(h.sum() - 1.0) < 1e-12
    assert h[0] == h[18] == h[6] == h[26] == 0.25
    # identical image as PPM decodes to the identical histogram
    body = bytes(v for p in px for v in p)
    assert np.array_equal(h, ppm_decoder(b"P6\n2 2\n255\n" + body, 27))
    # grayscale replicates to RGB diagonal buckets
    g = png_decoder(encode_png([[(0,), (255,)], [(0,), (128,)]], 0), 27)
    assert g[0] == 0.5 and g[26] == 0.25 and g[13] == 0.25  # (1,1,1) bucket
    # RGBA drops alpha
    rows_a = [[p + (7,) for p in px[:2]], [p + (200,) for p in px[2:]]]
    assert np.array_equal(h, png_decoder(encode_png(rows_a, 6), 27))
    # palette indirects through PLTE
    pal = list(px)
    rows_p = [[(0,), (1,)], [(2,), (3,)]]
    assert np.array_equal(h, png_decoder(encode_png(rows_p, 3, pal), 27))
    # malformed payloads: plain ValueError
    with pytest.raises(ValueError):
        png_decoder(b"\x89PNG\r\n\x1a\njunk", 27)
    with pytest.raises(ValueError):
        png_decoder(b"JFIF....", 27)
    # valid-but-unsupported (16-bit depth): the dedicated signal
    import struct

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    import zlib as _z

    chunk = (
        struct.pack(">I", len(ihdr16)) + b"IHDR" + ihdr16
        + struct.pack(">I", _z.crc32(b"IHDR" + ihdr16))
    )
    idat = struct.pack(">I", 1) + b"IDAT" + b"\x00" + struct.pack(">I", 0)
    with pytest.raises(UnsupportedMediaFormatError):
        png_decoder(sig + chunk + idat, 27)


def test_png_decoder_matches_independent_fixture_oracle():
    """Engine numpy decoder must invert the fixture script's pure-int
    encoder (filters applied by independent arithmetic) on the committed
    corpus: spot-check EMD-0 self-consistency via the pairs fixture."""
    import os

    import pyarrow.parquet as pq

    from melody_join_spark.operators.multimodal import png_decoder

    png_dir = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "fixtures", "media", "png"
    )
    names = sorted(os.listdir(png_dir))
    assert len(names) == 48, "committed PNG fixtures missing"
    hists = {}
    for name in names:
        with open(os.path.join(png_dir, name), "rb") as f:
            h = png_decoder(f.read(), 27)
        assert abs(h.sum() - 1.0) < 1e-12
        hists[int(name[4:7])] = h
    pairs = pq.read_table(
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "fixtures",
            "media_png_pairs.parquet",
        )
    ).to_pandas()
    # fixture EMD == 0 iff decoded histograms identical (oracle pixels ==
    # decoded pixels); spot-check both directions on the extreme pairs
    zero = pairs[pairs.emd == 0.0]
    for _, r in zero.iterrows():
        assert np.allclose(hists[int(r.rid)], hists[int(r.sid)], atol=1e-12)
    big = pairs.nlargest(5, "emd")
    for _, r in big.iterrows():
        assert not np.allclose(hists[int(r.rid)], hists[int(r.sid)])


def test_sniff_decoder_unsupported_format_is_loud():
    import struct

    from melody_join_spark.operators.multimodal import (
        UnsupportedMediaFormatError,
        byte_histogram_decoder,
        lenient_sniff_decoder,
        sniff_decoder,
    )

    # float-WAV (fmt=3): valid container, unsupported sample depth
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wav = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(UnsupportedMediaFormatError):
        sniff_decoder(wav, 8)
    # the opt-in lenient path degrades it to the byte histogram
    assert np.array_equal(
        lenient_sniff_decoder(wav, 8), byte_histogram_decoder(wav, 8)
    )
    # malformed RIFF still degrades silently in both
    bad = b"RIFFxxxxWAVE"
    assert np.array_equal(
        sniff_decoder(bad, 8), byte_histogram_decoder(bad, 8)
    )


def test_jpeg_decoder_round_trips_independent_encoder():
    """The engine's jpeg_decoder must reproduce the EXPECTED DECODE of the
    fixture script's independent pure-python encoder (its own FDCT,
    quantization, huffman coding; scalar-loop IDCT for the expectation)
    bit-for-bucket across grayscale / 4:4:4 / 4:2:0, two quality levels,
    and restart intervals."""
    import os
    import sys

    from melody_join_spark.operators.multimodal import (
        _color_cube_hist,
        jpeg_decoder,
    )

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from make_jpeg_fixtures import encode_jpeg
    from make_png_fixtures import synth_rgb

    rng = np.random.default_rng(5)
    for mode, q, rst in [
        ("444", 75, 0), ("420", 90, 0), ("gray", 60, 2), ("420", 50, 3)
    ]:
        img = synth_rgb(rng)
        data, exp = encode_jpeg(img, mode, q, restart=rst)
        got = jpeg_decoder(data, 27)
        want = _color_cube_hist(exp.reshape(-1, 3), 27)
        assert np.array_equal(got, want), (mode, q, rst)
        assert abs(got.sum() - 1.0) < 1e-12


def test_jpeg_decoder_rejects_malformed_and_unsupported():
    from melody_join_spark.operators.multimodal import (
        UnsupportedMediaFormatError,
        jpeg_decoder,
        sniff_decoder,
    )

    with pytest.raises(ValueError):
        jpeg_decoder(b"not a jpeg", 27)
    with pytest.raises(ValueError):
        jpeg_decoder(b"\xff\xd8\xff\xd9", 27)  # SOI+EOI, no frame
    # progressive (SOF2): recognized container, unsupported depth — loud
    prog = b"\xff\xd8" + b"\xff\xc2" + (10).to_bytes(2, "big") + bytes(8)
    with pytest.raises(UnsupportedMediaFormatError):
        jpeg_decoder(prog, 27)
    with pytest.raises(UnsupportedMediaFormatError):
        sniff_decoder(prog, 27)  # dispatch stays loud through sniff
    # 12-bit precision SOF0
    sof12 = bytes([12]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    deep = b"\xff\xd8" + b"\xff\xc0" + (len(sof12) + 2).to_bytes(2, "big") + sof12
    with pytest.raises(UnsupportedMediaFormatError):
        jpeg_decoder(deep, 27)


def test_jpeg_decoder_committed_corpus_and_fixture_pairs():
    """The committed corpus decodes to valid histograms, and the fixture's
    extreme EMD pairs are consistent with the decoded features (same
    contract as the PNG corpus test)."""
    import os

    import pyarrow.parquet as pq

    from melody_join_spark.operators.multimodal import jpeg_decoder

    jdir = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "fixtures", "media", "jpeg"
    )
    names = sorted(os.listdir(jdir))
    assert len(names) == 48, "committed JPEG fixtures missing"
    hists = {}
    for name in names:
        with open(os.path.join(jdir, name), "rb") as f:
            h = jpeg_decoder(f.read(), 27)
        assert abs(h.sum() - 1.0) < 1e-12
        hists[int(name[4:7])] = h
    pairs = pq.read_table(
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "fixtures",
            "media_jpeg_pairs.parquet",
        )
    ).to_pandas()
    small = pairs.nsmallest(5, "emd")
    for _, r in small.iterrows():
        # near-zero EMD pairs must have near-identical decoded histograms
        assert (
            np.abs(hists[int(r.rid)] - hists[int(r.sid)]).sum() / 2.0
            <= r.emd + 1e-9
        )
    big = pairs.nlargest(5, "emd")
    for _, r in big.iterrows():
        assert not np.allclose(hists[int(r.rid)], hists[int(r.sid)])

def test_jpeg_non_interleaved_baseline_scan_stays_loud():
    """A LEGAL baseline JPEG may carry non-interleaved scans (ns < frame
    component count, multiple SOS segments); this decoder handles only the
    single interleaved scan, so such files must raise
    UnsupportedMediaFormatError — routed to the decoder= integration point
    by sniff dispatch — instead of a ValueError that silently degrades to
    the byte-histogram (round-6 ADVICE, multimodal.py:525)."""
    from melody_join_spark.operators.multimodal import (
        UnsupportedMediaFormatError,
        jpeg_decoder,
    )

    sof = (
        bytes([8])
        + (8).to_bytes(2, "big")
        + (8).to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])  # ns=1 of 3 frame components
    data = (
        b"\xff\xd8"
        + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
        + b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
        + b"\xff\xd9"
    )
    with pytest.raises(UnsupportedMediaFormatError, match="non-interleaved"):
        jpeg_decoder(data, 27)

def test_jpeg_progressive_round_trips_independent_encoder():
    """The engine's progressive (SOF2) decode must reproduce the EXPECTED
    DECODE of the independent progressive encoder bit-for-bucket, across
    gray / 4:4:4 / 4:2:0, a restarted DC scan, and the full scan script
    (DC/AC x first/refinement, spectral selection, successive
    approximation, cross-block EOB-runs with buffered correction bits)."""
    import os
    import sys

    import numpy as np

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"),
    )
    from make_jpeg_fixtures import encode_jpeg_progressive
    from make_media_fixtures import hist27
    from make_png_fixtures import synth_rgb

    from melody_join_spark.operators.multimodal import jpeg_decoder

    rng = np.random.default_rng(29)
    for i in range(6):
        img = synth_rgb(rng)
        mode = ["444", "420", "gray"][i % 3]
        q = [75, 90, 60][i % 3]
        rst = 3 if i == 4 else 0
        data, exp = encode_jpeg_progressive(img, mode, q, dc_restart=rst)
        got = jpeg_decoder(data, 27)
        rgb = [
            tuple(int(v) for v in exp[y, x])
            for y in range(exp.shape[0])
            for x in range(exp.shape[1])
        ]
        assert np.array_equal(got, np.asarray(hist27(rgb))), (i, mode, q, rst)


def test_jpeg_progressive_corpus_decodes_and_sniffs():
    """Every committed progressive fixture image decodes through BOTH the
    direct decoder and sniff dispatch (SOF2 is huffman JPEG — it must NOT
    raise or degrade to the byte histogram)."""
    import os

    from melody_join_spark.operators.multimodal import (
        jpeg_decoder,
        sniff_decoder,
    )

    d = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "fixtures", "media", "jpeg2"
    )
    names = sorted(os.listdir(d))
    assert len(names) == 24
    for n in names[:6]:
        with open(os.path.join(d, n), "rb") as f:
            data = f.read()
        h1 = jpeg_decoder(data, 27)
        h2 = sniff_decoder(data, 27)
        assert h1.sum() > 0 and (h1 == h2).all()

def test_jpeg_progressive_long_eob_runs():
    """A constant-color image has all-zero AC everywhere: the progressive
    AC scans become pure cross-block EOB-runs, forcing the (r, 0) run
    codes with r > 0 and the decoder's eobrun bookkeeping across blocks
    (the path per-block EOBs never exercise).  A smooth gradient then
    exercises refinement runs with buffered correction bits."""
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from make_jpeg_fixtures import encode_jpeg_progressive
    from make_media_fixtures import hist27

    from melody_join_spark.operators.multimodal import jpeg_decoder

    flat = np.full((24, 40, 3), 180, dtype=np.uint8)
    y, x = np.mgrid[0:24, 0:40]
    grad = np.stack(
        [(y * 5 + 30) % 256, (x * 3 + 60) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)
    for img in (flat, grad):
        for mode in ("gray", "444", "420"):
            data, exp = encode_jpeg_progressive(img, mode, 75)
            got = jpeg_decoder(data, 27)
            rgb = [
                tuple(int(v) for v in exp[yy, xx])
                for yy in range(exp.shape[0])
                for xx in range(exp.shape[1])
            ]
            assert np.array_equal(got, np.asarray(hist27(rgb))), mode


def _mk_avi(n_frames=4, mode="444", strip=True):
    """Small AVI-MJPEG built from the INDEPENDENT fixture encoder."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from make_jpeg_fixtures import _strip_dht, encode_jpeg, write_avi_mjpeg

    yy, xx = np.mgrid[0:16, 0:24]
    base = np.stack(
        [(xx * 255) // 23, (yy * 255) // 15, ((xx + yy) * 255) // 38], -1
    ).astype(np.uint8)
    frames, exps = [], []
    for t in range(n_frames):
        img = np.roll(base, shift=2 * t, axis=1)
        data, exp = encode_jpeg(img, mode, 80)
        if strip and t % 2:
            data = _strip_dht(data)
        frames.append(data)
        exps.append(exp)
    return write_avi_mjpeg(frames, 24, 16), frames, exps


def test_avi_mjpeg_frames_and_decoder():
    """Container walk finds every frame; the video feature equals the
    unweighted mean of the per-frame decodes (bit-exact — same float64
    accumulation), including DHT-stripped frames via the Annex-K splice."""
    from melody_join_spark.operators.multimodal import (
        _mjpeg_ensure_dht,
        avi_mjpeg_decoder,
        avi_mjpeg_frames,
        jpeg_decoder,
        sniff_decoder,
    )

    avi, frames, _ = _mk_avi()
    got = avi_mjpeg_frames(avi)
    assert got == frames  # byte-exact payloads, in order
    per_frame = np.stack(
        [jpeg_decoder(_mjpeg_ensure_dht(f), 27) for f in frames]
    )
    want = per_frame.mean(axis=0)
    assert np.array_equal(avi_mjpeg_decoder(avi, 27), want)
    # sniff routes RIFF/AVI to the video path (RIFF/WAVE still to audio)
    assert np.array_equal(sniff_decoder(avi, 27), want)


def test_avi_mjpeg_frame_sampling_cap():
    """Long clips sample evenly to max_frames — bounded per-row work."""
    from melody_join_spark.operators.multimodal import avi_mjpeg_decoder

    avi, frames, _ = _mk_avi(n_frames=6, strip=False)
    # max_frames=2 -> first and last frames by the linspace stride
    from melody_join_spark.operators.multimodal import (
        _mjpeg_ensure_dht,
        jpeg_decoder,
    )

    want = np.stack(
        [jpeg_decoder(_mjpeg_ensure_dht(f), 27) for f in (frames[0], frames[-1])]
    ).mean(axis=0)
    assert np.array_equal(avi_mjpeg_decoder(avi, 27, max_frames=2), want)


def test_avi_mjpeg_rejections():
    """Non-MJPEG codecs and frame payloads fail LOUD (the codec hook),
    malformed containers raise plain ValueError."""
    from melody_join_spark.operators.multimodal import (
        UnsupportedMediaFormatError,
        avi_mjpeg_frames,
    )

    avi, _, _ = _mk_avi(n_frames=2, strip=False)
    with pytest.raises(UnsupportedMediaFormatError):
        avi_mjpeg_frames(avi.replace(b"MJPG", b"H264"))
    with pytest.raises(ValueError):
        avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVE")
    # a '00dc' chunk that is not a JPEG: loud, not a silent byte-histogram
    bad = avi.replace(b"\xff\xd8", b"\x00\x00", 1)
    with pytest.raises((UnsupportedMediaFormatError, ValueError)):
        avi_mjpeg_frames(bad)


def test_video_frame_sample_real_frames(spark):
    """video_frame_sample emits decodable per-frame JPEG rows with source
    frame indices, striding and capping deterministically."""
    from melody_join_spark.operators.multimodal import (
        jpeg_decoder,
        video_frame_sample,
    )

    avi, frames, _ = _mk_avi(n_frames=5, strip=True)
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "media_id long, content binary"
    )
    rows = video_frame_sample(df, every_n=2, max_frames=2).collect()
    assert [(r.media_id, r.frame_idx) for r in rows] == [(1, 0), (1, 2)]
    for r in rows:
        hist = jpeg_decoder(bytes(r.frame), 27)  # spliced DHT -> decodable
        assert hist.shape == (27,) and abs(float(hist.sum()) - 1.0) < 1e-12


def test_decode_rgb_all_formats_agree_with_histograms():
    """decode_rgb taps the SAME pixel arrays the histogram decoders
    quantize: _color_cube_hist(decode_rgb(x)) == decoder(x, bins) for
    PPM, PNG and all three JPEG frame types."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from make_jpeg_fixtures import encode_jpeg, encode_jpeg_arith
    from make_png_fixtures import encode_png  # independent encoder

    from melody_join_spark.operators.multimodal import (
        _color_cube_hist,
        decode_rgb,
        jpeg_decoder,
        png_decoder,
        ppm_decoder,
    )

    yy, xx = np.mgrid[0:16, 0:24]
    img = np.stack(
        [(xx * 255) // 23, (yy * 255) // 15, ((xx + yy) * 255) // 38], -1
    ).astype(np.uint8)
    ppm = b"P6\n24 16\n255\n" + img.tobytes()
    cases = [
        (ppm, ppm_decoder),
        (
            encode_png(
                [[tuple(int(v) for v in img[y, x]) for x in range(24)]
                 for y in range(16)],
                2,
            ),
            png_decoder,
        ),
        (encode_jpeg(img, "444", 85)[0], jpeg_decoder),
        (encode_jpeg_arith(img, "420", 75)[0], jpeg_decoder),
    ]
    for payload, dec in cases:
        rgb = decode_rgb(payload)
        assert rgb.dtype == np.uint8 and rgb.shape == (16, 24, 3)
        hist = _color_cube_hist(rgb.reshape(-1, 3).astype(np.int64), 27)
        assert np.array_equal(hist, dec(payload, 27))
    # PPM round-trips losslessly at pixel level
    assert np.array_equal(decode_rgb(ppm), img)


def test_pixel_resizer_real_resample(spark):
    """pixel_resizer: nearest-neighbor exactness, budget fit, P6 closure
    (resized output re-enters decode_rgb), and the resize_media plumbing."""
    from melody_join_spark.operators.multimodal import (
        decode_rgb,
        pixel_resizer,
        resize_media,
    )

    yy, xx = np.mgrid[0:40, 0:60]
    img = np.stack(
        [(xx * 255) // 59, (yy * 255) // 39, ((xx * yy) % 256)], -1
    ).astype(np.uint8)
    ppm = b"P6\n60 40\n255\n" + img.tobytes()
    out = pixel_resizer(ppm, 1024)
    assert len(out) <= 1024
    small = decode_rgb(out)
    th, tw = small.shape[:2]
    assert th < 40 and tw < 60
    ys = (np.arange(th) * 40) // th
    xs = (np.arange(tw) * 60) // tw
    assert np.array_equal(small, img[ys][:, xs])  # exact NN resample
    # already-small inputs re-encode without resampling
    tiny = pixel_resizer(ppm, 10**6)
    assert np.array_equal(decode_rgb(tiny), img)
    # plumbing: resize_media with the real resizer updates length + meta
    from melody_join_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(
        [(7, "x.ppm", "image", bytearray(ppm), len(ppm), None)], MEDIA_SCHEMA
    )
    row = resize_media(df, target_bytes=1024, resizer=pixel_resizer).collect()[0]
    assert row.content_length <= 1024
    assert decode_rgb(bytes(row.content)).shape == (th, tw, 3)


def test_wav_spectral_decoder_pitch_and_oracle():
    """Spectral features separate pitch where amplitude histograms cannot:
    two equal-amplitude sines at different frequencies get near-identical
    amplitude histograms but disjoint spectral mass; and the engine's FFT
    pipeline agrees with the fixture's independent direct-DFT to ~1e-15."""
    import os
    import struct
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from make_media_fixtures import spectral_feature_dft

    from melody_join_spark.operators.multimodal import (
        wav_pcm_decoder,
        wav_spectral_decoder,
    )

    def wav(freq, n=1024, nch=1):
        t = np.arange(n)
        s = 0.7 * np.sin(2 * np.pi * freq * t)
        pcm = np.clip(s * 32767, -32768, 32767).astype("<i2")
        pcm = np.repeat(pcm, nch).astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, nch, 8000, 16000 * nch, 2 * nch, 16)
        ch = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        ch += b"data" + struct.pack("<I", len(pcm)) + pcm
        return b"RIFF" + struct.pack("<I", 4 + len(ch)) + b"WAVE" + ch

    # both frequencies sample their sine densely (periods of 50 and 12.5
    # samples), so the amplitude DISTRIBUTIONS are the same arcsine shape
    lo, hi = wav(0.02), wav(0.08)
    amp_gap = float(np.abs(wav_pcm_decoder(lo, 16) - wav_pcm_decoder(hi, 16)).sum())
    sp_lo, sp_hi = wav_spectral_decoder(lo, 16), wav_spectral_decoder(hi, 16)
    spec_gap = float(np.abs(sp_lo - sp_hi).sum())
    assert amp_gap < 0.1           # amplitude space: nearly identical
    assert spec_gap > 1.9          # frequency space: essentially disjoint
    # mass lands in the right band: freq f -> rfft bin f*256 -> band
    assert sp_lo.argmax() == int(0.02 * 256) * 16 // 129
    assert sp_hi.argmax() == int(0.08 * 256) * 16 // 129
    # independent direct-DFT oracle agreement (different algorithm family)
    for w_ in (lo, hi, wav(0.11, n=777, nch=2)):
        assert float(
            np.abs(wav_spectral_decoder(w_, 16) - spectral_feature_dft(w_, 16)).max()
        ) < 1e-12
    # stereo mono-mix: duplicated channels give the same feature as mono
    assert np.allclose(
        wav_spectral_decoder(wav(0.11, nch=2), 16),
        wav_spectral_decoder(wav(0.11, nch=1), 16),
        atol=1e-12,
    )
