"""Reference-conf compatibility: the same properties file + text data a
reference deployment uses drives the Spark engine, for every method name."""

from __future__ import annotations

import os

import numpy as np
import pytest

from melody_join_spark.compat import load_properties, run_join_from_properties
from melody_join_spark.kernel import emd_exact, ground_distance_matrix, normalize


@pytest.fixture(scope="module")
def ref_layout(spark, tmp_path_factory):
    """Reference-format data dir: histogram lines, one-line bins file."""
    root = tmp_path_factory.mktemp("ref")
    rng = np.random.default_rng(21)
    B, d, n = 8, 2, 36
    bins = rng.random((B, d)) * 3
    W = rng.random((n, B))
    hist_path = root / "hist.txt"
    with open(hist_path, "w") as fh:
        for i in range(n):
            fh.write(str(i + 1) + " " + " ".join(f"{x:.8f}" for x in W[i]) + "\n")
    bins_path = root / "bins.txt"
    with open(bins_path, "w") as fh:
        fh.write(" ".join(f"{x:.8f}" for x in bins.ravel()) + "\n")
    vec_path = root / "vectors.txt"
    vecs = rng.standard_normal((2, d))
    with open(vec_path, "w") as fh:
        fh.write(" ".join(f"{x:.8f}" for x in vecs.ravel()) + "\n")
    return {"root": root, "bins": bins, "W": W, "B": B, "d": d, "n": n,
            "hist": hist_path, "binsf": bins_path, "vecf": vec_path}


def _write_conf(ref, path, method, join_type, theta=0.4, k=8, out=None):
    lines = [
        "data.dimension=" + str(ref["d"]),
        "data.bin.number=" + str(ref["B"]),
        "data.input.hdfs.path=" + str(ref["hist"]),
        "data.bin.hdfs.path=" + str(ref["binsf"]),
        "melody.project.vector.hdfs.path=" + str(ref["vecf"]),
        "melody.project.vector.number=2",
        "melody.grid.cell.granularity=2",
        "melody.join.type=" + join_type,
        "melody.join.distance.threshold=" + str(theta),
        "melody.join.k=" + str(k),
        "mr.method.name=" + method,
    ]
    if out:
        lines.append("data.output.hdfs.path=" + str(out))
    path.write_text("\n".join(lines) + "\n")


def _oracle_pairs(ref, theta):
    cost = ground_distance_matrix(ref["bins"], dimension=ref["d"])
    Wn = normalize(ref["W"])
    out = set()
    for i in range(ref["n"]):
        for j in range(i + 1, ref["n"]):
            if emd_exact(Wn[i], Wn[j], cost) <= theta + 1e-4:
                out.add((i + 1, j + 1))
    return out


def test_load_properties(ref_layout, tmp_path):
    conf = tmp_path / "c.properties"
    _write_conf(ref_layout, conf, "melody", "distance")
    props = load_properties(str(conf))
    assert props["mr.method.name"] == "melody"
    assert props["data.bin.number"] == "8"


@pytest.mark.parametrize("method", ["melody", "mrsim", "bspb", "bspmelody"])
def test_all_methods_same_result(spark, ref_layout, tmp_path, method):
    theta = 0.4
    conf = tmp_path / f"{method}.properties"
    _write_conf(ref_layout, conf, method, "distance", theta=theta)
    res = run_join_from_properties(spark, str(conf), write_output=False)
    got = {(r.rid, r.sid) for r in res.collect()}
    assert got == _oracle_pairs(ref_layout, theta), method


def test_topk_and_text_output(spark, ref_layout, tmp_path):
    out_dir = tmp_path / "out"
    conf = tmp_path / "topk.properties"
    _write_conf(ref_layout, conf, "melody", "topk", k=6, out=out_dir)
    res = run_join_from_properties(spark, str(conf))
    rows = res.collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(range(1, 7))
    # text sink: one "<rank> <rid> <sid> <emd>" line per pair
    txt = spark.read.text(str(out_dir)).collect()
    assert len(txt) == 6
    assert all(len(r.value.split()) == 4 for r in txt)


def test_run_generate_from_properties(spark, tmp_path):
    """The Generate entry point (Generate.java:27) end to end from its own
    conf format: local binary dir -> per-feature histogram datasets ->
    reference-format text output, re-readable and join-ready."""
    from melody_join_spark.compat import run_generate_from_properties
    from melody_join_spark.sources.histogram_text import read_histogram_text

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(6):
        (img_dir / f"img_{i}.bin").write_bytes(bytes([i * 37 % 256]) * (50 + i))
    out_dir = tmp_path / "hists"
    conf = tmp_path / "gen.properties"
    conf.write_text(
        "generate.mode=mr\n"
        "generate.mr.input=local\n"
        f"generate.input.image.dir={img_dir}\n"
        f"generate.output.hist.dir={out_dir}\n"
        "generate.enabled.features=ch/jh\n"
        "data.bin.number=16\n"
    )
    out = run_generate_from_properties(spark, str(conf))
    assert set(out) == {"ch", "jh"}
    for feat, hist in out.items():
        rows = hist.collect()
        assert len(rows) == 6, feat
        assert all(len(r.w) == 16 for r in rows)
        # text sink round-trips through the reference-format reader
        back = read_histogram_text(spark, str(out_dir / feat)).collect()
        assert len(back) == 6
        assert all(len(r.w) == 16 for r in back)


def test_run_generate_custom_decoder_per_feature(spark, tmp_path):
    """The codec hook: a dict decoder routes each feature name to its own
    extractor (the GenerateUtil.java:44-60 registry analog)."""
    import numpy as np

    from melody_join_spark.compat import run_generate_from_properties

    img_dir = tmp_path / "imgs2"
    img_dir.mkdir()
    (img_dir / "a.bin").write_bytes(b"\x01\x02\x03" * 10)
    conf = tmp_path / "gen2.properties"
    conf.write_text(
        "generate.mr.input=local\n"
        f"generate.input.image.dir={img_dir}\n"
        "generate.enabled.features=cedd\n"
        "data.bin.number=4\n"
    )

    def cedd(content: bytes, bins: int) -> np.ndarray:
        return np.full(bins, float(len(content)))

    out = run_generate_from_properties(
        spark, str(conf), decoder={"cedd": cedd}, write_output=False
    )
    [r] = out["cedd"].collect()
    assert r.w == [30.0] * 4


def test_generate_from_properties_ppm_pixel_features(spark, tmp_path):
    """The compat Generate entry over the committed PPM corpus: the sniff
    default must produce PIXEL-level color-cube histograms (== ppm_decoder
    run directly), not byte histograms."""
    import numpy as np

    from melody_join_spark.compat import run_generate_from_properties
    from melody_join_spark.operators.multimodal import ppm_decoder

    conf = tmp_path / "gen.properties"
    conf.write_text(
        "generate.mr.input=local\n"
        "generate.input.image.dir=/root/repo/fixtures/media/ppm\n"
        "data.bin.number=27\n"
        "generate.enabled.features=ch\n"
    )
    out = run_generate_from_properties(
        spark, str(conf), write_output=False
    )
    hist = {r["id"]: np.array(r["w"]) for r in out["ch"].collect()}
    assert len(hist) > 50
    import glob

    f = sorted(glob.glob(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures/media/ppm/*.ppm")))[0]
    with open(f, "rb") as fh:
        want = ppm_decoder(fh.read(), 27)
    # find the matching row by value (ids are path hashes here)
    assert any(np.allclose(v, want, atol=1e-12) for v in hist.values())


def test_registry_rotation_policy():
    """Round-7 ADVICE: the 50-entry driver window rotation must be
    machine-checked — the live tail must match the latest ROTATION_TAILS
    history entry and no query may be parked outside the window two
    consecutive rounds (a skipped rotation would leave the same queries
    driver-unverified indefinitely)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import check_correctness

    assert check_correctness.check_rotation() == []

    import __spark_entry__ as em

    names = list(em.queries())
    hist = em.ROTATION_TAILS
    latest = max(hist)
    # registry = the driver's 50-entry window + the recorded tail (59
    # since round 9's media queries, 60 since round 10's decontaminate) —
    # derived from the rotation history so a new tail query can't desync
    # this count silently
    assert len(names) == len(set(names)) == 50 + len(hist[latest])
    # every registered query has been INSIDE the window in at least one of
    # the last two recorded rounds
    recent_tails = set(hist[latest]) & set(hist.get(latest - 1, ()))
    assert not recent_tails
