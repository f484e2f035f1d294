"""Crawl source tests: executor-side fetch of local/file:// media into the
canonical media table, error rows for failures, end-to-end into the
decode -> histogram pipeline (CrawlReducer.java analog, Spark-first)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from melody_join_spark.operators.multimodal import decode_features
from melody_join_spark.sources.crawl import (
    crawl_media,
    crawl_paths_from_dir,
)


@pytest.fixture()
def media_files(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    payloads = {}
    for i in range(6):
        p = d / f"img_{i}.bin"
        data = bytes([(i * 37 + j) % 256 for j in range(200 + 40 * i)])
        p.write_bytes(data)
        payloads[str(p)] = data
    return str(d), payloads


def test_crawl_local_paths(spark, media_files):
    d, payloads = media_files
    urls = crawl_paths_from_dir(spark, d, glob="*.bin")
    out = crawl_media(urls).collect()
    assert len(out) == len(payloads)
    for r in out:
        assert r.error is None
        assert bytes(r.content) == payloads[r.path]
        assert r.content_length == len(payloads[r.path])
        assert r.modality == "image"
    # hash-derived ids are stable and unique across distinct URLs
    assert len({r.media_id for r in out}) == len(out)


def test_crawl_file_scheme_and_explicit_ids(spark, media_files):
    d, payloads = media_files
    rows = [(i, "file://" + p) for i, p in enumerate(sorted(payloads))]
    urls = spark.createDataFrame(rows, "mid long, url string")
    out = crawl_media(urls, id_col="mid").orderBy("media_id").collect()
    assert [r.media_id for r in out] == list(range(len(rows)))
    assert all(r.error is None for r in out)


def test_crawl_failure_rows_not_fatal(spark, media_files):
    d, payloads = media_files
    good = sorted(payloads)[0]
    urls = spark.createDataFrame(
        [(good,), (good + ".does-not-exist",)], "url string"
    )
    out = {r.path: r for r in crawl_media(urls).collect()}
    assert out[good].error is None
    bad = out[good + ".does-not-exist"]
    assert bad.error is not None and bad.content is None
    assert bad.content_length == -1


def test_crawl_max_bytes_guard(spark, media_files):
    d, payloads = media_files
    biggest = max(payloads.values(), key=len)
    urls = crawl_paths_from_dir(spark, d, glob="*.bin")
    out = crawl_media(urls, max_bytes=len(biggest) - 1).collect()
    errs = [r for r in out if r.error is not None]
    assert errs and all("max_bytes" in r.error for r in errs)


def test_crawl_feeds_decode_pipeline(spark, media_files):
    """Generate path end-to-end: crawl -> media table -> byte-histogram
    features, the Spark analog of Generate.java's crawl+extract flow."""
    d, payloads = media_files
    media = crawl_media(crawl_paths_from_dir(spark, d)).where(
        F.col("error").isNull()
    )
    feats = decode_features(media, bins=8).collect()
    assert len(feats) == len(payloads)
    for r in feats:
        w = np.asarray(r.features)
        assert w.shape == (8,) and w.sum() > 0
