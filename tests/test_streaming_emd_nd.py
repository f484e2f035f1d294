"""Stream-static d=2 EMD join: streaming micro-batches through the filter
cascade must equal the kernel brute force over the same stream x ref pairs."""

from __future__ import annotations

import numpy as np
import pytest

from melody_join_spark.kernel import normalize
from melody_join_spark.kernel.emd import emd_exact
from melody_join_spark.plans.tpch_bridge import (
    bin_points_2d,
    lineitem_histograms_2d,
)
from melody_join_spark.streaming import streaming_emd_join_nd

SF_DIR = "/root/testdata/sf0.001"
THETA = 1.0  # ~p15 of the stream x ref EMD distribution: selective, nonempty


def test_streaming_emd_join_nd_matches_kernel(spark, tmp_path):
    hist = lineitem_histograms_2d(spark, SF_DIR).select("id", "w").orderBy("id")
    rows = hist.collect()
    assert len(rows) >= 10, "need enough histograms for a meaningful split"
    ref_rows, stream_rows = rows[:8], rows[8:40]

    ref = spark.createDataFrame(ref_rows, hist.schema)
    src = str(tmp_path / "hist_stream")
    spark.createDataFrame(stream_rows, hist.schema).repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema("id long, w array<double>")
        .option("maxFilesPerTrigger", 1)  # several micro-batches, not one
        .parquet(src)
    )
    q = (
        streaming_emd_join_nd(stream, ref, bin_points_2d(), THETA)
        .writeStream.format("memory")
        .queryName("emd_nd_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = {
        (r.rid, r.sid): r.emd
        for r in spark.sql("SELECT * FROM emd_nd_stream").collect()
    }

    pts = bin_points_2d()
    C = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=2)
    RW = {r["id"]: normalize(np.asarray(r["w"])[None])[0] for r in ref_rows}
    SW = {r["id"]: normalize(np.asarray(r["w"])[None])[0] for r in stream_rows}
    exp = {}
    for sid_, rw in RW.items():
        for rid_, sw in SW.items():
            e = emd_exact(sw, rw, C)
            if e <= THETA + 1e-4:
                exp[(rid_, sid_)] = e

    assert set(got) == set(exp)
    for k, v in exp.items():
        assert abs(got[k] - v) < 1e-9
    assert len(exp) > 0, "trivial test: no qualifying pairs"
