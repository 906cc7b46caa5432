"""Image modality: the binary-column pattern beyond audio (decode, feature
extraction, resize, quarantine) — parity vs the pure-numpy oracle, exactly
like the audio SNR/parity suite."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from curator_spark.ops import multimodal
from curator_spark.scoring import image as img
from curator_spark.synth import imagegen

SF_DIR = "/root/testdata/sf0.001"


def test_image_features_match_pure_python_oracle(spark):
    got = {r["image_id"]: r for r in multimodal.image_decode_features(spark, SF_DIR).collect()}
    assert len(got) == 200 and all(r["decode_ok"] for r in got.values())
    for i in (0, 1, 2, 7, 99, 199):
        row = imagegen.make_image(i)
        exp = img.decode_features(row["data"], row["fmt"], row["width"], row["height"])
        for k in ("mean_lum", "contrast", "entropy", "edge_strength", "aspect"):
            assert got[i][k] == pytest.approx(round(exp[k], 6), abs=1e-9), (i, k)
        assert got[i]["thumb_bytes"] == int(exp["thumb_bytes"])


def test_image_features_invariant_across_partitionings(spark):
    a = multimodal.image_decode_stage(multimodal.generate_images(spark, 60, 2)).collect()
    b = multimodal.image_decode_stage(multimodal.generate_images(spark, 60, 7)).collect()
    ka = {r["image_id"]: tuple(r) for r in a}
    kb = {r["image_id"]: tuple(r) for r in b}
    assert ka == kb


def test_unsupported_and_corrupt_images_quarantined_not_fatal(spark):
    good = imagegen.make_image(4)
    rows = pd.DataFrame(
        [
            good,
            {**imagegen.make_image(5), "fmt": "png"},  # external codec → stub raises
            {**imagegen.make_image(6), "data": b"P6\ngarbage"},  # corrupt header
            {**imagegen.make_image(8), "width": 9999},  # metadata mismatch
        ]
    )
    df = spark.createDataFrame(rows, schema=multimodal.IMAGES_SCHEMA)
    out = {r["image_id"]: r for r in multimodal.image_decode_stage(df).collect()}
    assert out[4]["decode_ok"] is True
    assert all(out[i]["decode_ok"] is False for i in (5, 6, 8))
    assert all(out[i]["mean_lum"] is None for i in (5, 6, 8))


def test_thumbnail_downsamples_deterministically():
    px = imagegen.make_pixels(12)
    th = img.thumbnail(px, max_side=8)
    assert max(th.shape[:2]) <= 8 and th.shape[2] == 3
    assert np.array_equal(th, img.thumbnail(px, max_side=8))
    # a square-ish source keeps its aspect within rounding
    assert abs((th.shape[1] / th.shape[0]) - (px.shape[1] / px.shape[0])) < 0.5
