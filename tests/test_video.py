"""Video modality: the binary-column pattern on the frame axis (decode,
frame sampling, per-frame features, scene-cut flag, quarantine) — parity
vs the pure-numpy oracle, mirroring the image/audio suites."""

from __future__ import annotations

import pandas as pd
import pytest

from curator_spark.ops import multimodal
from curator_spark.scoring import video as vid
from curator_spark.synth import videogen

SF_DIR = "/root/testdata/sf0.001"


def test_video_features_match_pure_python_oracle(spark):
    got: dict[tuple, dict] = {}
    for r in multimodal.video_frame_features(spark, SF_DIR).collect():
        got[(r["video_id"], r["frame_idx"])] = r
    for i in (0, 1, 2, 7, 33, 59):
        row = videogen.make_video(i)
        if row["fmt"] != "gray8_seq":
            assert got[(i, None)]["decode_ok"] is False
            continue
        exp = vid.decode_features(
            row["data"], row["fmt"], row["width"], row["height"], row["n_frames"]
        )
        for f in exp:
            g = got[(i, f["frame_idx"])]
            assert g["decode_ok"] is True
            assert g["mean_lum"] == pytest.approx(round(f["mean_lum"], 6), abs=1e-9)
            assert g["motion"] == pytest.approx(round(f["motion"], 6), abs=1e-9)
            assert g["is_cut"] is bool(f["is_cut"])


def test_video_planted_cuts_detected(spark):
    """Every 4th video inverts content mid-clip (videogen) — the sampled
    frame straddling the midpoint must flag is_cut; smooth-drift videos
    must not."""
    rows = multimodal.video_frame_features(spark, SF_DIR).collect()
    by_vid: dict[int, list] = {}
    for r in rows:
        if r["decode_ok"]:
            by_vid.setdefault(r["video_id"], []).append(r)
    cut_vids = {v for v, rs in by_vid.items() if any(r["is_cut"] for r in rs)}
    planted = {v for v in by_vid if v % 4 == 1}
    # a cut lands between two SAMPLED frames only when the midpoint does
    # not fall inside a sampling gap edge case; require high recall, zero
    # false positives
    assert cut_vids <= planted
    assert len(cut_vids) >= 0.8 * len(planted)


def test_video_features_invariant_across_partitionings(spark):
    a = multimodal.video_decode_stage(multimodal.generate_videos(spark, 30, 2)).collect()
    b = multimodal.video_decode_stage(multimodal.generate_videos(spark, 30, 7)).collect()
    ka = {(r["video_id"], r["frame_idx"]): tuple(r) for r in a}
    kb = {(r["video_id"], r["frame_idx"]): tuple(r) for r in b}
    assert ka == kb


def test_unsupported_and_corrupt_videos_quarantined_not_fatal(spark):
    good = videogen.make_video(0)
    assert good["fmt"] == "gray8_seq"
    rows = pd.DataFrame(
        [
            good,
            {**videogen.make_video(1), "video_id": 101, "fmt": "vp9"},  # stub codec
            {**videogen.make_video(2), "video_id": 102, "data": b"VID0\ngarbage"},
            {**videogen.make_video(3), "video_id": 103, "n_frames": 9999},  # meta mismatch
        ]
    )
    df = spark.createDataFrame(rows, schema=multimodal.VIDEOS_SCHEMA)
    out = multimodal.video_decode_stage(df).collect()
    by_vid: dict[int, list] = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert all(r["decode_ok"] for r in by_vid[0]) and len(by_vid[0]) > 1
    for bad in (101, 102, 103):
        (q,) = by_vid[bad]
        assert q["decode_ok"] is False and q["frame_idx"] is None
