"""Mixed-modality row op: fused decode, per-modality quarantine, parity.

Reference analog: the ``_MultiModalPrompt`` payload (types/prompt.py:12-117)
— one row carrying text + audio + image, decoded lazily per modality.
"""

from __future__ import annotations

import math

import pytest

from curator_spark.ops import multimodal
from curator_spark.scoring import audio as audio_scoring
from curator_spark.scoring import image as image_scoring
from curator_spark.synth import mmrows

N = 60


@pytest.fixture(scope="module")
def mm_result(spark):
    df = mmrows.generate_mm_rows(spark, N, 4)
    rows = multimodal.multimodal_row_stage(df).orderBy("row_id").collect()
    return {r["row_id"]: r for r in rows}


def _nanish(v) -> bool:
    """Quarantined doubles surface as NULL after the Arrow boundary
    (pyarrow folds pandas NaN into the validity mask) — accept either."""
    return v is None or (isinstance(v, float) and math.isnan(v))


def test_per_modality_quarantine_is_independent(mm_result):
    """A stub audio codec must not poison the image features and vice
    versa; row 0 trips BOTH stubs (0 % 17 == 0 % 23 == 0)."""
    both_bad = mm_result["clip_000000000000"]
    assert not both_bad["audio_ok"] and not both_bad["image_ok"]
    assert _nanish(both_bad["rms_db"]) and both_bad["silence_ratio"] == 1.0
    assert both_bad["mean_lum"] is None and both_bad["contrast"] is None

    audio_bad = mm_result[f"clip_{17:012d}"]  # 17 % 23 != 0
    assert not audio_bad["audio_ok"] and audio_bad["image_ok"]
    assert audio_bad["mean_lum"] is not None

    image_bad = mm_result[f"clip_{23:012d}"]  # 23 % 17 != 0
    assert image_bad["audio_ok"] and not image_bad["image_ok"]
    assert not _nanish(image_bad["rms_db"])


def test_parity_vs_pure_python(mm_result):
    """Stage output must equal the single-node recompute row for row."""
    for i in (1, 2, 5, 35):  # healthy rows (not divisible by 17 or 23)
        raw = mmrows.mm_row(i)
        got = mm_result[raw["row_id"]]
        pcm = audio_scoring.decode(raw["bytes"], raw["codec"], raw["sr_hz"])
        af = audio_scoring.features(pcm, raw["sr_hz"], raw["dur_ms"])
        imf = image_scoring.decode_features(
            raw["image"], raw["img_fmt"], raw["width"], raw["height"]
        )
        assert got["audio_ok"] and got["image_ok"]
        assert got["rms_db"] == pytest.approx(af["rms_db"], abs=1e-12)
        assert got["silence_ratio"] == pytest.approx(af["silence_ratio"], abs=1e-12)
        assert got["mean_lum"] == pytest.approx(imf["mean_lum"], abs=1e-12)
        assert got["contrast"] == pytest.approx(imf["contrast"], abs=1e-12)
        words = [w for w in raw["transcript"].split(" ") if w]
        assert got["n_words"] == len(words)
        assert got["n_chars"] == len(raw["transcript"])


def test_partitioning_invariance(spark, mm_result):
    """Same rows through 1 partition == through 4 (no partition-dependent
    state in the fused stage)."""
    one = (
        multimodal.multimodal_row_stage(mmrows.generate_mm_rows(spark, N, 1))
        .orderBy("row_id")
        .collect()
    )
    assert len(one) == N == len(mm_result)
    for r in one:
        base = mm_result[r["row_id"]]
        for c in r.asDict():
            a, b = r[c], base[c]
            if _nanish(a) or _nanish(b):
                assert _nanish(a) and _nanish(b), (r["row_id"], c, a, b)
            else:
                assert a == b, (r["row_id"], c, a, b)


def test_gate_query_schema_and_rows(spark):
    df = multimodal.multimodal_row_features(spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "row_id", "n_chars", "n_words", "rms_db", "silence_ratio",
        "mean_lum", "contrast", "audio_ok", "image_ok",
    ]
    rows = df.limit(5).collect()
    assert len(rows) == 5


def test_mm_quality_filter_semantics(spark):
    """The multimodal keep/drop: quarantined modalities always drop with
    the decode reason; keeps have every modality ok and no rule reason;
    reason composition matches a per-row recompute."""
    rows = {
        r["row_id"]: r
        for r in multimodal.mm_quality_filter(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(rows) == 200
    both_bad = rows["clip_000000000000"]
    assert not both_bad["keep"]
    assert "audio_decode" in both_bad["reasons"] and "image_decode" in both_bad["reasons"]
    kept = [r for r in rows.values() if r["keep"]]
    dropped = [r for r in rows.values() if not r["keep"]]
    assert kept and dropped  # thresholds actually split the fixture
    assert all(r["reasons"] == "" for r in kept)
    assert all(r["reasons"] != "" for r in dropped)
