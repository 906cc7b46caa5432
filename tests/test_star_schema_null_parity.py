"""Gate-harness sweep over a POISONED star schema: NULL text / lang /
source in ``documents`` and NULL value / user_id / ts / event_type /
props in ``events`` — the row classes a web-scale crawl contains daily
and the seeded testdata never does. Runs the REAL ``queries()`` vs
``oracle_sql()`` comparison (the driver-gate shape, via
tools/verify_oracles) over the poisoned tables, so any NULL-semantics
drift between a Spark op and its DuckDB twin fails here first.

Divergences this sweep caught when introduced (all fixed): minhash
oracles emitting NULL signatures for NULL text (md5(NULL)) while the
kernel shingles ``''``; cross_doc_dup_spans dropping NULL-text docs
through an equi-join on a NULL gram; quality_scores NULL-vs-zero
feature drift; the spike/hopping/retention rollups disagreeing on
timeless and anonymous events (Spark orders NULLs first, DuckDB last;
Spark groupBy keeps a NULL group its equi-join twin drops)."""

import os
import shutil
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC_SF = "/root/testdata/sf0.001"

# queries over the star-schema tables (the media families generate their
# own input and have their own adversarial matrix in
# test_oracle_null_parity.py)
MEDIA_PREFIXES = (
    "audio", "image", "video", "clip", "mm_", "multimodal", "loudness",
    "window_decode", "duration", "cmvn", "speech", "pii_scrub", "trim",
    "spectral", "cepstral", "pitch",
)


@pytest.fixture(scope="module")
def poisoned_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("adv_star"))
    for t in "region nation customer supplier part orders lineitem embeddings".split():
        shutil.copyfile(f"{SRC_SF}/{t}.parquet", f"{dst}/{t}.parquet")

    docs = pq.read_table(f"{SRC_SF}/documents.parquet").to_pandas()
    mx = int(docs["doc_id"].max())
    poison = pd.DataFrame([
        {"doc_id": mx + 1, "text": None, "lang": "en", "source": "adv", "n_chars": 0},
        {"doc_id": mx + 2, "text": "", "lang": "en", "source": "adv", "n_chars": 0},
        {"doc_id": mx + 3, "text": "   ", "lang": "en", "source": "adv", "n_chars": 3},
        {"doc_id": mx + 4, "text": "normal words here for the adversarial row",
         "lang": None, "source": "adv", "n_chars": 41},
        {"doc_id": mx + 5, "text": "x", "lang": "de", "source": None, "n_chars": 1},
        # Unicode rows: char-vs-byte drift bait for the shingle/split
        # kernels' non-ASCII fallback paths (accents, sharp-s, CJK,
        # emoji, NBSP separators, combining characters) — verified
        # hash-exact across engines; keep them so a future kernel edit
        # cannot silently regress the fallback
        {"doc_id": mx + 6, "text": "café straße naïve ÀÉÎÕÜ the and of to a côté encore",
         "lang": "fr", "source": "adv", "n_chars": 52},
        {"doc_id": mx + 7, "text": "数据 处理 管道 在 大规模 下 运行 the and of to a 测试",
         "lang": "zh", "source": "adv", "n_chars": 33},
        {"doc_id": mx + 8, "text": "emoji 🙂 row 🚀 with the and of to a symbols ∆ ∑ π",
         "lang": "en", "source": "adv", "n_chars": 49},
        {"doc_id": mx + 9, "text": "nbsp separated words the and of to a plus thinspace",
         "lang": "en", "source": "adv", "n_chars": 52},
        {"doc_id": mx + 10, "text": "combining é acute and ä umlaut the and of to a",
         "lang": "en", "source": "adv", "n_chars": 49},
        # round-5 excision bait for remove_dup_spans: a SECOND empty doc
        # (the md5('') span gram is now held by two docs - the later one
        # must be excised to ''), and an aligned shared-span pair: mx+13
        # carries mx+12's 65-char text behind a 10-char prefix (stride-
        # aligned), so its shared windows merge to one cut and only the
        # prefix and the post-window tail survive
        {"doc_id": mx + 11, "text": "", "lang": "de", "source": "adv", "n_chars": 0},
        {"doc_id": mx + 12,
         "text": "the quick brown fox jumps over the lazy dog again and again today",
         "lang": "en", "source": "adv", "n_chars": 65},
        {"doc_id": mx + 13,
         "text": "PREFIX10__the quick brown fox jumps over the lazy dog again and again today",
         "lang": "en", "source": "adv", "n_chars": 75},
    ])
    pq.write_table(
        pa.Table.from_pandas(pd.concat([docs, poison], ignore_index=True),
                             preserve_index=False),
        f"{dst}/documents.parquet",
    )

    ev = pq.read_table(f"{SRC_SF}/events.parquet").to_pandas()
    emx = int(ev["event_id"].max())
    ts0 = ev["ts"].iloc[0]
    pe = pd.DataFrame([
        {"event_id": emx + 1, "ts": ts0, "user_id": 42, "event_type": "click",
         "value": None, "props": "{}"},
        {"event_id": emx + 2, "ts": ts0, "user_id": None, "event_type": "purchase",
         "value": 1.5, "props": "{}"},
        {"event_id": emx + 3, "ts": pd.NaT, "user_id": 43, "event_type": "click",
         "value": 2.0, "props": "{}"},
        {"event_id": emx + 4, "ts": ts0, "user_id": 44, "event_type": None,
         "value": 3.0, "props": "{}"},
        {"event_id": emx + 5, "ts": ts0, "user_id": 45, "event_type": "error",
         "value": 4.0, "props": None},
    ])
    out = pd.concat([ev, pe], ignore_index=True)
    out["ts"] = out["ts"].astype("datetime64[us]")  # Spark cannot read NANOS
    out["user_id"] = out["user_id"].astype("Int64")
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                   f"{dst}/events.parquet")
    return dst


def test_star_queries_match_oracles_on_poisoned_tables(poisoned_sf):
    # subprocess, NOT in-process: verify_oracles.main builds AND STOPS a
    # SparkSession — run in this process it would stop the suite's shared
    # session and kill every test after this one. The env override makes
    # oracle literals that train on the data (IVF centroids, doc LM
    # weights) train on the SAME poisoned tables.
    import subprocess

    script = f"""
import sys
sys.path.insert(0, "/root/repo/tools"); sys.path.insert(0, "/root/repo")
import verify_oracles
import __spark_entry__ as entrymod
only = [q for q in entrymod.queries()
        if not q.startswith({MEDIA_PREFIXES!r})]
assert len(only) >= 60, only
sys.exit(verify_oracles.main(sf_dir={poisoned_sf!r}, only=only))
"""
    env = dict(os.environ, SPARK_GRAFT_ORACLE_SF_DIR=poisoned_sf)
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env,
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    assert proc.stdout.count("OK   ") >= 60


def test_null_embedding_fails_loud_at_validation(spark, tmp_path):
    """The embeddings contract is FAIL-LOUD, not quarantine: a NULL
    vector raises a clean driver-side ValueError at validation (there is
    no meaningful near-dup semantics for a missing embedding), never an
    opaque worker traceback from deep inside the SRP kernel —
    size(NULL) is NULL under ANSI, which min/max silently ignore."""
    from curator_spark.ops import dedup

    emb = pq.read_table(f"{SRC_SF}/embeddings.parquet").to_pandas()
    emb.loc[1, "embedding"] = None
    dst = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(emb, preserve_index=False),
                   f"{dst}/embeddings.parquet")
    with pytest.raises(ValueError, match="NULL vector"):
        dedup.embedding_near_dups_fixture(spark, dst).count()


def test_null_embedding_ivf_training_fails_loud(spark, tmp_path):
    """IVF training collects a bounded sample driver-side; a NULL vector
    must raise a clean error NAMING the offending ids, not numpy's
    opaque 'inhomogeneous shape' from inside np.asarray."""
    from curator_spark.ops import similarity

    emb = pq.read_table(f"{SRC_SF}/embeddings.parquet").to_pandas()
    emb.loc[0, "embedding"] = None  # at this scale rate=1: every row sampled
    dst = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(emb, preserve_index=False),
                   f"{dst}/embeddings.parquet")
    with pytest.raises(ValueError, match="NULL vector"):
        similarity.ivf_topk(spark, dst).count()
