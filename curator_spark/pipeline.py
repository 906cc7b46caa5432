"""Pipeline orchestration: fingerprint → resume anti-join → staged commit.

The Spark re-expression of ``BaseRequestProcessor.run`` (SURVEY.md §3.1):

- **Fingerprint** (≙ xxh64 run identity, ``llm/llm.py:139-164``):
  ``blake2b(input snapshot id + canonical config JSON)``. Same input + same
  config ⇒ same fingerprint ⇒ completed work is never redone.
- **Resume** (≙ completed-row scan, ``base_request_processor.py:496-539``):
  the checkpoint table holds one row per committed (fingerprint,
  partition_key); uncommitted keys are selected with a partition-key
  anti-filter (the broadcast-anti-join degenerate: key list is tiny).
- **Partition-grouped commits** (≙ batch chunking + ``batch_objects.jsonl``
  state machine, ``base_batch_request_processor.py:334-343,504-545``):
  the ``n_partitions`` logical keys are processed in ``commit_batches``
  groups; each group commits output (idempotent dynamic partition
  overwrite) *then* its checkpoint rows — a crash between the two commits
  re-runs the group and overwrites the same partitions, so the protocol is
  idempotent in the order written.
- **Audit/lineage** (≙ status trackers, ``online_status_tracker.py:59-93``):
  per (partition_key, stage) rows_in/rows_out/rows_error + metrics map.

Scale notes (100 TB / 1000 executors):
- ``part_key = pmod(xxhash64(clip_id), n_partitions)`` — hash partitioning
  on a unique key is the salting strategy: the skewed transcript-length and
  codec distributions decorrelate from partition assignment, so byte-sized
  partitions stay balanced in expectation; AQE skew handling covers the
  tail. ``n_partitions`` scales with the table (10^12 clips → ~100k keys),
  giving failure blast radius = table/``n_partitions`` per retried task and
  resume granularity = one key.
- the pipeline is shuffle-free end-to-end: scan → narrow maps → partitioned
  write. The only wide exchange is the ``repartition`` aligning file layout
  with ``part_key`` before the write (one shuffle of the *decoded, bytes-
  free* rows, never the audio).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifest as manifest_mod
from . import stages
from .catalog import ParquetCatalog, dir_snapshot_id
from .config import PipelineConfig

OUTPUT_TABLE = "clips_labeled"
CHECKPOINT_TABLE = "checkpoints"
AUDIT_TABLE = "audit"
RUNS_TABLE = "runs"


def hash_part_key(n_partitions: int):
    """THE partitioning expression (salting strategy — see module
    docstring). One definition: the recompute-fallback, the no-part_key
    branch, and the streaming path must never drift apart, or resume keys
    split across incompatible layouts."""
    return F.pmod(F.xxhash64("clip_id"), F.lit(n_partitions)).cast("int")


def _run_table(fingerprint: str) -> str:
    """Run-scoped output subdir (hive-style, so reading the table root
    still works and exposes ``run_fp``). Isolates each fingerprint's
    partitions — without this, a second run with a different fingerprint
    into the same warehouse would leave the first run's partitions in
    place wherever it writes nothing, and output()/audit would silently
    mix rows of both runs (≙ the reference's cache-dir-per-run-hash,
    ``llm/llm.py:166-243``)."""
    return f"{OUTPUT_TABLE}/run_fp={fingerprint}"

AUDIT_STAGES = ("decode", "score", "scrub", "decide")


def _src_file_expr():
    """Source-file provenance, normalized to a plain absolute path:
    Spark's ``input_file_name()`` returns a ``file:``-scheme,
    PERCENT-ENCODED URI while the manifest reader records the raw OS path
    — the dedup (clip_id, digest, src_file) join must see ONE spelling or
    cross-file marks silently miss (a path containing a space arrives as
    ``%20`` on one side and ``' '`` on the other). A literal ``+`` is
    pre-protected as ``%2B`` because ``url_decode`` follows
    x-www-form-urlencoded semantics and would turn it into a space,
    which ``Path.toUri`` never produces."""
    path = F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
    return F.url_decode(F.regexp_replace(path, r"\+", "%2B"))


@dataclass
class RunResult:
    fingerprint: str
    groups_run: list[int] = field(default_factory=list)
    groups_skipped: list[int] = field(default_factory=list)
    partitions_run: int = 0
    partitions_skipped: int = 0
    cached: bool = False
    timings: dict[str, float] = field(default_factory=dict)  # step → seconds
    scan_mode: str = ""  # resolved physical scan strategy


class Pipeline:
    def __init__(self, spark: SparkSession, catalog: ParquetCatalog, cfg: PipelineConfig):
        self.spark = spark
        self.catalog = catalog
        self.cfg = cfg
        self.last_fingerprint: str | None = None

    # -- resume state ------------------------------------------------------

    def committed_keys(self, fingerprint: str) -> set[int]:
        if not self.catalog.exists(CHECKPOINT_TABLE):
            return set()
        rows = (
            self.catalog.read(CHECKPOINT_TABLE)
            .filter(F.col("run_fingerprint") == fingerprint)
            .select("partition_key")
            .distinct()
            .collect()
        )
        return {r[0] for r in rows}

    def _audit_keys(self, fingerprint: str) -> set[int]:
        """Partition keys already recorded in the audit log for this
        fingerprint (crash-resume dedup; read once per run)."""
        if not self.catalog.exists(AUDIT_TABLE):
            return set()
        return {
            r[0]
            for r in self.catalog.read(AUDIT_TABLE)
            .filter(F.col("run_fingerprint") == fingerprint)
            .select("partition_key")
            .distinct()
            .collect()
        }

    # -- main entry --------------------------------------------------------

    def run(self, input_path: str, failpoint_after_groups: int | None = None) -> RunResult:
        """Label every clip in ``input_path``; resumable + idempotent.

        ``failpoint_after_groups`` aborts after N group commits — the test
        harness's analog of the reference's SIGALRM kill
        (``tests/integrations/test_all.py:36-49``).
        """
        from datetime import datetime, timezone

        cfg = self.cfg
        t0 = time.monotonic()
        started_at = datetime.now(timezone.utc)
        fingerprint = cfg.fingerprint(dir_snapshot_id(input_path))
        self.last_fingerprint = fingerprint
        done = self.committed_keys(fingerprint)
        self._audit_done = self._audit_keys(fingerprint)
        res = RunResult(fingerprint=fingerprint)
        res.timings["resume_scan"] = time.monotonic() - t0

        all_keys = set(range(cfg.n_partitions))
        if done >= all_keys:  # job-level cache hit (≙ F5 short-circuit)
            res.cached = True
            res.partitions_skipped = len(all_keys)
            # covers resume-after-crash completing via checkpoints alone:
            # the runs row is deduped, so a normal cache hit appends nothing
            self._commit_run_row(fingerprint, input_path, started_at, res)
            return res

        raw = self.spark.read.parquet(input_path)
        mode = cfg.scan_mode
        if mode == "auto":
            mode = "column" if "part_key" in raw.columns else "manifest"
        if mode == "manifest" and set(raw.columns) != set(manifest_mod.CLIP_COLUMNS):
            # the manifest reader materializes exactly the clip schema; an
            # input with extra/missing columns must take the generic column
            # path rather than silently dropping data
            mode = "column"
        res.scan_mode = mode

        man = None
        if mode == "manifest":
            # driver-side split planning (≙ Iceberg manifest scan): each
            # commit group reads exactly its own files, and the audio bytes
            # are read by the Python workers directly — see manifest.py.
            t1 = time.monotonic()
            man = manifest_mod.build_manifest(input_path, cfg.n_partitions)
            res.timings["plan_manifest"] = time.monotonic() - t1
            base = None
        elif "part_key" in raw.columns:
            # input laid out by part_key (hive-partitioned parquet / Iceberg
            # bucket partition): the per-group isin() filter below becomes
            # *partition pruning* — each group reads only its own files.
            # Without one of these two pruned paths, G commit groups re-scan
            # the full table G times (1.6 PB of reads for a 100 TB table at
            # G=16).
            #
            # The layout must cover range(n_partitions) exactly: a table
            # laid out with a DIFFERENT partition count (or null keys)
            # would leave rows no commit group ever selects — silently
            # dropped while the run reports complete. One column-pruned
            # agg validates; on mismatch we recompute part_key from
            # clip_id. NOTE: the recomputed column cannot partition-prune,
            # so the fallback pays the generic computed-key cost (each
            # commit group scans the table) — correctness over speed; the
            # warning tells the operator to re-layout the input.
            # the type gate matters as much as the range gate: the commit
            # filters select INTEGER keys, so a double part_key holding
            # 3.5 would pass a min/max check yet match no group (silently
            # dropped rows), and a string column would make the driver
            # comparisons below raise
            pk_type = dict(raw.dtypes)["part_key"]
            if pk_type in ("tinyint", "smallint", "int", "bigint"):
                s = raw.agg(
                    F.min("part_key").alias("lo"),
                    F.max("part_key").alias("hi"),
                    F.sum(F.col("part_key").isNull().cast("long")).alias("nulls"),
                ).collect()[0]
                problem = None
                if (s["nulls"] or 0) > 0 or s["lo"] is None or s["lo"] < 0 or s["hi"] >= cfg.n_partitions:
                    problem = (
                        f"layout [{s['lo']}, {s['hi']}] (nulls={s['nulls']}) does "
                        f"not fit n_partitions={cfg.n_partitions}"
                    )
            else:
                problem = (
                    f"column type {pk_type!r} is not integral, so integer commit "
                    "groups could never select its rows"
                )
            if problem is not None:
                if "clip_id" not in raw.columns:
                    raise ValueError(
                        f"input part_key {problem} and no clip_id column exists "
                        "to recompute it"
                    )
                import warnings

                warnings.warn(
                    f"input part_key {problem}; recomputing part_key from clip_id",
                    stacklevel=2,
                )
                base = raw.drop("part_key").withColumn("part_key", hash_part_key(cfg.n_partitions))
            else:
                base = raw
        else:
            base = raw.withColumn("part_key", hash_part_key(cfg.n_partitions))

        dup_marks = None
        if cfg.dedup_exact:
            t1 = time.monotonic()
            dup_marks = self._dedup_marks(raw)
            if base is not None and "clip_id" in raw.columns and base is raw:
                # _apply_dedup's within-file row_number is group-LOCAL, so
                # its correctness needs every row of a clip_id in ONE
                # commit group. The hash-derived part_key guarantees that;
                # a pre-partitioned input's plain part_key column does not
                # (two identical rows could carry different in-range keys).
                # One column-pruned agg validates; on violation recompute
                # part_key from clip_id — correctness over pruning, same
                # stance as the range-validation fallback above.
                split_ids = (
                    raw.groupBy("clip_id")
                    .agg(F.count_distinct("part_key").alias("nk"))
                    .filter(F.col("nk") > 1)
                    .head(1)
                )
                if split_ids:
                    import warnings

                    warnings.warn(
                        "dedup_exact: input part_key is not a function of clip_id "
                        f"(e.g. clip_id={split_ids[0]['clip_id']!r} spans "
                        f"{split_ids[0]['nk']} keys); recomputing part_key from "
                        "clip_id so duplicate rows share a commit group",
                        stacklevel=2,
                    )
                    base = raw.drop("part_key").withColumn(
                        "part_key", hash_part_key(cfg.n_partitions)
                    )
            res.timings["plan_dedup"] = time.monotonic() - t1
            if base is not None:
                # the stage reserves these two names; silently overwriting
                # (and later dropping) a user column of the same name would
                # lose input data that a dedup_exact=False run preserves
                clash = {"src_file", "digest"} & set(base.columns)
                if clash:
                    raise ValueError(
                        f"dedup_exact reserves column(s) {sorted(clash)} for "
                        "row provenance; rename them in the input or disable "
                        "the stage"
                    )
                # row provenance for the cross-file same-id case plus the
                # content digest, hashed BEFORE the scoring stages
                # normalize NULL transcripts to '' (see _apply_dedup); the
                # manifest path carries both natively
                base = base.withColumn("src_file", _src_file_expr()).withColumn(
                    "digest", stages.transcript_digest()
                )

        groups_done = 0
        for g in range(cfg.commit_batches):
            group_keys = {k for k in all_keys if k % cfg.commit_batches == g}
            missing = sorted(group_keys - done)
            if not missing:
                res.groups_skipped.append(g)
                res.partitions_skipped += len(group_keys)
                continue

            t0 = time.monotonic()
            if man is not None:
                splits_g = man.splits[man.splits["part_key"].isin(missing)]
                rows_in = {k: man.rows_per_key[k] for k in missing}
                labeled = (
                    stages.catalyst_suffix(
                        manifest_mod.decode_score_splits(
                            self.spark, splits_g, with_src=cfg.dedup_exact
                        ),
                        cfg.rules,
                    )
                    if len(splits_g)
                    else None
                )
            else:
                from pyspark.sql import Observation

                df_g = base.filter(F.col("part_key").isin(missing))
                # input-side row counts ride the write job as observe()
                # metrics — still independent evidence at the SCAN (the
                # audit reconciles them against the committed output), but
                # without the extra full-input job a post-write
                # groupBy().count() would launch per commit group. One
                # conditional sum per missing key; bounded by
                # n_partitions/G, never by data volume.
                obs_in = Observation(f"rows_in_g{g}")
                df_g = df_g.observe(
                    obs_in,
                    *[
                        F.sum((F.col("part_key") == int(k)).cast("long")).alias(f"k{k}")
                        for k in missing
                    ],
                )
                rows_in = None  # resolved from obs_in after the write
                labeled = stages.apply_all(df_g, cfg.rules)
            if labeled is not None and dup_marks is not None:
                labeled = self._apply_dedup(labeled, dup_marks)
            if labeled is not None:
                if man is None:
                    # align file layout with part_key (bytes already dropped
                    # by decode, so this shuffle is text+floats only)
                    labeled = labeled.repartition(
                        max(1, min(len(missing), self.spark.sparkContext.defaultParallelism)),
                        "part_key",
                    )
                # manifest mode: splits are already clustered by part_key —
                # the partitioned write is shuffle-free
                self.catalog.overwrite_partitions(labeled, _run_table(fingerprint), "part_key")
            wall_ms = int((time.monotonic() - t0) * 1000)
            res.timings[f"write_g{g}"] = wall_ms / 1000

            t1 = time.monotonic()
            if rows_in is None:
                m = obs_in.get  # populated by the write job just above
                rows_in = {int(k): int(m[f"k{k}"] or 0) for k in missing}
            res.timings[f"rows_in_g{g}"] = time.monotonic() - t1
            t1 = time.monotonic()
            self._commit_audit(fingerprint, missing, rows_in, wall_ms)
            res.timings[f"audit_g{g}"] = time.monotonic() - t1
            t1 = time.monotonic()
            self._commit_checkpoints(fingerprint, missing)
            res.timings[f"checkpoint_g{g}"] = time.monotonic() - t1

            res.groups_run.append(g)
            res.partitions_run += len(missing)
            res.partitions_skipped += len(group_keys) - len(missing)
            groups_done += 1
            if failpoint_after_groups is not None and groups_done >= failpoint_after_groups:
                raise RuntimeError(f"failpoint: aborted after {groups_done} group commits")
        self._commit_run_row(fingerprint, input_path, started_at, res)
        return res

    # -- exact-dedup stage -------------------------------------------------

    def _dedup_marks(self, raw: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Global duplicate-mark frames: ``(id_marks, file_marks)``.

        - ``id_marks``: DISTINCT (clip_id, digest) pairs whose clip_id is
          a NON-canonical holder of that transcript (canonical = global
          min clip_id per content digest, the same choice
          ``ops.dedup.dedup_exact`` and the streaming dedup make). Keyed
          at (id, digest) grain — an id-only mark would also hit a
          DIFFERENT transcript that happens to live under the same
          clip_id (a re-landed id carrying one duped + one corrected row)
          and drop the corrected content entirely.
        - ``file_marks``: for CANONICAL (id, digest) rows that appear in
          several source files (the identical-file-re-landed case — same
          clip_id, same content, different file), the (clip_id, digest,
          src_file) triples of every file except the first (min path).
          The file key lets exactly the canonical file's copy survive.
          Within-ONE-file copies are handled per row in ``_apply_dedup``
          — a file's rows always share a commit group (manifest mode keys
          per file; column mode keys per clip_id hash, enforced for
          pre-partitioned inputs in :meth:`run`).

        One column-pruned scan (clip_id + transcript + file name — the
        parquet reader never touches ``bytes``), one digest shuffle,
        materialized eagerly so the commit groups reuse it instead of
        re-scanning the input per group. Deterministic under resume: the
        marks depend only on the input, not on commit order."""
        from pyspark.sql import Window as W

        rows = raw.select(
            "clip_id",
            stages.transcript_digest().alias("digest"),
            _src_file_expr().alias("src_file"),
        )
        id_dup = F.col("clip_id") != F.min("clip_id").over(W.partitionBy("digest"))
        file_dup = F.col("src_file") != F.min("src_file").over(
            W.partitionBy("digest", "clip_id")
        )
        marked = rows.select(
            "clip_id", "digest", "src_file", id_dup.alias("id_dup"), file_dup.alias("file_dup")
        ).localCheckpoint(eager=True)
        id_marks = marked.filter("id_dup").select("clip_id", "digest").distinct()
        file_marks = (
            marked.filter(~F.col("id_dup") & F.col("file_dup"))
            .select("clip_id", "digest", "src_file")
            .distinct()
        )
        return id_marks, file_marks

    @staticmethod
    def _apply_dedup(labeled: DataFrame, marks: tuple[DataFrame, DataFrame]) -> DataFrame:
        """Label duplicate clips keep=false with 'duplicate' appended to
        reasons (≙ the reference's cache-identity skip, F5 — the row is
        retained for lineage/audit rather than silently vanishing). Three
        duplicate classes (see ``_dedup_marks``): non-canonical (id,
        digest) holders, canonical rows re-landed in later files (global
        (id, digest, file) join), and extra copies within one file
        (group-local row_number — safe because a file's rows share the
        commit group). ``labeled`` must carry ``digest`` and ``src_file``
        columns (threaded through the decode pass — the digest is hashed
        BEFORE null-transcript normalization so it agrees with the marks'
        raw-side hash). Exactly one row per distinct transcript survives
        unmarked.

        The joins broadcast when the duplicate sets are small (AQE
        decides); at 10^12 clips with a large dup set they degrade to
        hash joins on the same key the output is already salted by."""
        from pyspark.sql import Window as W

        id_marks, file_marks = marks
        im = id_marks.withColumn("_id_dup", F.lit(True))
        fm = file_marks.withColumn("_file_dup", F.lit(True))
        # within-file copies are identical rows — any survivor is right,
        # so the constant orderBy's nondeterminism is harmless
        rn = F.row_number().over(
            W.partitionBy("clip_id", "digest", "src_file").orderBy(F.lit(1))
        )
        is_dup = (
            F.coalesce(F.col("_id_dup"), F.lit(False))
            | F.coalesce(F.col("_file_dup"), F.lit(False))
            | (rn > 1)
        )
        return (
            labeled.join(im, ["clip_id", "digest"], "left")
            .join(fm, ["clip_id", "digest", "src_file"], "left")
            .withColumn("_is_dup", is_dup)
            .withColumn("keep", F.when(F.col("_is_dup"), F.lit(False)).otherwise(F.col("keep")))
            .withColumn(
                "reasons",
                F.when(
                    F.col("_is_dup"), F.concat("reasons", F.array(F.lit("duplicate")))
                ).otherwise(F.col("reasons")),
            )
            .drop("_id_dup", "_file_dup", "_is_dup", "src_file", "digest")
        )

    # -- runs catalog ------------------------------------------------------

    def _commit_run_row(self, fingerprint: str, input_path: str, started_at, res: RunResult) -> None:
        """One queryable row per completed run fingerprint (≙ the
        reference's ``runs`` metadata DB, ``db.py:59-131``): fingerprint →
        canonical config JSON + input + timestamps. Deduped — a resume or
        cache-hit of the same fingerprint keeps the original row.

        The read-then-append dedup here is best-effort, not atomic: two
        drivers completing the same fingerprint concurrently can both pass
        the exists probe and append. That is tolerated on the READ side —
        :meth:`runs` collapses to one row per fingerprint — the same
        duplicates-are-harmless stance the checkpoint table takes
        (``committed_keys`` reads DISTINCT partition keys)."""
        import pandas as pd

        if self.catalog.exists(RUNS_TABLE):
            seen = (
                self.catalog.read(RUNS_TABLE)
                .filter(F.col("run_fingerprint") == fingerprint)
                .head(1)
            )
            if seen:
                return
        pdf = pd.DataFrame(
            {
                "run_fingerprint": [fingerprint],
                "config_json": [self.cfg.canonical_json()],
                "input_path": [input_path],
                "started_at": [started_at],
                "partitions_run": pd.array([res.partitions_run], dtype="int32"),
                "partitions_skipped": pd.array([res.partitions_skipped], dtype="int32"),
            }
        )
        df = (
            self.spark.createDataFrame(pdf)
            .withColumn("finished_at", F.current_timestamp())
            .coalesce(1)  # driver-sized log append (see _commit_checkpoints)
        )
        self.catalog.append(df, RUNS_TABLE)

    RUNS_SCHEMA = (
        "run_fingerprint string, config_json string, input_path string, "
        "started_at timestamp, partitions_run int, partitions_skipped int, "
        "finished_at timestamp"
    )

    def runs(self) -> DataFrame:
        """Enumerate past runs (fingerprint, config, timestamps): one row
        per fingerprint (earliest ``finished_at`` wins — concurrent
        completers may have appended twice; see ``_commit_run_row``).
        An empty typed DataFrame when no run has ever committed, so
        callers can always ``.filter``/``.join`` without an exists probe."""
        from pyspark.sql import Window as W

        if not self.catalog.exists(RUNS_TABLE):
            return self.spark.createDataFrame([], self.RUNS_SCHEMA)
        df = self.catalog.read(RUNS_TABLE)
        w = W.partitionBy("run_fingerprint").orderBy("finished_at")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # -- commits -----------------------------------------------------------

    def _commit_checkpoints(self, fingerprint: str, keys: list[int]) -> None:
        import pandas as pd

        # pandas input → Arrow-local plan: tiny commit jobs stay JVM-side
        # (a list input would route through a per-job Python RDD worker)
        pdf = pd.DataFrame(
            {
                "run_fingerprint": [fingerprint] * len(keys),
                "partition_key": pd.array([int(k) for k in keys], dtype="int32"),
                "stage": ["pipeline"] * len(keys),
            }
        )
        df = (
            self.spark.createDataFrame(pdf)
            .withColumn("committed_at", F.current_timestamp())
            .coalesce(1)  # driver-sized log append: one file, one task
        )
        self.catalog.append(df, CHECKPOINT_TABLE)

    def _commit_audit(
        self, fingerprint: str, keys: list[int], rows_in: dict[int, int], wall_ms: int
    ) -> None:
        """Per-(partition, stage) lineage rows, derived from the committed
        output (so audit reflects what was actually written). Keys with no
        input rows (possible in manifest mode when files < keys) get
        zero-count rows — trivially complete.

        Idempotent: a crash between this append and the checkpoint commit
        re-runs the group, so keys already present for this fingerprint are
        skipped rather than appended twice (audit consumers sum rows_in/
        rows_out — duplicates would break the reconciliation). The
        already-recorded set is read once per run (``_audit_done``), not
        per group."""
        keys = [k for k in keys if int(k) not in self._audit_done]
        if not keys:
            return
        self._audit_done.update(int(k) for k in keys)
        if self.catalog.exists(_run_table(fingerprint)):
            out = self.catalog.read(_run_table(fingerprint)).filter(F.col("part_key").isin(list(keys)))
        else:  # every key in this group was empty
            out = None
        agg = [] if out is None else (
            out.groupBy("part_key")
            .agg(
                F.count("*").alias("rows_out"),
                F.sum(F.when(~F.col("decode_ok"), 1).otherwise(0)).alias("decode_err"),
                F.avg("rms_db").alias("mean_rms_db"),
                F.avg("ppl").alias("mean_ppl"),
                F.avg("lang_conf").alias("mean_lang_conf"),
                F.sum("scrub_hits").alias("sum_scrub_hits"),
                F.sum("tox_hits").alias("sum_tox_hits"),
                F.avg(F.col("keep").cast("double")).alias("keep_rate"),
            )
            .collect()
        )
        stage_metrics = {
            "decode": lambda r: {"mean_rms_db": r["mean_rms_db"]},
            "score": lambda r: {"mean_ppl": r["mean_ppl"], "mean_lang_conf": r["mean_lang_conf"]},
            "scrub": lambda r: {
                "sum_scrub_hits": float(r["sum_scrub_hits"] or 0),
                "sum_tox_hits": float(r["sum_tox_hits"] or 0),
            },
            "decide": lambda r: {"keep_rate": r["keep_rate"]},
        }
        import pandas as pd

        rows = []
        seen = set()
        for r in agg:
            k = r["part_key"]
            seen.add(int(k))
            for stage in AUDIT_STAGES:
                rows.append(
                    (
                        fingerprint,
                        int(k),
                        stage,
                        int(rows_in.get(k, 0)),
                        int(r["rows_out"]),
                        int(r["decode_err"]) if stage == "decode" else 0,
                        wall_ms,
                        {m: float(v) for m, v in stage_metrics[stage](r).items() if v is not None},
                    )
                )
        for k in keys:  # empty keys: zero-count lineage rows
            if int(k) not in seen:
                for stage in AUDIT_STAGES:
                    rows.append((fingerprint, int(k), stage, 0, 0, 0, wall_ms, {}))
        cols = [
            "run_fingerprint", "partition_key", "stage", "rows_in",
            "rows_out", "rows_error", "wall_ms", "metrics",
        ]
        # pandas input → Arrow-local plan (see _commit_checkpoints)
        df = self.spark.createDataFrame(
            pd.DataFrame(rows, columns=cols),
            "run_fingerprint string, partition_key int, stage string, rows_in long, "
            "rows_out long, rows_error long, wall_ms long, metrics map<string,double>",
        ).coalesce(1)  # driver-sized log append: one file, one task
        self.catalog.append(df, AUDIT_TABLE)

    # -- views -------------------------------------------------------------

    def output(self, fingerprint: str | None = None) -> DataFrame:
        """The labeled table of one run (default: the last ``run()`` on this
        Pipeline). Reading the table root instead would mix runs — every
        fingerprint keeps its own partition subtree."""
        fp = fingerprint or self.last_fingerprint
        if fp is None:  # no run() yet: all runs, with run_fp exposed
            return self.catalog.read(OUTPUT_TABLE)
        return self.catalog.read(_run_table(fp))

    def kept(self) -> DataFrame:
        """The curated view — predicate pushed to the parquet/Iceberg scan."""
        return self.output().filter(F.col("keep"))

    def cost_report(self, rates=None, fingerprint: str | None = None) -> DataFrame:
        """Per-stage USD rollup of one run (default: the last ``run()``),
        priced from the audit table's measured rows + wall time — the
        reference's running cost tracker (``cost.py:16-143`` per-model
        USD map folded into the status tracker), re-expressed as a
        post-run audit consumer (SURVEY §2.5 A1)."""
        from .cost import DEFAULT_RATES, measured_stage_costs

        fp = fingerprint or self.last_fingerprint
        audit = self.catalog.read(AUDIT_TABLE)
        if fp is not None:
            audit = audit.filter(F.col("run_fingerprint") == fp)
        return measured_stage_costs(audit, rates or DEFAULT_RATES)
