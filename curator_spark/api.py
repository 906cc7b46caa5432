"""Generic user-defined map stages — the reference's ``LLM`` / ``CodeExecutor``
surface re-expressed Spark-first.

Reference semantics being reproduced (SURVEY.md §2.2, §2.9):

- ``LLM.prompt(row)`` / ``LLM.parse(row, resp)`` — user functions mapped over
  every row, with per-row bounded retry and permanent-failure quarantine
  (``base_online_request_processor.py:455-544``), fan-out parse (1 row → N
  rows, ``base_request_processor.py:346-359``), structured-output schema
  enforcement (``prompt_formatter.py:124-169``), and order restoration via
  ``__original_row_idx`` (``base_request_processor.py:469-475``).
- ``CodeExecutor`` — the same lifecycle around an arbitrary per-row
  executor (``code_executor/code_executor.py:99-181``).

Spark mapping: the user supplies a **vectorized** function over pandas
batches (never per-row Python at the API boundary — input_hint mandate);
``VectorMap`` wraps it in ``mapInPandas`` with:

- bounded batch-level retry, then per-row isolation retry: a failing batch
  is re-tried whole ``retries`` times, then split row-by-row so only the
  truly-poisoned rows are quarantined (``_error`` column set, all output
  columns null) — the Spark analog of per-request retry→failure.
- fan-out: the user fn may return MORE or FEWER rows than it received, but
  must carry ``row_key`` through so lineage joins stay possible (explode ≙
  parse returning a list).
- deterministic output: stages must be pure functions of the batch; order
  restoration is a terminal ``orderBy(row_key)``, applied only at export
  just like the reference's final sort.

The caching/fingerprint/resume lifecycle for these stages is the same
:class:`curator_spark.pipeline.Pipeline` machinery (run fingerprints ≙
``llm/llm.py:139-164``); ``fingerprint_fn`` hashes the user function's
source exactly like the reference pickles+hashes ``prompt``/``parse``.
"""

from __future__ import annotations

import hashlib
import inspect
import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame


def fingerprint_fn(*fns: Callable) -> str:
    """Content identity of user code (≙ xxh64 over function source,
    ``llm/llm.py:146-151``): same source ⇒ same stage fingerprint."""
    h = hashlib.blake2b(digest_size=16)
    for fn in fns:
        try:
            h.update(inspect.getsource(fn).encode())
        except (OSError, TypeError):  # builtins / lambdas from REPL
            # a source-less function's stripped repr is just its qualname
            # — two different REPL lambdas named '<lambda>' would collide
            # into one fingerprint (silent wrong cache HIT). Its compiled
            # body is still available: mix in the bytecode + consts +
            # names, which differ whenever behavior differs.
            code = getattr(fn, "__code__", None)
            if code is not None:
                h.update(code.co_code)
                h.update(repr((code.co_consts, code.co_names)).encode())
            h.update(_stable_repr(fn).encode())
    return h.hexdigest()


def _closure_repr(fn: Callable) -> str:
    """Captured parameters are part of a stage's identity: two stages from
    the same factory with different closed-over args (e.g.
    ``code_exec_stage(timeout_s=10)`` vs ``600``) share SOURCE, so source
    alone would collide their cache/resume fingerprints and a rerun with
    new parameters would be served the stale results. Captured callables
    hash by their own source (a raw repr would embed a per-process memory
    address and spuriously bust the cache between identical runs)."""
    return _closure_repr_at(fn, 0)


def _closure_repr_at(fn: Callable, depth: int) -> str:
    if depth > 4:  # cycles / pathological nesting — identity gets fuzzy here
        return "<deep>"
    try:
        nonlocals = inspect.getclosurevars(fn).nonlocals
    except TypeError:
        return ""
    parts = []
    for name in sorted(nonlocals):
        v = nonlocals[name]
        if callable(v):
            # recurse: a factory often captures its params one level down
            # (code_exec_stage's timeout_s lives in _run_one's closure,
            # which _exec captures) — source alone would miss them
            parts.append((name, fingerprint_fn(v), _closure_repr_at(v, depth + 1)))
        else:
            parts.append((name, _stable_repr(v)))
    return repr(parts)


_ADDR_RE = re.compile(r" at 0x[0-9a-fA-F]+")
_DEFAULT_REPR_RE = re.compile(r"^<(.+) object at 0x[0-9a-fA-F]+>$")


def _stable_repr(v, depth: int = 0) -> str:
    """repr with per-process memory addresses neutralized: a captured
    object with the default ``<Foo object at 0x7f..>`` repr would change
    the stage fingerprint EVERY process — cache/resume would never hit
    again. But a bare address STRIP would be worse than the instability:
    two instances with DIFFERENT state (``DbHandle('prod')`` vs
    ``DbHandle('staging')``) would collide into one fingerprint and a
    resume could serve the other configuration's cached results — a
    silent wrong HIT. So a default-repr object is reconstructed from its
    type + ``__dict__`` (recursively sanitized, depth-capped), keeping
    distinct state distinct while staying process-stable; addresses
    nested inside container reprs are stripped as the lossy fallback."""
    r = repr(v)
    m = _DEFAULT_REPR_RE.match(r)
    if m and depth < 4:
        # harvest state from __dict__ AND __slots__ (a __slots__ class
        # has no __dict__, so its instances would otherwise all collapse
        # to a state-less repr — two differently-configured captures
        # colliding into one fingerprint, the silent wrong HIT above)
        state = dict(getattr(v, "__dict__", None) or {})
        for klass in type(v).__mro__:
            for slot in getattr(klass, "__slots__", ()) or ():
                if slot not in ("__dict__", "__weakref__") and slot not in state:
                    try:
                        state[slot] = getattr(v, slot)
                    except AttributeError:  # declared but never assigned
                        pass
        inner = (
            ", ".join(
                f"{k}={_stable_repr(vv, depth + 1)}"
                for k, vv in sorted(state.items())
            )
            if state
            else ""
        )
        return f"<{m.group(1)}({inner})>"
    return _ADDR_RE.sub(" at 0x", r)


@dataclass(frozen=True)
class VectorMap:
    """A named, retry-wrapped vectorized map stage.

    ``fn(pdf) -> pdf`` over pandas batches; ``out_schema`` is the full
    output schema DDL **excluding** the ``_error`` column (added
    automatically, null = success). ``key`` must be a column the user fn
    preserves (lineage / order restoration).
    """

    name: str
    fn: Callable[[pd.DataFrame], pd.DataFrame]
    out_schema: str
    key: str = "row_key"
    retries: int = 2
    # M8 per-row params override (≙ prompt_formatter.py:101-112): stage
    # defaults merged under a per-row map column; the user fn sees one
    # effective dict per row in ``_params``.
    defaults: tuple = ()  # dict-like ((k, v), ...) — frozen dataclass needs hashable
    params_col: str | None = None

    @property
    def fingerprint(self) -> str:
        return fingerprint_fn(self.fn) + hashlib.blake2b(
            repr(
                (self.defaults, self.params_col, self.retries, _closure_repr(self.fn))
            ).encode(),
            digest_size=8,
        ).hexdigest()

    def __call__(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.types import StructType

        fn, key, retries = self.fn, self.key, self.retries
        defaults, params_col = dict(self.defaults), self.params_col
        if params_col and params_col not in df.columns:
            # validated on the DRIVER, before any job launches: a typo'd
            # column name is a wiring bug — surfacing it as a clean
            # AnalysisException-style error beats a whole-job
            # PythonException after task retries (and silently running
            # every row on pure defaults would be worse still)
            raise KeyError(
                f"VectorMap params_col {params_col!r} not in input columns {df.columns}"
            )
        schema = f"{self.out_schema}, _error string"
        # real DDL parse — a naive comma split would mangle nested types
        # (map<string,double>, decimal(10,2), struct<...>)
        out_cols = list(StructType.fromDDL(self.out_schema).fieldNames())

        def _apply(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if defaults or params_col:
                    row_ps = pdf[params_col] if params_col else [None] * len(pdf)
                    # Arrow renders map<k,v> as a list/ndarray of (k, v)
                    # pairs; dict() accepts those and plain dicts; NULL
                    # maps arrive as None (or NaN) → no override
                    def _merge(p):
                        if p is None or (isinstance(p, float) and p != p):
                            return dict(defaults)
                        return {**defaults, **dict(p)}

                    pdf = pdf.assign(_params=[_merge(p) for p in row_ps])
                yield _run_batch(pdf, fn, key, out_cols, retries)

        return df.mapInPandas(_apply, schema=schema)


def _quarantine(pdf: pd.DataFrame, key: str, out_cols: list[str], err: str) -> pd.DataFrame:
    out = pd.DataFrame({c: [None] * len(pdf) for c in out_cols})
    if key in pdf.columns:
        out[key] = list(pdf[key])
    out["_error"] = [err] * len(pdf)
    return out


def _run_batch(
    pdf: pd.DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    key: str,
    out_cols: list[str],
    retries: int,
) -> pd.DataFrame:
    last_err = None
    # retries counts RE-tries, per the documented contract: 1 initial
    # attempt + `retries` whole-batch retries before bisecting (so a
    # transient failure is always re-tried at least once when retries>=1
    # instead of going straight to O(log n) per-row sub-runs)
    for _ in range(1 + max(0, retries)):
        try:
            out = fn(pdf.copy())
            out = out[[c for c in out_cols if c in out.columns]].copy()
            out["_error"] = None
            return out
        except Exception as e:  # noqa: BLE001 - bounded retry then isolate
            last_err = e
    if len(pdf) <= 1:  # single poisoned row → quarantine (≙ failed request)
        return _quarantine(pdf, key, out_cols, f"{type(last_err).__name__}: {last_err}")
    mid = len(pdf) // 2  # bisect: only truly-poisoned rows get quarantined
    # sub-runs get a single attempt each: the batch already consumed its
    # retry budget, bisection is only isolating the poisoned rows
    left = _run_batch(pdf.iloc[:mid], fn, key, out_cols, 0)
    right = _run_batch(pdf.iloc[mid:], fn, key, out_cols, 0)
    # all-NA quarantine halves vs typed success halves: the intermediate
    # pandas dtype after concat is irrelevant — mapInPandas converts with
    # the DECLARED Spark schema either way — so the pandas 3.x empty/all-NA
    # concat change cannot alter results. Align dtypes where NA permits it
    # and silence the FutureWarning for the rest (int siblings).
    import warnings

    for a, b in ((left, right), (right, left)):
        for col in a.columns:
            if a[col].isna().all() and not b[col].isna().all():
                try:
                    a[col] = a[col].astype(b[col].dtype)
                except (TypeError, ValueError):
                    pass
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        return pd.concat([left, right], ignore_index=True)


def ok(df: DataFrame) -> DataFrame:
    """Successful rows (≙ failed-response filter F2)."""
    return df.filter(df["_error"].isNull()).drop("_error")


def failed(df: DataFrame) -> DataFrame:
    """Quarantined rows for inspection/retry (≙ error sample A5)."""
    return df.filter(df["_error"].isNotNull())


def run_with_retries(stage: VectorMap, df: DataFrame, max_passes: int = 2) -> DataFrame:
    """Run ``stage`` and then re-run ONLY its quarantined rows, up to
    ``max_passes`` total attempts, merging recovered rows over their
    quarantined versions — the reference's rewrite-the-response-file-minus-
    failures retry sub-DAG (``base_request_processor.py:508-537``).

    Each pass is a full Spark sub-job on the failed subset (selected with a
    semi-join on ``stage.key``); rows still failing after the last pass
    keep their ``_error``. The early-exit probe is one small count() per
    pass — bounded by ``max_passes``, exactly like the reference's bounded
    resubmission loop.

    Each pass's output is snapshotted (eager localCheckpoint) before rows
    are routed on ``_error``: transiently-failing stages are exactly the
    point of this function, and a lazy plan would RE-EXECUTE the earlier
    pass at consumption time — after the transient condition cleared —
    flipping quarantined rows to success and duplicating them against
    their retried copies.

    Contract: ``stage.key`` must be unique and non-null per INPUT row
    (the same lineage contract VectorMap itself imposes) — rows are routed
    by key, so a duplicated key would retry-and-duplicate its siblings.
    Quarantined rows with a null key cannot be matched back to an input
    row; they are kept quarantined in the output rather than retried."""
    out = stage(df).localCheckpoint(eager=True)
    for _ in range(max(0, max_passes - 1)):
        bad_keys = (
            out.filter(out["_error"].isNotNull() & out[stage.key].isNotNull())
            .select(stage.key)
            .distinct()
            .persist()  # consumed twice: the count() probe and the semi-join
        )
        if bad_keys.count() == 0:
            bad_keys.unpersist()
            break
        retried = stage(df.join(bad_keys, stage.key, "left_semi"))
        out = (
            # keep: successes + null-key quarantines (unretryable)
            out.filter(out["_error"].isNull() | out[stage.key].isNull())
            .unionByName(retried)
            .localCheckpoint(eager=True)  # materializes before unpersist
        )
        bad_keys.unpersist()
    return out


def code_exec_stage(
    name: str = "code_exec",
    timeout_s: float = 10.0,
    retries: int = 1,
) -> VectorMap:
    """The reference's ``CodeExecutor`` re-expressed (SURVEY §2.2 M7,
    ``code_executor/code_executor.py:99-181`` + multiprocessing backend):
    each input row carries ``code`` (a Python program) and ``stdin``; the
    stage runs them in isolated subprocesses (one per row, bounded wall
    time) and emits stdout/stderr/exit code. Vectorized at the batch level
    — the Arrow batch fans out to a local process pool, the analog of the
    reference's per-row multiprocessing backend (Ray/Docker tiers map to
    executor scaling / container images on a real cluster).

    Input columns: ``row_key``, ``code string``, ``stdin string``.

    **Execution semantics: at-least-once.** Spark may re-run a task after
    executor loss, and a poisoned row in a batch triggers bisect re-runs
    of its batch-mates (``_run_batch``) — so a row's program can execute
    up to ``retries + log2(batch)`` times. Programs must be idempotent
    (pure compute, or external effects keyed on ``row_key``); this is the
    same contract the reference's retried request processors impose on
    user code.
    """
    import subprocess
    import sys

    def _run_one(args: tuple[str, str]) -> tuple[str, str, int]:
        code, stdin = args
        try:
            p = subprocess.run(
                [sys.executable, "-I", "-c", code],
                input=stdin or "",
                capture_output=True,
                text=True,
                timeout=timeout_s,
            )
            return p.stdout, p.stderr, int(p.returncode)
        except subprocess.TimeoutExpired:
            return "", f"timeout after {timeout_s}s", -1

    def _exec(pdf: pd.DataFrame) -> pd.DataFrame:
        from concurrent.futures import ThreadPoolExecutor  # procs are the work

        with ThreadPoolExecutor(max_workers=8) as pool:
            res = list(pool.map(_run_one, zip(pdf["code"], pdf["stdin"])))
        out = pdf[["row_key"]].copy()
        out["stdout"] = [r[0] for r in res]
        out["stderr"] = [r[1] for r in res]
        out["exit_code"] = [r[2] for r in res]
        return out

    return VectorMap(
        name=name,
        fn=_exec,
        out_schema="row_key long, stdout string, stderr string, exit_code int",
        retries=retries,
    )
