"""Checkpointed iteration harness shared by all fixpoint algorithms.

Replaces the reference's crash-recovery protocol — full ``State``
replication master→workers once per iteration
(``pkg/node/master.go:225-241``, report §III.C: queues drain at iteration
boundaries, a consistent cut) — with a per-iteration snapshot to
Parquet + a JSON manifest. The manifest is written LAST and acts as the
commit marker, so a killed job resumes from the newest *complete*
iteration (north_rule N4: "resumable from checkpoint with per-partition
lineage + metrics").

Each manifest records:
- iteration number, the loop's convergence statistic (delta / changed),
- wall-clock per phase (supplied by the algorithm),
- per-partition lineage: rows per physical partition of the snapshot
  (``spark_partition_id`` histogram) — the evidence trail for skew.

Two truncation modes:
- ``dir=None`` → ``localCheckpoint(eager=True)``: cuts lineage in memory,
  cheapest, no resume (used inside tests/benchmarks that don't exercise
  recovery);
- ``dir=...`` → Parquet write + read-back: durable, resumable, and also
  truncates lineage (the read-back plan is a fresh scan).

Fault-tolerance trade (r6): the iteration loops cut lineage every
iteration with UNREPLICATED lazy ``localCheckpoint`` snapshots — the
documented Spark trade of executor-loss recomputability for speed. In
local mode (one JVM) there is nothing to lose; on a cluster, losing an
executor mid-run aborts the job and recovery is the durable
``CheckpointManager`` path (pass ``checkpoint_dir=``), which snapshots
state to Parquet with a commit-marked manifest at the configured
cadence and resumes exactly — that path is unchanged and
kill/resume-tested.

Filesystem access goes through the Hadoop ``FileSystem`` API (via the
session's JVM gateway), so the same code works on ``file:``, ``hdfs:``
or ``s3a:`` checkpoint locations — required on a real cluster.
"""

from __future__ import annotations

import json
from contextlib import contextmanager
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"

# Runtime confs pinned for the duration of an iteration loop — the
# DEFAULT, re-measured per algorithm TWICE in r6 (tools/ab_loop_aqe.py,
# interleaved at sf0.1/local[32]) because the answer depends on the
# state representation. In the old persist-chain shape, AQE coalescing
# could BREAK the state/sums co-partitioning that keeps an update join
# exchange-free (cc measured 1.96× slower AQE-on, pagerank 1.21×). The
# fourth-wave lazy-checkpoint states FREEZE their layout in the RDD, so
# that failure mode is gone and AQE coalescing the per-iteration
# exchanges wins for most loops — re-measured on the checkpoint shape
# (min of 4, every rep faster): pagerank 0.78×, cc 0.84×, bfs 0.93×,
# plus the loops that always won (HITS 0.70×, labelprop 0.875×). Those
# pass KEEP_SESSION_CONFS. Still AQE-off (measured neutral-to-worse on
# the new shape): betweenness 1.03×, ppr 1.04×, k_core ~1.2×, k_truss
# ~1.0× — their per-round exchanges are already tiny or their loops are
# dominated by broadcast shapes AQE re-plans for no gain. AQE stays on
# for one-time preparation and everything outside loops.
LOOP_CONFS = {"spark.sql.adaptive.enabled": "false"}

# Sentinel for loops measured FASTER under the session's own (AQE-on)
# configuration: pins nothing, keeps the caller's runtime confs live.
KEEP_SESSION_CONFS: dict[str, str] = {}


@contextmanager
def loop_conf(spark: SparkSession, confs: dict[str, str] | None = None):
    """Set per-loop runtime confs, restoring the caller's values on exit.

    Mutable runtime SQL confs only; safe on any session (the correctness
    driver's included). Restores on exceptions too, so a failed loop never
    leaks its conf into the caller's session. ``confs=None`` applies the
    LOOP_CONFS default; pass KEEP_SESSION_CONFS (or any dict) to override
    — an empty dict pins nothing.
    """
    confs = LOOP_CONFS if confs is None else confs
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        try:
            spark.conf.set(k, v)
        except Exception:
            old.pop(k, None)  # immutable/unknown conf: leave untouched
    try:
        yield
    finally:
        for k, v in old.items():
            try:
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            except Exception:
                pass

_OBS_COUNTER = 0


def obs_name(prefix: str) -> str:
    """Session-unique Observation name.

    ``CollectMetrics`` names must be unique within a plan tree; result
    DataFrames keep their observe nodes (post-truncation iterations), so
    two algorithm runs in one session would collide on plain
    ``{prefix}_{iteration}`` names the moment their results are joined
    ([DUPLICATED_METRICS_NAME]). A process-wide counter keeps names unique
    across calls while staying deterministic for tests.
    """
    global _OBS_COUNTER
    _OBS_COUNTER += 1
    return f"{prefix}_r{_OBS_COUNTER}"


def release_local_checkpoint(df: DataFrame) -> None:
    """Release an iteration-state DataFrame the loop owns.

    ``DataFrame.unpersist()`` is a no-op for local checkpoints (they are
    cached at the RDD layer, not in the SQL cache manager); without this,
    an N-iteration loop pins N dead rank vectors in executor memory. The
    checkpointed plan is a LogicalRDD whose ``rdd`` is the cached one.

    OWNERSHIP GUARD: RDD-level release happens only when the DataFrame
    *is* the localCheckpoint product — its analyzed plan is a leaf
    LogicalRDD. Unwrapping derived (single-child) plans to their leaf is
    unsound: a state vector freshly derived from a caller-supplied
    localCheckpoint-ed input (e.g. connected components over the pair
    DataFrame that ``minhash_lsh_pairs`` returns) bottoms out at the
    *input's* LogicalRDD, and unpersisting that destroys blocks the loop
    does not own — the source is gone and every later recompute dies with
    "Checkpoint block not found". Anything else falls back to plain
    ``unpersist()`` (correct for the persist-chain iterates).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if (
            plan.children().size() == 0
            and plan.getClass().getSimpleName() == "LogicalRDD"
        ):
            plan.rdd().unpersist(False)
            return
    except Exception:
        pass
    try:
        df.unpersist()
    except Exception:
        pass


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def partition_lineage(df: DataFrame) -> list[dict[str, int]]:
    """Rows per physical partition — the per-partition lineage record."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .orderBy("partition_id")
        .collect()
    )
    return [{"partition_id": r["partition_id"], "rows": r["rows"]} for r in rows]


class CheckpointManager:
    """Per-iteration snapshot + manifest directory layout::

        {dir}/iter_00003/state.parquet/...
        {dir}/iter_00003/manifest.json      <- written last (commit marker)
    """

    def __init__(self, spark: SparkSession, directory: str | None):
        self.spark = spark
        self.dir = directory.rstrip("/") if directory else None

    def enabled(self) -> bool:
        return self.dir is not None

    def _iter_dir(self, iteration: int) -> str:
        return f"{self.dir}/iter_{iteration:05d}"

    def save(
        self,
        iteration: int,
        state: DataFrame,
        meta: dict[str, Any],
        collect_lineage: bool = True,
    ) -> DataFrame:
        """Snapshot ``state``; return the read-back (lineage-truncated) DF."""
        if not self.enabled():
            return state.localCheckpoint(eager=True)
        d = self._iter_dir(iteration)
        state.write.mode("overwrite").parquet(f"{d}/state.parquet")
        reloaded = self.spark.read.parquet(f"{d}/state.parquet")
        manifest = dict(meta)
        manifest["iteration"] = iteration
        if collect_lineage:
            manifest["partitions"] = partition_lineage(reloaded)
            manifest["rows"] = sum(p["rows"] for p in manifest["partitions"])
        manifest["complete"] = True
        _write_text(self.spark, f"{d}/{MANIFEST}", json.dumps(manifest, indent=1))
        return reloaded

    def completed_iterations(self) -> list[int]:
        if not self.enabled():
            return []
        fs, hpath, _ = _fs(self.spark, self.dir)
        if not fs.exists(hpath):
            return []
        out = []
        for status in fs.listStatus(hpath):
            name = status.getPath().getName()
            if not name.startswith("iter_"):
                continue
            mpath = f"{self.dir}/{name}/{MANIFEST}"
            mfs, mh, _ = _fs(self.spark, mpath)
            if mfs.exists(mh):
                try:
                    if json.loads(_read_text(self.spark, mpath)).get("complete"):
                        out.append(int(name.split("_")[1]))
                except Exception:
                    continue
        return sorted(out)

    def latest(self) -> tuple[int, DataFrame, dict[str, Any]] | None:
        """Newest complete snapshot → (iteration, state, manifest) or None."""
        done = self.completed_iterations()
        if not done:
            return None
        it = done[-1]
        d = self._iter_dir(it)
        manifest = json.loads(_read_text(self.spark, f"{d}/{MANIFEST}"))
        return it, self.spark.read.parquet(f"{d}/state.parquet"), manifest

    def manifest(self, iteration: int) -> dict[str, Any]:
        return json.loads(
            _read_text(self.spark, f"{self._iter_dir(iteration)}/{MANIFEST}")
        )
