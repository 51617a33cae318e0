"""Shared operator utilities."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize_once(df: DataFrame) -> DataFrame:
    """Persist a frame that multiple downstream consumers will read.

    ``persist(MEMORY_AND_DISK)`` rather than ``localCheckpoint``:
    lineage is PRESERVED, so losing an executor recomputes the lost
    blocks instead of failing the job — the right default for the
    100 TB posture (a local checkpoint's blocks live only on the
    executor that wrote them; one lost node kills the query). Disk
    spill keeps large materializations from evicting under memory
    pressure. Use ``cut_lineage`` only where lineage TRUNCATION is
    the goal (iterative algorithms whose plans would otherwise grow
    per round, e.g. connected components).
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def narrow_when_tiny(df: DataFrame, max_rows: int = 2_000) -> DataFrame:
    """Materialize a multi-consumer frame; if it turns out TINY,
    re-lay it out as a single partition.

    Iterative consumers (connected components, PageRank, label
    propagation) run one join+agg over this frame per round; when the
    graph is a few HUNDRED rows, the per-round cost is pure
    scheduling of 32-task stages, and a single-partition layout turns
    every round into narrow one-task stages. The round-5 threshold of
    100k rows was a measured PESSIMIZATION at sf0.1 (bench A/B:
    label-prop 3.6s->6.9s, pagerank 3.1s->5.2s, keep-central
    2.6s->3.9s with the helper at 100k — the sf0.1 pair graph has
    thousands of edges and single-task iterative rounds lose badly on
    32 cores), so the default is now 2k, below which the single-task
    layout genuinely wins and above which the frame keeps its
    distributed layout. The registry's graph queries no longer call
    this at all (plain ``materialize_once`` — the r6 bench numbers in
    BENCH_r06.json are the record); the helper remains for genuinely
    hundred-row frames.
    """
    m = materialize_once(df)
    if m.count() <= max_rows:
        narrow = materialize_once(m.repartition(1))
        # Force the narrow copy BEFORE dropping the wide one —
        # unpersisting first would make the lazy repartition recompute
        # the whole upstream plan instead of reading the cache.
        narrow.count()
        m.unpersist()
        return narrow
    return m


def parallelize_narrow(df: DataFrame) -> DataFrame:
    """Repartition CPU-heavy narrow stages up to cluster parallelism.

    A small parquet file arrives as ONE partition, serializing all
    per-row compute (shingles, hashes, pandas UDFs) onto one core —
    measured 5-48s single-threaded vs ~1-7s at 32 partitions on the
    sf0.1 fixtures. The few-MB shuffle is noise next to the compute.
    On a real cluster with many input files this is a no-op (input
    already >= default parallelism).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # Unconditional repartition: probing df.rdd.getNumPartitions()
    # forces an RDD conversion + analysis per call, and with AQE the
    # coalescer removes the shuffle when the input is already wide.
    return df.repartition(target)


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate lineage between iterative rounds, fault-tolerantly
    when the session allows it.

    Iterative fixpoints (connected components, label propagation,
    k-core peeling, MMR's greedy loop) double their logical plan
    every round if lineage is kept; truncation is mandatory (measured
    6.5s -> 1.4s for the 4-round k-core peel at sf0.1). HOW to
    truncate is a fault-tolerance choice:

    - ``checkpoint()`` (used when ``sparkContext.getCheckpointDir``
      is set): blocks are written to the reliable checkpoint store
      (HDFS/S3); an executor lost mid-peel recomputes nothing and
      loses nothing — the posture for a 1000-executor preemptible
      cluster, where a multi-round iteration would otherwise die
      mid-flight. Costs a distributed write per round.
    - ``localCheckpoint()`` (fallback): blocks live only on the
      executors that computed them AND lineage is discarded, so one
      lost executor makes the frame unrecoverable and fails the job.
      Acceptable in local mode (this sandbox: executor loss == JVM
      loss) and for restartable foreachBatch maintenance, where the
      streaming engine retries the whole batch.

    Cluster deployments should call
    ``spark.sparkContext.setCheckpointDir(...)`` at session setup to
    get the reliable path engine-wide. NOTE on cleanup: Spark never
    deletes reliable checkpoint files on its own — a long-running
    job with many fixpoint rounds accumulates one directory per
    round forever unless
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (set in
    ``session._RUNTIME_CONF``; it is a STATIC conf, so externally
    created sessions must pass it at build time) lets the
    ContextCleaner remove a round's files once its RDD is
    garbage-collected. The final result must be materialized (or
    written) before the driver drops the reference.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
