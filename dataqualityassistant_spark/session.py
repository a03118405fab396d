"""Canonical SparkSession factory with the engine's tuning defaults.

Centralizes the configs that matter for this workload so library users,
the CLI, tests and bench all agree:

- AQE on (runtime coalescing + skew-join splitting — the host-domain power
  law makes stragglers otherwise);
- Arrow enabled with a bounded batch size (the fused scoring UDF streams
  10k-row batches; bigger batches help amortize, smaller bound worker
  memory on 100 MB documents);
- shuffle partitions sized to the parallelism at hand, not the 200 default
  (local) — on a cluster pass ``shuffle_partitions≈2-3× total cores``;
- 128 MB file split target so 100 TB of parquet yields ~800k well-sized
  input tasks.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def stop_spark_hard(stop_fn, jvm_proc, timeout=60.0):
    """Stop Spark with a watchdog: ``spark.stop()``'s py4j reply can be lost
    (observed twice in round-5 bench runs: jstack showed the context fully
    torn down and both gateway threads idle in waitForCommands while
    Python's main thread polled the reply socket forever — a 29-minute
    silent hang). Run ``stop_fn`` in a daemon thread; if it hasn't returned
    after ``timeout`` seconds, kill the gateway JVM directly — the context
    is already (or will be) down and a dead JVM is strictly better than a
    wedged process. Call as::

        stop_spark_hard(spark.stop,
                        getattr(spark.sparkContext._gateway, "proc", None))

    (grab ``_gateway.proc`` BEFORE calling — a torn-down context may not
    expose it after). Returns True when stop() returned normally, False
    when the watchdog had to kill the JVM (or stop() raised — a stop that
    errored, e.g. Py4JNetworkError from an already-dead gateway, is treated
    as failed so the JVM is never silently leaked)."""
    import threading

    failed: list[BaseException] = []

    def _run():
        try:
            stop_fn()
        except BaseException as e:  # noqa: BLE001 — report, don't propagate
            failed.append(e)

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    t.join(timeout)
    if not t.is_alive() and not failed:
        return True
    reason = (f"raised {failed[0]!r}" if failed
              else f"reply lost after {timeout}s")
    print(f"spark.stop() {reason}; killing gateway JVM", file=sys.stderr)
    if jvm_proc is not None:
        try:
            jvm_proc.kill()
        except OSError:
            pass
    return False


def stop_session_hard(spark, timeout=60.0):
    """:func:`stop_spark_hard` convenience wrapper for a live session."""
    proc = getattr(spark.sparkContext._gateway, "proc", None)
    return stop_spark_hard(spark.stop, proc, timeout)


def tuned_session(
    app: str = "dataqualityassistant-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    if driver_memory:
        b = b.config("spark.driver.memory", driver_memory)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }
    if shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update(extra_conf or {})
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_parallelism(df) -> int:
    """Partition count for an EXPLICIT repartition placed to satisfy a
    downstream per-key operator (window sort, distinct, groupBy) — r6.

    Why explicit: AQE's partition coalescing targets
    ``advisoryPartitionSizeInBytes`` (64 MB default — sized for cluster-scale
    exchanges), so a small-but-CPU-heavy shuffle (a window sort over a few
    tens of MB, a collect_list bucket agg) coalesces to ONE task and
    serializes on a single core. A user-specified ``repartition(n, keys)``
    is exempt from coalescing, satisfies the operator's distribution
    requirement (no extra exchange), and cannot change results — only
    placement. ``max(defaultParallelism, spark.sql.shuffle.partitions)``
    keeps cluster semantics: on a real cluster this equals the configured
    shuffle partitioning, locally it pins minimum parallelism to the cores.
    """
    sess = df.sparkSession
    try:
        sp = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        sp = 0  # e.g. "auto" under some AQE configurations
    return max(sess.sparkContext.defaultParallelism, sp)
