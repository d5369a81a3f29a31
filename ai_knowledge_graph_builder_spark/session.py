"""SparkSession factory with scale-oriented defaults.

The same builder is used by tests (small ``local[N]``) and the bench/pipeline
entry points. Settings are the ones that matter at 100 TB: AQE (runtime
coalescing + skew-join splitting), Arrow for every pandas UDF boundary,
explicit shuffle parallelism, and broadcast threshold high enough that the
alias dictionary / rule table always broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # match parallelism: one shuffle partition per core at local scale;
        # on a real cluster this is set to 2-3x total cores (or left to AQE).
        try:
            shuffle_partitions = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            shuffle_partitions = 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # byte-size coalescing starves Arrow-UDF stages of parallelism (the
        # NER/linking relations compress to a few MB but cost CPU per row —
        # profiled: a 55 s stage ran on 27 tasks at 32 cores). Skew-join
        # splitting stays on; partition counts come from our explicit salted
        # repartitions instead.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # scan split size, parameterised (guide §6): the local test tables
        # are single parquet files with up to 6 row groups, and the default
        # 128 MB split leaves a 131 MB lineitem scan on 1-2 cores of 32 —
        # 16 MB splits align tasks with row groups locally. At production
        # scale SET THIS UP via env (128 MB-1 GB: large sequential scans
        # want FEWER, larger map tasks feeding any shuffle — §2.2/§6).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # collect_set/collect_list aggregations (the co-occurrence kernels)
        # run as ObjectHashAggregate, which silently degrades to SORT-based
        # aggregation once a partition sees more than 128 groups — the
        # default is hit by ANY realistic per-doc/per-user grouping and was
        # costing a full sort of the mention relation per partition
        # (measured: events_cooccur 0.73 s → 0.55 s, flagship −0.2 s at
        # sf1.0). 64Ki keeps the hash path for every grouping this engine
        # plans (max observed ~4.7k groups/partition) with 14× headroom
        # while still bounding the untracked in-heap object map the
        # fallback exists to protect (≈ tens of MB/task for set-of-ids
        # payloads, vs unbounded at very large values); raise/lower via env
        # for fat payloads or wider groupings.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            os.environ.get("SPARK_GRAFT_OBJ_AGG_FALLBACK", str(65_536)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # managed-table warehouse outside the repo (bucketed graph tables)
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/kg-spark-warehouse"))
    )
    # optional JVM flags (e.g. GC choice) for A/B runs: the local-mode JVM
    # is forked at getOrCreate, so driver extraJavaOptions apply cleanly.
    # Env opts MERGE with (and precede) any caller-passed extraJavaOptions —
    # the scaling worker/probe JVMs pass their own flags via extra_conf and
    # must not silently discard the env-provided A/B flags; caller flags come
    # last so they win on a per-flag conflict (JVM last-one-wins).
    conf = dict(extra_conf or {})
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        caller_opts = conf.pop("spark.driver.extraJavaOptions", "")
        merged = f"{java_opts} {caller_opts}".strip()
        b = b.config("spark.driver.extraJavaOptions", merged)
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
