"""SparkSession factory tuned for this engine.

The reference tunes DuckDB with ``memory_limit``/``threads``/``temp_directory``
(``duckvdb.py:23-25``); the Spark analogs are executor parallelism, shuffle
partitions, and ``spark.local.dir``.  We additionally enable AQE so skewed
shuffles re-plan at runtime, and Arrow so pandas_udf boundaries are vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "modal_vector_db_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with scale-aware defaults.

    On a real cluster the ``master``/memory settings come from spark-submit;
    everything set here is safe for both ``local[N]`` and cluster mode.
    """
    # Make sure Python workers can import this package even when the driver
    # found it via sys.path manipulation (local mode spawns workers with the
    # JVM's env, which inherits ours if set before the JVM starts).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(cpus, 32)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce shuffle partitions by SIZE, not by parallelism (the
        # setting Spark's own tuning guide recommends): a 100 TB shuffle
        # still fans out to advisory-size partitions, while a kilobyte
        # shuffle collapses to one reducer instead of `shuffle.partitions`
        # near-empty tasks.  This is what makes one config correct at both
        # sf0.001 and cluster scale.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # keep parquet scans pruned + pushed down (defaults, pinned explicitly)
        .config("spark.sql.parquet.filterPushdown", "true")
        # Runtime row-level semi-join pruning: a selective dim-side filter
        # builds a bloom filter that prunes the FACT scan before the shuffle
        # — at 100 TB this is the difference between shuffling a table and
        # shuffling the matching slice.  Pinned on (default varies by
        # version); harmless at fixture scale.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Push COUNT/MIN/MAX down to parquet footers for unfiltered scans
        # (num_rows()/profile() read metadata instead of data).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate copies the generator input expression
        # into a Filter (size(e)>0 AND isnotnull(e)) that filter-pushdown
        # then drags below the projection — so an expensive computed array
        # (hashed shingles: md5 per token) is evaluated 2-3x per row
        # (seen in the dedup_ngram_jaccard physical plan).  Our exploded
        # arrays are all derived columns that are null/empty only in
        # pathological rows, so the inferred pre-filter prunes nothing the
        # Generate itself wouldn't drop in the same stage; excluding the
        # rule removes the duplicate evaluation without changing results.
        # NOTE: the exclusion is GLOBAL (every get_spark caller) — revisit
        # if a query ever explodes a RAW scanned array column, where the
        # inferred isnotnull/size>0 filter would push down to the scan and
        # prune for free (no such query exists in this engine today).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill scratch (spark.local.dir) follows $SPARK_GRAFT_SCRATCH
    # only when the deployment EXPLICITLY set it (point it at the NVMe
    # mount) and didn't already pin SPARK_LOCAL_DIRS.  It deliberately does
    # NOT follow scratch_root()'s /dev/shm fallback: spill exists precisely
    # when memory is tight, and routing spill files to RAM-backed tmpfs
    # (capped at ~50% of RAM) can turn a large shuffle that would have
    # completed via disk spill into ENOSPC/OOM (round-12 advice).  The
    # fsync-bound small-file scratch (streaming checkpoints / state stores /
    # fixture warehouses) keeps using scratch_root() — those are tiny and
    # latency-bound, not capacity-bound.
    if not os.environ.get("SPARK_LOCAL_DIRS") and os.environ.get(
        "SPARK_GRAFT_SCRATCH"
    ):
        local_dir = os.path.join(
            os.environ["SPARK_GRAFT_SCRATCH"], "sparkvdb_spark_local"
        )
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
