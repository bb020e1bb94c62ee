"""SparkSession factory with the engine's canonical configuration.

Scale-oriented defaults: AQE on (runtime coalesce + skew-join splitting),
Arrow for pandas UDFs, UTC session timezone so window math is stable, and
a shuffle-partition count sized for the local test harness but overridable
for cluster runs (at 100 TB you want shuffle partitions sized so each
post-shuffle partition lands in the 64-256 MB range; AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_SHIPPED: set[int] = set()


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile`` —
    the programmatic equivalent of ``spark-submit --py-files`` (north
    rule's launch mode). Without it, any session whose driver process
    can import us (e.g. via sys.path manipulation) but whose workers
    cannot would fail to unpickle our pandas-UDF closures, because
    cloudpickle serializes functions from importable modules by
    reference. Idempotent per SparkContext; called by every query entry
    point."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # already running from a --py-files zip (zipimport): pkg_dir is
        # a path *inside* the archive, so os.walk would ship an empty
        # zip. Ship the archive itself instead.
        archive = os.path.dirname(pkg_dir)
        while archive and not os.path.isfile(archive):
            archive = os.path.dirname(archive)
        if archive:
            sc.addPyFile(archive)
            _SHIPPED.add(id(sc))
        return
    zip_path = os.path.join(
        tempfile.gettempdir(), f"streamevmon_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(id(sc))


def build_spark(
    app_name: str = "streamevmon-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32)
    so the same entrypoint serves tests, bench, and the N-vs-4N scaling
    runs. On a real cluster, pass ``master=None`` with an externally
    supplied master URL via spark-submit and these confs still apply.
    """
    # glibc returns large (mmap'd) allocations to the OS on free, so every
    # NumPy batch in a pandas UDF would re-fault its pages — measured 10x
    # slowdown on the codec kernels in virtualized sandboxes. Keeping big
    # blocks on the heap lets long-lived Python workers reuse warm pages.
    # Must be set before the JVM (and its forked python workers) start.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one shuffle partition per core locally; on a cluster this is
        # overridden (AQE coalesces excess partitions at runtime anyway)
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = int(n) if n.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # Partition coalescing OFF by default: shuffle partitions are
        # already sized to the core count here, and AQE's size estimates
        # under-count compact integer/binary shuffle blocks, coalescing
        # window/agg stages below the core count (measured 2.5x slowdown
        # on the gap-fill window stage at local[32]). On a real cluster
        # at 100 TB, re-enable with advisoryPartitionSizeInBytes=128m so
        # reducers land in the 64-256 MB band.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Shuffle/spill files on tmpfs: this sandbox's passthrough
        # filesystem serializes small-file I/O, which becomes the scaling
        # bottleneck for many concurrent shuffle writers. On a real
        # cluster you would point this at fast local SSDs instead.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIR", "/dev/shm/spark-local"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config(
            "spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824"
        )
        .config(
            "spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "1073741824"
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
