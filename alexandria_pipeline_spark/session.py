"""SparkSession factory.

Tuned for the driver environment (local[N] single JVM) but every
setting is the one we'd want on a real multi-executor cluster at
100 TB: AQE with skew-join handling, Arrow-batched Python UDFs, and
UTC session time so results are timezone-stable across engines.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Sessions (by JVM SparkContext id) that already had the package zip
# shipped via addPyFile — addPyFile is idempotent-ish but re-zipping and
# re-registering per query would be pure overhead.
_SHIPPED: set[str] = set()


def _package_zip() -> str:
    """Zip this package's .py files into a content-addressed archive.

    The arcnames keep the `alexandria_pipeline_spark/` prefix so the zip
    is directly importable from a worker's sys.path. Content-hash in the
    filename means edits during a session produce a NEW zip (Spark
    refuses to re-add a changed file under the same name) and repeated
    calls with unchanged sources are free.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                arc = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                entries.append((full, arc))
    h = hashlib.sha1()
    for full, arc in entries:
        h.update(arc.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + f".tmp.{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for full, arc in entries:
                zf.write(full, arc)
        os.replace(tmp, zip_path)  # atomic: concurrent builders converge
    return zip_path


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship `alexandria_pipeline_spark` to executor Python workers.

    Every pandas-UDF / mapInPandas / applyInPandas operator in this repo
    pickles references to module-level functions; cloudpickle serializes
    those BY MODULE NAME, so the worker must be able to import the
    package. On local[N] launched from the repo root that works by
    accident (workers inherit the driver cwd); from any other cwd — or
    on any real cluster — it is ModuleNotFoundError. addPyFile puts the
    zip on every current AND future executor's sys.path, which is the
    Spark-native deployment path (same mechanism as spark.submit.pyFiles
    but callable on an already-running foreign session, e.g. the
    correctness driver's own SparkSession).
    """
    sc = spark.sparkContext
    key = sc.applicationId or str(id(sc))
    if key in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(key)


def get_spark(
    app_name: str = "alexandria-pipeline-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    cpus defaults to $SPARK_GRAFT_CPUS, else all cores. Shuffle
    partitions default to 32 to match the driver's local[32]; on a
    real cluster AQE coalesces/splits post-shuffle partitions anyway.

    The master URL comes from $SPARK_GRAFT_MASTER when set (e.g.
    `spark://host:7077`, `local-cluster[2,2,2048]`), defaulting to
    local[N] for the driver environment. Either way the package zip is
    shipped to executors so pandas-UDF operators import cleanly off the
    repo root (see ensure_package_on_executors).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and dynamic join-strategy switching. At 100 TB this
        # is what turns a skewed 1000-way shuffle into a balanced one.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Measured AGAINST raising initialPartitionNum (r8): planning
        # shuffles at 256 and letting AQE coalesce looked right on
        # paper for the 30 GB stress-scale exchanges, but on this
        # single-host local[32] it measured WORSE at both sf1
        # (51.6 -> 102.5 s) and sf10 (1175 -> 1308 s on the jaccard
        # sketch) — 8x more shuffle files fragment the page cache and
        # per-partition overheads dominate while 32 fat partitions
        # stream+spill sequentially just fine. On a real multi-rack
        # cluster the equivalent knob is executor-count-scaled and
        # would be revisited; here the flat core-count default wins.
        # The driver testdata's events table stores timestamp[ns];
        # Spark's Parquet reader rejects TIMESTAMP(NANOS) unless read as
        # raw int64 (catalog.load_table converts to a real timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow transfer for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.showConsoleProgress", "false")
        # No catalog tables are ever created; point the warehouse at
        # tempdir so an empty ./spark-warehouse dir never litters the
        # caller's cwd (r5/r6 hygiene item).
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "spark-warehouse"),
        )
        # local[N] runs driver+executor in ONE JVM: size the heap for
        # N parallel tasks (default JVM 1g starves 32 threads). On a
        # real cluster this maps to spark.executor.memory instead.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    )
    # Ad-hoc conf overrides for measurement harnesses ("k=v;k2=v2").
    # E.g. the r12 stress sessions set spark.io.compression.codec=zstd:
    # the sf10 graph exchanges are tens of GB of packed int64 streams
    # that lz4 leaves ~2x larger than zstd, and THIS box's disk — not
    # the plan — is the binding constraint (a 1000-executor cluster
    # hosts the same exchange trivially). Session-build-time only:
    # getOrCreate ignores conf on an already-running session.
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    ensure_package_on_executors(spark)
    return spark
