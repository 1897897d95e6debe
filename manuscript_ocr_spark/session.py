"""SparkSession factory with the engine's tuned defaults.

Scale posture: AQE on (runtime shuffle coalescing + skew-join splitting),
small Arrow batches for the media path (page payloads are ~1.2 MB/row —
the default 10k-records-per-batch would materialize gigabytes per Arrow
transfer), zstd parquet output. On a real cluster the same confs apply via
spark-submit --conf; master comes from the environment there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    # local-mode driver == executor; the default 1g heap cannot shuffle
    # binary page payloads (must be set before the JVM launches)
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.driver.maxResultSize": "4g",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # split highly-compressed media scans finely: task sizing follows
    # COMPRESSED bytes, and fixture pages compress ~20x, so the default 128m
    # would pack the whole media table into a handful of scan tasks; fine
    # splits also let the OCR UDF read straight off the scan with no payload
    # shuffle (pipeline.ocr_media_lines)
    "spark.sql.files.maxPartitionBytes": "512k",
    "spark.sql.files.openCostInBytes": "128k",
    # media rows carry ~1.2MB binary payloads; bound Arrow batch memory
    # (64 rows ≈ 75MB — big enough to amortize per-batch overheads, small
    # enough that 32 concurrent workers stay well inside the heap)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
}


def get_spark(
    master: str | None = None,
    app_name: str = "manuscript-ocr-spark",
    shuffle_partitions: int | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    # one BLAS thread per python worker: with 32 concurrent workers,
    # multithreaded numpy (OpenBLAS/OMP defaults) thrashes the cores and the
    # Arrow-UDF stage runs ~10x slower than its serial per-page cost
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = SparkSession.builder.master(master).appName(app_name)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
