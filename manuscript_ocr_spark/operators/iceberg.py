"""Iceberg-native checkpoint sink (SURVEY §9 item 1), behind a runtime probe.

The sandbox ships no Iceberg runtime jars, so operators/checkpoint.py
emulates snapshot semantics over parquet + manifest JSONs. This module is
the 1:1 mapping onto real Iceberg when the jars/catalog ARE present
(iceberg_available): the same single-job staging write, then ONE ATOMIC
SNAPSHOT COMMIT PER BUCKET via the add_files procedure — Iceberg's snapshot
log replaces the _manifest/<b>.json files, readers see only committed
snapshots, and a crash between commits resumes exactly like the emulation
(committed buckets are discovered from the live table and pruned from the
next run's docs scan).

Nothing else in the engine changes: extract_spans, the bucket function, and
the pruning predicate are shared with operators/checkpoint.py. Where the
probe fails, callers keep using the parquet emulation — no behavior change
in this environment (env-skipped test: tests/test_iceberg.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import bucket_of


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session's classpath.
    (A class-loader probe is the only jar check Spark exposes; it is not an
    execution API.)"""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def require_iceberg(spark: SparkSession):
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime jars are not on the classpath; use "
            "operators.checkpoint.extract_with_checkpoint (parquet emulation "
            "with identical commit semantics) instead"
        )


def _committed_buckets_iceberg(spark: SparkSession, table: str) -> set:
    """Buckets already committed: the union of buckets visible in the
    CURRENT snapshot (Iceberg's atomicity guarantees a bucket is either
    fully present or absent) and the `engine.committed_buckets` table
    property. The property is what makes a bucket whose extraction
    legitimately produced ZERO rows count as committed — data-derived
    discovery alone would re-extract it on every resume (round-3 ADVICE:
    repeated work, though never wrong output)."""
    if not spark.catalog.tableExists(table):
        return set()
    out = {
        int(r["__bucket"])
        for r in spark.table(table).select("__bucket").distinct().collect()
    }
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    marked = props.get("engine.committed_buckets", "")
    out.update(int(b) for b in marked.split(",") if b != "")
    return out


def extract_with_checkpoint_iceberg(
    docs: DataFrame,
    media: DataFrame,
    table: str,
    staging_dir: str,
    n_buckets: int = 8,
    catalog: str = "local",
    fail_after: int | None = None,
    **extract_kwargs,
) -> dict:
    """extract_with_checkpoint on a real Iceberg table: one extraction job
    stages all pending buckets as parquet, then each bucket lands as its own
    snapshot commit (add_files moves data files into the table WITHOUT
    rewrite — the staging write is the only data pass, the per-bucket commit
    is a metadata transaction). Resume re-derives committed buckets from the
    table and prunes them from the docs scan, exactly like the emulation.

    fail_after: abort after N commits (fault injection for the resume test)."""
    from ..pipeline import extract_spans

    spark = docs.sparkSession
    require_iceberg(spark)

    already = _committed_buckets_iceberg(spark, table)
    skipped = sorted(already)
    pending = [b for b in range(n_buckets) if b not in already]
    committed: list[int] = []
    if not pending:
        return {"committed": committed, "skipped": skipped, "table": table}

    docs_in = docs
    if already:
        docs_in = docs.filter(
            ~bucket_of(F.col("doc_id"), n_buckets).isin([int(b) for b in skipped])
        )
    t0 = time.time()
    out = extract_spans(docs_in, media, **extract_kwargs).withColumn(
        "__bucket", bucket_of(F.col("doc_id"), n_buckets)
    )
    out.write.mode("overwrite").partitionBy("__bucket").parquet(staging_dir)
    job_wall_ms = int((time.time() - t0) * 1000)

    if not spark.catalog.tableExists(table):
        empty = spark.read.parquet(staging_dir).limit(0)
        empty.writeTo(table).partitionedBy(F.col("__bucket")).create()
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES ("
            f"'engine.n_buckets'='{n_buckets}')"
        )
    else:
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        prev = props.get("engine.n_buckets")
        if prev is not None and int(prev) != n_buckets:
            raise ValueError(
                f"resume mismatch: {table} was committed with n_buckets={prev}, "
                f"this run uses n_buckets={n_buckets}"
            )

    done_marks = set(already)
    for b in pending:
        src = os.path.join(staging_dir, f"__bucket={b}")
        if os.path.isdir(src):
            # one snapshot commit per bucket: add_files over the partitioned
            # staging dir, filtered to this bucket's partition — a metadata
            # transaction (no data rewrite), atomic like the manifest rename
            spark.sql(
                f"CALL {catalog}.system.add_files("
                f"table => '{table}', "
                f"source_table => '`parquet`.`{staging_dir}`', "
                f"partition_filter => map('__bucket', '{b}'))"
            )
            spark.sql(
                f"ALTER TABLE {table} SET TBLPROPERTIES ("
                f"'engine.last_job_wall_ms'='{job_wall_ms}')"
            )
        # mark the bucket committed in a table property as well — this is
        # the only durable record for a bucket with zero output rows (no
        # staging dir, nothing in the data), so resume won't re-extract it
        done_marks.add(b)
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES ("
            f"'engine.committed_buckets'="
            f"'{','.join(str(x) for x in sorted(done_marks))}')"
        )
        committed.append(b)
        if fail_after is not None and len(committed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} buckets")

    return {"committed": committed, "skipped": skipped, "table": table}
