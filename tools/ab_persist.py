"""A/B: minhash_lsh_pairs persist vs no-persist vs DISK_ONLY at sf0.1
(VERDICT r2 'What's wrong #1'), plus jaccard_verify's sh persist.
Also probes whether DataFrame.unpersist() releases localCheckpoint storage.

Usage: python tools/ab_persist.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from manuscript_ocr_spark.session import get_spark
from manuscript_ocr_spark.functions import dedup


def lsh_pairs_variant(spark, sf_dir, mode: str):
    sig = dedup.minhash_signatures(spark, sf_dir)
    if mode == "memory":
        sig = sig.persist()
    elif mode == "disk":
        sig = sig.persist(StorageLevel.DISK_ONLY)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band_{b}") for b in range(dedup.N_BANDS)])
        ).alias("band", "key"),
    )
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    n = pairs.count()
    if mode != "none":
        sig.unpersist()
    return n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(master="local[32]", app_name="ab-persist")

    # warm the session (JIT, codegen, parquet footer cache)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    for mode in ("none", "memory", "disk", "none", "memory"):
        times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t = time.time()
            n = lsh_pairs_variant(spark, sf_dir, mode)
            times.append(time.time() - t)
        print(f"lsh_pairs mode={mode:7s} n={n} best={min(times):.3f}s all={[f'{t:.2f}' for t in times]}")

    # localCheckpoint release probe
    df = spark.range(1000000).localCheckpoint(eager=True)
    jsc = spark.sparkContext._jsc.sc()
    n_persisted = jsc.getPersistentRDDs().size()
    df.unpersist(blocking=True)
    n_after = jsc.getPersistentRDDs().size()
    print(f"localCheckpoint persisted RDDs: before-unpersist={n_persisted} after={n_after}")
    spark.stop()


if __name__ == "__main__":
    main()
