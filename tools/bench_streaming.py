"""Streaming SemDeDup ingest throughput: drain the embeddings table
through each streaming face (pairs, keep decision, contamination) as a
multi-micro-batch availableNow stream and report vectors/sec.

The index build is warmed first and excluded — the frozen-codebook rule
means a deployment pays it once, not per stream. Chunked input
(maxFilesPerTrigger=1) makes the drain a sequence of micro-batches, so
the number includes per-batch planning + state-store overhead, not just
steady-state row throughput.

Usage: python tools/bench_streaming.py [sf_dir] [n_chunks]
Prints one JSON line; pass --md to also append a section to
BENCH/STREAMING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_md = "--md" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_chunks = int(args[1]) if len(args) > 1 else 8

    from pyspark.sql import functions as F

    from manuscript_ocr_spark.session import get_spark
    from manuscript_ocr_spark.functions.similarity import (
        N_BENCH_VECS,
        ivf_kmeans_build,
    )
    from manuscript_ocr_spark.streaming.incremental import (
        streaming_semantic_contamination,
        streaming_semantic_dedup_at_ingest,
        streaming_semantic_dup_pairs,
    )

    spark = get_spark()
    idx = ivf_kmeans_build(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    work = tempfile.mkdtemp(prefix="bench_stream_")
    in_dir = f"{work}/in"
    for c in range(n_chunks):
        (emb.filter(F.col("vec_id") % n_chunks == c)
            .coalesce(1).write.parquet(f"{in_dir}/chunk={c}"))

    bench_ids = [
        int(r["vec_id"])
        for r in emb.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id").limit(N_BENCH_VECS).collect()
    ]
    bench_df = emb.filter(F.col("vec_id").isin(bench_ids))

    faces = {
        "pairs": lambda s: streaming_semantic_dup_pairs(s, idx),
        "keep": lambda s: streaming_semantic_dedup_at_ingest(s, idx),
        "contamination": lambda s: streaming_semantic_contamination(
            s, idx, bench_df),
    }
    out = {"sf_dir": sf_dir, "n_vectors": n, "n_chunks": n_chunks,
           "faces": {}}
    for name, fn in faces.items():
        stream = (spark.readStream.schema(emb.schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(f"{in_dir}/chunk=*"))
        t0 = time.monotonic()
        q = (fn(stream)
             .writeStream.format("parquet")
             .option("path", f"{work}/out_{name}")
             .outputMode("append")
             .option("checkpointLocation", f"{work}/ckpt_{name}")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.monotonic() - t0
        rows = spark.read.parquet(f"{work}/out_{name}").count()
        out["faces"][name] = {
            "wall_sec": round(wall, 3),
            "vectors_per_sec": round(n / wall, 1),
            "emitted_rows": rows,
        }
    print(json.dumps(out))

    if write_md:
        md = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "STREAMING.md")
        with open(md, "a") as f:
            f.write(
                f"\n## Draw: {os.path.basename(sf_dir)}, "
                f"{n} vectors, {n_chunks} micro-batches\n\n"
                "| face | wall (s) | vectors/sec | emitted rows |\n"
                "|---|---|---|---|\n")
            for name, m in out["faces"].items():
                f.write(f"| {name} | {m['wall_sec']} | "
                        f"{m['vectors_per_sec']} | {m['emitted_rows']} |\n")


if __name__ == "__main__":
    main()
