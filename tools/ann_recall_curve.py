"""Coverage-recall curve for the IVF-PQ coarse stage (round-5 verdict
item 7): for each dataset, build the index, then measure — per nprobe —
the mean fraction of each query's EXACT top-10 neighbors (int64 L2 on the
fixed-point vectors, the index's own metric family) whose assigned cell is
among the query's nprobe probed cells. Coverage recall is the ceiling any
in-cell ranking (exact or ADC) can reach, so it isolates the coarse
quantizer's contribution.

Datasets: the i.i.d.-random testdata embeddings (the documented FLOOR —
64-d random points are near-equidistant) and the Gaussian-mixture
clustered tier (the operating point production corpora look like).

Usage: python tools/ann_recall_curve.py   → markdown table for SURVEY §12.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

NPROBES = (1, 2, 4, 8, 16, 32)
TOPK = 10
QUERY_STRIDE = 20  # every 20th vector is a query


def coverage_curve(spark, sf_dir: str) -> dict[int, float]:
    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.similarity import (
        FXP_SCALE,
        ivfpq_build,
    )

    idx = ivfpq_build(spark, sf_dir)
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    V = np.floor(
        np.stack([np.asarray(rows[i]["embedding"], dtype=np.float64)
                  for i in order]) * FXP_SCALE + 0.5
    ).astype(np.int64)

    crows = spark.read.parquet(f"{idx}/centroids.parquet").collect()
    c_ids = np.array([r["c_id"] for r in crows], dtype=np.int64)
    corder = np.argsort(c_ids)
    c_ids = c_ids[corder]
    C = np.stack([np.asarray(crows[i]["cq"], dtype=np.int64) for i in corder])

    # cell assignment: exact int L2, ties → lowest c_id (c_ids sorted asc,
    # argmin takes the first minimum)
    d2c = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cell = c_ids[d2c.argmin(axis=1)]

    qpos = [i for i in range(len(ids)) if ids[i] % QUERY_STRIDE == 0]
    cov = {p: [] for p in NPROBES}
    for qi in qpos:
        dq = ((V - V[qi]) ** 2).sum(axis=1)
        dq[qi] = np.iinfo(np.int64).max
        top = np.lexsort((ids, dq))[:TOPK]
        probe_order = c_ids[np.lexsort((c_ids, d2c[qi]))]
        for p in NPROBES:
            probed = set(probe_order[:p].tolist())
            cov[p].append(
                sum(1 for t in top if cell[t] in probed) / TOPK)
    return {p: float(np.mean(cov[p])) for p in NPROBES}, len(qpos), len(c_ids)


def main():
    from manuscript_ocr_spark.fixtures import ensure_clustered_embeddings
    from manuscript_ocr_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="ann-recall-curve")
    spark.sparkContext.setLogLevel("ERROR")

    datasets = [
        ("random (testdata sf0.01, the floor)", "/root/testdata/sf0.01"),
        ("random (testdata sf0.1)", "/root/testdata/sf0.1"),
        ("clustered (Gaussian mixture, k=16)", ensure_clustered_embeddings()),
    ]
    print("| dataset | n_cells | queries | " +
          " | ".join(f"nprobe={p}" for p in NPROBES) + " |")
    print("|---|---|---|" + "---|" * len(NPROBES))
    for name, d in datasets:
        curve, nq, ncells = coverage_curve(spark, d)
        print(f"| {name} | {ncells} | {nq} | " +
              " | ".join(f"{curve[p]:.3f}" for p in NPROBES) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
