"""The shared k-means SQL generator (_kmeans_ctes_sql) must reproduce the
Spark fixed-point trainer (kmeans_centroids_fxp) EXACTLY — not just on the
fixture tables the registry oracles cover, but on adversarial inputs:
duplicate vectors (assignment ties → lowest c_id), k larger than the
number of natural clusters (cells that empty out and DROP), and negative
components (floor-quantization is not symmetric around zero). This is the
determinism contract both the ivf_kmeans oracle and the round-6 PQ coarse
stage stand on."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(path, vecs):
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(
            [np.asarray(v, dtype=np.float32) for v in vecs],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array(np.zeros(len(vecs), dtype=np.int32)),
    })
    pq.write_table(tbl, path)


def _spark_centroids(spark, sf_dir, k, iters):
    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.similarity import (
        _quantize,
        kmeans_centroids_fxp,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        _quantize("embedding").alias("vq"),
    )
    return {
        int(r["c_id"]): [int(x) for x in r["cq"]]
        for r in kmeans_centroids_fxp(emb, k=k, iters=iters).collect()
    }


def _duckdb_centroids(sf_dir, k, iters):
    import duckdb

    from manuscript_ocr_spark.functions.similarity import (
        FXP_SCALE,
        _kmeans_ctes_sql,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{sf_dir}/embeddings.parquet'")
    sql = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {FXP_SCALE} + 0.5) AS BIGINT)) AS vq
  FROM embeddings
),
{_kmeans_ctes_sql(k, iters, out='coarse')}
SELECT c_id, cq FROM coarse ORDER BY c_id
"""
    return {int(c): [int(x) for x in cq] for c, cq in con.sql(sql).fetchall()}


CASES = [
    # (name, generator(rng) -> list of 64-d vectors, k, iters)
    ("random", lambda rng: list(rng.standard_normal((40, 64)) * 2), 8, 2),
    ("duplicates-and-ties",
     lambda rng: [rng.standard_normal(64)] * 7
     + list(np.tile(rng.standard_normal((3, 64)), (4, 1)).reshape(12, 64))
     + list(rng.standard_normal((9, 64))), 6, 3),
    ("k-exceeds-clusters",
     lambda rng: list(np.repeat(rng.standard_normal((2, 64)) * 3, 15, axis=0)
                      + rng.standard_normal((30, 64)) * 1e-3), 12, 2),
    ("negative-heavy", lambda rng: list(-np.abs(rng.standard_normal((25, 64)))
                                        - 0.5), 5, 2),
]


@pytest.mark.parametrize("name,gen,k,iters", CASES, ids=[c[0] for c in CASES])
def test_spark_trainer_equals_duckdb_chain(spark, tmp_path, name, gen, k, iters):
    import zlib

    # crc32, not hash(): str hashing is salted per process and would make
    # the generated case differ between runs
    rng = np.random.RandomState(zlib.crc32(name.encode()) % (2**31))
    vecs = gen(rng)
    d = tmp_path / name
    d.mkdir()
    _write_embeddings(str(d / "embeddings.parquet"), vecs)

    got_spark = _spark_centroids(spark, str(d), k, iters)
    got_duck = _duckdb_centroids(str(d), k, iters)
    assert got_spark == got_duck  # ids, presence (dropped cells), and every
    # int64 component — bit-exact across engines
    assert 0 < len(got_spark) <= k
