"""ANN quality: both IVF variants (sampled + trained k-means centroids) must
recover most of the exact brute-force top-10 while scanning only nprobe=2
cells — the accuracy/efficiency contract a bit-exact SQL mirror can't pin
for the float-iterating k-means variant (registered rows-only instead)."""


def test_ivf_recall_against_brute_force(spark):
    from manuscript_ocr_spark.functions.similarity import (
        TOPK,
        cosine_topk,
        ivf_kmeans_topk,
        ivf_topk,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r["vec_id"] for r in cosine_topk(spark, sf).collect()}
    assert len(exact) == TOPK
    for variant in (ivf_topk, ivf_kmeans_topk):
        got = {r["vec_id"] for r in variant(spark, sf).collect()}
        recall = len(exact & got) / TOPK
        assert recall >= 0.7, f"{variant.__name__} recall {recall}"


def test_kmeans_centroids_deterministic_and_well_formed(spark):
    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.similarity import (
        EMB_DIM,
        KMEANS_K,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c1 = {r["c_id"]: r["cv"] for r in kmeans_centroids(emb).collect()}
    c2 = {r["c_id"]: r["cv"] for r in kmeans_centroids(emb).collect()}
    assert set(c1) == set(c2) and len(c1) <= KMEANS_K
    for cid, cv in c1.items():
        assert len(cv) == EMB_DIM
        assert cv == c2[cid]  # rerun is bit-identical (deterministic plan)
