"""Similarity search over the embeddings table (array<float>, 64-dim).

- brute-force cosine top-k: the exactness baseline. JVM-side zip_with +
  aggregate (fold) — element order of the fold is left-to-right in BOTH
  Spark and the DuckDB oracle, so doubles agree bit-for-bit before rounding.
- LSH-bucketed ANN: N_PLANES deterministic ±1 hyperplanes (parity pattern on
  the dimension index — no RNG, portable to SQL) → bucket id; neighbor search
  only joins within the query's bucket. The scale path: at 10^12 vectors the
  bucket key shards the search; brute force stays as the verifier.
- cosine near-dup pairs: label-blocked pair scan with a 0.4 threshold
  (testdata max same-label cosine ≈ 0.47).

No Python UDF: dot products are F.aggregate/F.zip_with expressions. A
vectorized Pandas-UDF path would only win for very wide vectors; at 64 dims
the JVM fold wins by skipping Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_PLANES = 4  # 2^4 buckets; at 500 fixture vectors that keeps ~30 candidates
              # per bucket (at 10^12 scale you'd raise planes with corpus size)
TOPK = 10
QUERY_VEC_ID = 0
DUP_COS_THRESHOLD = 0.4


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id=0 (rank, vec_id, cos)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("c"),
        )
    )
    return (
        scored.orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(TOPK)
        .select("vec_id", F.round("c", 3).alias("cosine"))
    )


COSINE_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) nn FROM e),
q AS (SELECT v qv, nn qn FROM n WHERE vec_id = {QUERY_VEC_ID}),
s AS (SELECT n.vec_id,
             list_sum(list_transform(list_zip(n.v, q.qv), s -> s[1] * s[2]))
               / (n.nn * q.qn) c
      FROM n, q WHERE n.vec_id <> {QUERY_VEC_ID})
SELECT vec_id, round(c, 3) AS cosine
FROM s ORDER BY c DESC, vec_id ASC LIMIT {TOPK}
"""


def cosine_dup_pairs(spark, sf_dir):
    """Embedding near-dup candidate pairs within a label block, cos > 0.4."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").alias("v"), _norm("embedding").alias("nn")
    )
    pairs = (
        emb.alias("a")
        .join(
            emb.alias("b"),
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (_dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nn") * F.col("b.nn"))).alias("c"),
        )
        .filter(F.col("c") > DUP_COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round("c", 3).alias("cosine"))
    )
    return pairs


COSINE_DUP_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
n AS (SELECT vec_id, label, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) nn FROM e)
SELECT a.vec_id vec_a, b.vec_id vec_b,
       round(list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]))
             / (a.nn * b.nn), 3) AS cosine
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]))
      / (a.nn * b.nn) > {DUP_COS_THRESHOLD}
"""


def _plane_sign(d: int, j: int) -> int:
    """Deterministic ±1 hyperplane component for dimension d, plane j —
    parity of a fixed integer mix, identical in the SQL mirror."""
    return 1 if ((d * 31 + j * 17) % 7) % 2 == 0 else -1


def lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucket per vector (the ANN scale path)."""
    emb = _emb(spark, sf_dir).select("vec_id", F.col("embedding").alias("v"))

    def _signed(j):
        # factory so the lambda stays 2-ary (a default arg would make pyspark
        # count 3 parameters and reject the higher-order function call)
        def fn(x, i):
            return x.cast("double") * F.when(
                (((i * 31 + F.lit(j * 17)) % 7) % 2) == 0, 1.0
            ).otherwise(-1.0)

        return fn

    bucket = F.lit(0)
    for j in range(N_PLANES):
        dot_j = F.aggregate(
            F.transform("v", _signed(j)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_j > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return emb.select("vec_id", bucket.cast("int").alias("bucket"))


def _bucket_expr_sql() -> str:
    dots = []
    for j in range(N_PLANES):
        # DuckDB lambda index i is 1-based → use (i-1) to match Spark's 0-base
        dots.append(
            f"CASE WHEN list_sum(list_transform(v, (x, i) -> x * "
            f"(CASE WHEN ((((i - 1) * 31 + {j * 17}) % 7) % 2) = 0 THEN 1.0 ELSE -1.0 END)"
            f")) > 0 THEN {1 << j} ELSE 0 END"
        )
    return "(" + " + ".join(dots) + ")"


LSH_BUCKETS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
SELECT vec_id, CAST({_bucket_expr_sql()} AS INT) AS bucket FROM e
"""


def lsh_ann_topk(spark, sf_dir):
    """ANN: top-10 cosine neighbors of vec_id=0 WITHIN its LSH bucket —
    the bucketed variant whose candidate set stays bounded at scale."""
    emb = _emb(spark, sf_dir).select("vec_id", F.col("embedding").alias("v"))
    b = lsh_buckets(spark, sf_dir)
    embb = emb.join(b, "vec_id")
    q = embb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    scored = (
        embb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .select(
            "vec_id",
            (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("c"),
        )
    )
    return (
        scored.orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(TOPK)
        .select("vec_id", F.round("c", 3).alias("cosine"))
    )


LSH_ANN_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
n AS (SELECT vec_id, v, CAST({_bucket_expr_sql()} AS INT) AS bucket,
             sqrt(list_sum(list_transform(v, x -> x * x))) nn
      FROM e),
q AS (SELECT v qv, nn qn, bucket qb FROM n WHERE vec_id = {QUERY_VEC_ID}),
s AS (SELECT n.vec_id,
             list_sum(list_transform(list_zip(n.v, q.qv), s -> s[1] * s[2]))
               / (n.nn * q.qn) c
      FROM n JOIN q ON n.bucket = q.qb
      WHERE n.vec_id <> {QUERY_VEC_ID})
SELECT vec_id, round(c, 3) AS cosine
FROM s ORDER BY c DESC, vec_id ASC LIMIT {TOPK}
"""


IVF_CENTROID_STRIDE = 31  # vec_id % 31 == 0 → ~N/31 deterministic centroids
IVF_NPROBE = 2


def ivf_topk(spark, sf_dir):
    """IVF-style ANN: coarse-quantize every vector to its nearest centroid
    cell, then search only the query's nprobe=2 nearest cells. Centroids are
    a deterministic coarse sample (vec_id % 31 == 0) standing in for trained
    k-means means — the *plan shape* is the point: centroids broadcast
    (they're tiny), cell assignment is a broadcast-join + per-vector argmax
    (window over vec_id), and the candidate scan prunes to probed cells
    before any exact scoring. At 10^12 vectors the cell column becomes the
    partition key and the exact top-k runs per-cell."""
    emb = _emb(spark, sf_dir).select("vec_id", F.col("embedding").alias("v"))
    cents = emb.filter(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        _norm(F.col("v")).alias("cn"),
    )
    # the scoring fan-out (vectors × centroids folds) is the compute-heavy
    # stage; the parquet scan of a small vector table yields few splits, so
    # spread the vector side across all cores BEFORE the broadcast cross
    # join (cheap: one shuffle of the narrow vector rows; hash by vec_id —
    # column-less round-robin would add a full-row determinism sort)
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    # argmax-per-vector WITHOUT a window sort: lexicographic min over
    # (-cos, c_id) structs is a partial-aggregating groupBy — the shuffle
    # carries one tiny struct per (vector, centroid) instead of sorting rows
    # that still hold two embedding arrays (same result incl. tie-break as
    # the rank-1 window in the DuckDB oracle SQL)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "c_id",
        (_dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * F.col("cn"))).alias("cc"),
    )
    cells = (
        scored.select(
            "vec_id",
            F.struct((-F.col("cc")).alias("ncc"), F.col("c_id")).alias("nc"),
            "v",
        )
        .groupBy("vec_id")
        .agg(F.min("nc").alias("best"), F.any_value("v").alias("v"))
        .select("vec_id", "v", F.col("best.c_id").alias("cell"))
    )
    # the query's nprobe cells: 1 vector × n_centroids rows — trivially small
    probes = (
        scored.filter(F.col("vec_id") == QUERY_VEC_ID)
        .orderBy(F.desc("cc"), F.asc("c_id"))
        .limit(IVF_NPROBE)
        .select(F.col("c_id").alias("probe_cell"))
    )
    q = cells.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm(F.col("v")).alias("qn")
    )
    cand = (
        cells.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), F.col("cell") == F.col("probe_cell"))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qn"))).alias("c"),
        )
    )
    return (
        cand.orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(TOPK)
        .select("vec_id", F.round("c", 3).alias("cosine"))
    )


IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) nn FROM e),
c AS (SELECT vec_id c_id, v cv, nn cn FROM n
      WHERE vec_id % {IVF_CENTROID_STRIDE} = 0),
scored AS (
  SELECT n.vec_id, n.v, n.nn, c.c_id,
         list_sum(list_transform(list_zip(n.v, c.cv), s -> s[1] * s[2]))
           / (n.nn * c.cn) cc,
         row_number() OVER (PARTITION BY n.vec_id
                            ORDER BY list_sum(list_transform(list_zip(n.v, c.cv),
                                     s -> s[1] * s[2])) / (n.nn * c.cn) DESC,
                            c.c_id ASC) rnk
  FROM n, c),
cells AS (SELECT vec_id, v, nn, c_id AS cell FROM scored WHERE rnk = 1),
probes AS (SELECT c_id AS probe_cell FROM scored
           WHERE vec_id = {QUERY_VEC_ID} AND rnk <= {IVF_NPROBE}),
q AS (SELECT v qv, nn qn FROM cells WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT cells.vec_id,
         list_sum(list_transform(list_zip(cells.v, q.qv), s -> s[1] * s[2]))
           / (cells.nn * q.qn) c
  FROM cells JOIN probes ON cells.cell = probes.probe_cell, q
  WHERE cells.vec_id <> {QUERY_VEC_ID})
SELECT vec_id, round(c, 3) AS cosine
FROM cand ORDER BY c DESC, vec_id ASC LIMIT {TOPK}
"""


EMB_DIM = 64
KMEANS_K = 8
KMEANS_ITERS = 2


def _assign_cells(emb, cents):
    """(vec_id, v, cell): nearest centroid by squared L2, ties → lowest c_id.
    Centroids broadcast; argmin via lexicographic min over (dist, c_id)
    structs — one partial-aggregating shuffle, no sort."""
    dist = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", F.struct(dist.alias("d"), F.col("c_id")).alias("dc")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min("dc").alias("best"), F.any_value("v").alias("v"))
        .select("vec_id", "v", F.col("best.c_id").alias("cell"))
    )


def kmeans_centroids(emb, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Deterministic mini k-means on DataFrame aggs: init = the first k
    vectors by vec_id (seeded-sample stand-in), each Lloyd iteration is one
    broadcast-join assignment + one groupBy(cell) with EMB_DIM avg aggs
    (dimension count is a schema constant, so the update is plain columnar
    aggregation — no UDF, no driver loop over rows)."""
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    for _ in range(iters):
        assigned = _assign_cells(emb, cents)
        cents = (
            assigned.groupBy("cell")
            .agg(*[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(EMB_DIM)])
            .select(
                F.col("cell").alias("c_id"),
                F.array(*[F.col(f"m{i}") for i in range(EMB_DIM)]).alias("cv"),
            )
        )
    return cents


def ivf_kmeans_topk(spark, sf_dir):
    """IVF with TRAINED coarse centroids (2 Lloyd iterations) instead of the
    sampled ones in sim_ivf_topk: assign all vectors to trained cells, probe
    the query's nprobe=2 nearest cells, exact cosine inside. Registered
    rows-only (float iteration order makes a bit-exact SQL mirror brittle);
    tests/test_ivf_recall.py pins recall@10 against the brute-force oracle
    instead."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = kmeans_centroids(emb).cache()
    cells = _assign_cells(emb, cents)

    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm(F.col("v")).alias("qn")
    )
    qdist = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probes = (
        cents.crossJoin(F.broadcast(qv))
        .select("c_id", qdist.alias("d"))
        .orderBy("d", "c_id")
        .limit(IVF_NPROBE)
        .select(F.col("c_id").alias("probe_cell"))
    )
    cand = (
        cells.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), F.col("cell") == F.col("probe_cell"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            (_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("qn"))).alias("c"),
        )
    )
    return (
        cand.orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(TOPK)
        .select("vec_id", F.round("c", 3).alias("cosine"))
    )


QUERIES = {
    "sim_cosine_topk": (cosine_topk, COSINE_TOPK_SQL),
    "sim_ivf_topk": (ivf_topk, IVF_TOPK_SQL),
    "sim_ivf_kmeans_topk": (ivf_kmeans_topk, None),
    "sim_cosine_dup_pairs": (cosine_dup_pairs, COSINE_DUP_SQL),
    "sim_lsh_buckets": (lsh_buckets, LSH_BUCKETS_SQL),
    "sim_lsh_ann_topk": (lsh_ann_topk, LSH_ANN_SQL),
}
