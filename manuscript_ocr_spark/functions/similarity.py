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
FXP_SCALE = 1 << 20  # fixed-point quantization scale for k-means training


def _quantize(col):
    """embedding → scaled-int64 vector: floor(x·2^20 + 0.5) per component.
    THE determinism device (round-3 verdict item #5): integer sums are exact
    and ORDER-INDEPENDENT, so the distributed Lloyd iterations produce
    bit-identical centroids under any partitioning/AQE plan — and a SQL
    engine can mirror the whole training loop exactly. Range audit: |x| ≤ 5
    → |vq| ≤ 5·2^20; squared-distance folds ≤ 64·(1.1e13) ≈ 7e14 < 2^63;
    per-cell component sums ≤ 5·2^20·N, exact in int64 (and in double for
    the mean division) up to N ≈ 1.7e9 rows per cell — re-scale FXP_SCALE
    down for bigger cells."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * FXP_SCALE + F.lit(0.5)).cast("long")
    )


def _assign_cells_fxp(emb, cents):
    """(vec_id, v, vq, cell): nearest centroid by EXACT integer squared L2,
    ties → lowest c_id. Centroids broadcast; argmin via lexicographic min
    over (dist, c_id) structs — one partial-aggregating shuffle, no sort."""
    dist = F.aggregate(
        F.zip_with("vq", "cq", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "vq",
        F.struct(dist.alias("d"), F.col("c_id")).alias("dc"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.min("dc").alias("best"),
            F.any_value("v").alias("v"),
            F.any_value("vq").alias("vq"),
        )
        .select("vec_id", "v", "vq", F.col("best.c_id").alias("cell"))
    )


def kmeans_centroids_fxp(emb, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Deterministic fixed-point k-means: init = the first k vectors by
    vec_id; each Lloyd iteration = one broadcast-join assignment + a NARROW
    (cell, dim) integer-sum aggregation (posexplode of the quantized vector
    — map-side combined, k·64 output rows) collected to the driver, where
    the next round's centroids are rebuilt as floor(sum/count + 0.5) and
    re-broadcast as literals — the train-once/ship-the-index shape.

    Measured vs the 64-wide single-row aggregate (sf0.1, local[32], warmed):
    1.88 s vs 3.38 s per training — the wide form compiles a 65-expression
    codegen stage whose first-call JIT dominated the bench. Centroids are
    bit-identical either way (exact integer sums are shape- and
    order-independent); the k·64-scalar driver roundtrip per iteration is
    O(k·dims), independent of corpus size."""
    import math

    spark = emb.sparkSession
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"), F.col("vq").alias("cq")
    )
    for _ in range(iters):
        assigned = _assign_cells_fxp(emb, cents)
        rows = (
            assigned.select("cell", F.posexplode("vq").alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.sum("x").alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
        sums: dict = {}
        cnts: dict = {}
        for r in rows:
            sums.setdefault(r["cell"], {})[r["d"]] = r["s"]
            cnts[r["cell"]] = r["cnt"]
        data = [
            (
                int(c),
                [
                    int(math.floor(sums[c][d] / cnts[c] + 0.5))
                    for d in range(EMB_DIM)
                ],
            )
            for c in sorted(sums)
        ]
        cents = spark.createDataFrame(data, "c_id int, cq array<bigint>")
    return cents


def ivf_kmeans_topk(spark, sf_dir):
    """IVF with TRAINED coarse centroids (2 fixed-point Lloyd iterations)
    instead of the sampled ones in sim_ivf_topk: assign all vectors to
    trained cells, probe the query's nprobe=2 nearest cells, exact cosine
    (on the ORIGINAL doubles) inside. Fully oracle-checked: the fixed-point
    training is bit-exact under any execution order (see _quantize), so the
    DuckDB SQL mirrors the whole chain. The trained centroids are collected
    to the driver (k·EMB_DIM scalars — the production 'train once, ship the
    index' shape) and re-broadcast as literals for assignment + probing, so
    the heavy training subtree executes exactly once with no persist."""
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        _quantize("embedding").alias("vq"),
    )
    # already a literal (driver-trained) frame — see kmeans_centroids_fxp
    cents = kmeans_centroids_fxp(emb)
    cells = _assign_cells_fxp(emb, cents)

    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm(F.col("v")).alias("qn"),
        F.col("vq").alias("qvq"),
    )
    qdist = F.aggregate(
        F.zip_with("qvq", "cq", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    probes = (
        cents.crossJoin(F.broadcast(q))
        .select("c_id", qdist.alias("d"))
        .orderBy("d", "c_id")
        .limit(IVF_NPROBE)
        .select(F.col("c_id").alias("probe_cell"))
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


def _ivf_kmeans_sql() -> str:
    """DuckDB mirror of the ENTIRE fixed-point chain: quantize → 2 unrolled
    Lloyd iterations (64 exact integer sums per cell per iteration) → final
    assignment → nprobe probe → exact cosine on the original doubles."""
    def sums(src):
        return ",\n         ".join(
            f"sum({src}[{i + 1}]) AS s{i}" for i in range(EMB_DIM)
        )

    def rebuild():
        return ", ".join(
            f"CAST(floor(s{i} * 1.0 / cnt + 0.5) AS BIGINT)" for i in range(EMB_DIM)
        )

    dist = (
        "list_sum(list_transform(list_zip(e.vq, c.cq), "
        "s -> (s[1] - s[2]) * (s[1] - s[2])))"
    )
    assign = f"""
  SELECT e.vec_id, e.vq, c.c_id,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {dist} ASC, c.c_id ASC) AS rnk
  FROM e, {{cents}} c"""
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {FXP_SCALE} + 0.5) AS BIGINT)) AS vq
  FROM embeddings
),
cent0 AS (
  SELECT vec_id AS c_id, vq AS cq FROM e WHERE vec_id < {KMEANS_K}
),
asg0 AS ({assign.format(cents='cent0')}),
cent1 AS (
  SELECT c_id, list_value({rebuild()}) AS cq
  FROM (SELECT c_id, count(*) AS cnt, {sums('a.vq')}
        FROM asg0 a WHERE a.rnk = 1 GROUP BY c_id) t
),
asg1 AS ({assign.format(cents='cent1')}),
cent2 AS (
  SELECT c_id, list_value({rebuild()}) AS cq
  FROM (SELECT c_id, count(*) AS cnt, {sums('a.vq')}
        FROM asg1 a WHERE a.rnk = 1 GROUP BY c_id) t
),
cells AS (
  SELECT a.vec_id, a.c_id AS cell FROM ({assign.format(cents='cent2')}) a
  WHERE a.rnk = 1
),
q AS (SELECT v AS qv, vq AS qvq,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS qn
      FROM e WHERE vec_id = {QUERY_VEC_ID}),
probes AS (
  SELECT c.c_id AS probe_cell
  FROM cent2 c, q
  ORDER BY list_sum(list_transform(list_zip(q.qvq, c.cq),
                    s -> (s[1] - s[2]) * (s[1] - s[2]))) ASC, c.c_id ASC
  LIMIT {IVF_NPROBE}
),
cand AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.v, q.qv), s -> s[1] * s[2]))
           / (sqrt(list_sum(list_transform(e.v, x -> x * x))) * q.qn) AS c
  FROM e
  JOIN cells ON cells.vec_id = e.vec_id
  JOIN probes ON cells.cell = probes.probe_cell, q
  WHERE e.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, round(c, 3) AS cosine
FROM cand ORDER BY c DESC, vec_id ASC LIMIT {TOPK}
"""


IVF_KMEANS_SQL = _ivf_kmeans_sql()


KNN_QUERIES = 10  # vec_id < 10 act as the query set
KNN_K = 3


def knn_join(spark, sf_dir):
    """Batch k-NN JOIN (LSH-bucketed): for EVERY query vector, its top-k
    cosine neighbors within its hyperplane bucket — the all-queries-at-once
    shape embedding dedup and retrieval-augmentation pipelines run at
    corpus scale (one query at a time, as in sim_lsh_ann_topk, does not
    amortize). Plan: bucket both sides (deterministic hyperplanes), equi-join
    on bucket (never all-pairs), score JVM-side, then a per-query window
    over the BOUNDED bucket candidates (~N/2^planes rows per query — the
    window partition is the query, its input is the pruned candidate set,
    never the corpus)."""
    emb = _emb(spark, sf_dir).select("vec_id", F.col("embedding").alias("v"))
    b = lsh_buckets(spark, sf_dir)
    embb = emb.join(b, "vec_id").withColumn("nn", _norm(F.col("v")))
    queries = embb.filter(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nn").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    cand = (
        embb.join(F.broadcast(queries), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("v"), F.col("qv")) / (F.col("nn") * F.col("qn"))).alias("c"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        cand.withColumn("nb_rank", F.row_number().over(w))
        .filter(F.col("nb_rank") <= KNN_K)
        .select(
            "query_id",
            F.col("nb_rank").cast("int").alias("nb_rank"),
            "vec_id",
            F.round("c", 3).alias("cosine"),
        )
    )


KNN_JOIN_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
n AS (SELECT vec_id, v, CAST({_bucket_expr_sql()} AS INT) AS bucket,
             sqrt(list_sum(list_transform(v, x -> x * x))) nn
      FROM e),
q AS (SELECT vec_id AS query_id, v qv, nn qn, bucket qb
      FROM n WHERE vec_id < {KNN_QUERIES}),
cand AS (
  SELECT q.query_id, n.vec_id,
         list_sum(list_transform(list_zip(n.v, q.qv), s -> s[1] * s[2]))
           / (n.nn * q.qn) AS c
  FROM n JOIN q ON n.bucket = q.qb
  WHERE n.vec_id <> q.query_id
),
r AS (SELECT query_id, vec_id, c,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY c DESC, vec_id ASC) AS nb_rank
      FROM cand)
SELECT query_id, CAST(nb_rank AS INT) AS nb_rank, vec_id, round(c, 3) AS cosine
FROM r WHERE nb_rank <= {KNN_K}
"""


def dup_keep_list(spark, sf_dir):
    """Embedding near-dup KEEP LIST: connected components over the cosine
    near-dup pair graph (label-blocked, > 0.4) → per-vector cluster id +
    canonical-keeper flag — the same actionable dedup output the text path
    produces (dedup_keep_list), over the embedding modality. Reuses the
    shared min-label propagation (_cc_propagate: bounded plan depth,
    parquet-truncated lineage, zero cached state behind the result)."""
    from .dedup import _cc_propagate

    vecs = _emb(spark, sf_dir).select(F.col("vec_id").alias("doc_id"))
    pairs = cosine_dup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = _cc_propagate(spark, vecs, pairs)
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        F.col("label").alias("component"),
        (F.col("doc_id") == F.col("label")).alias("keep"),
    )


SIM_DUP_KEEP_SQL = f"""
WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
n AS (SELECT vec_id, label, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) nn FROM e),
pairs AS (
  SELECT a.vec_id vec_a, b.vec_id vec_b
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_sum(list_transform(list_zip(a.v, b.v), s -> s[1] * s[2]))
        / (a.nn * b.nn) > {DUP_COS_THRESHOLD}
),
edges AS (SELECT vec_a AS s, vec_b AS d FROM pairs
          UNION SELECT vec_b, vec_a FROM pairs),
reach AS (
  SELECT vec_id AS v, vec_id AS r FROM embeddings
  UNION
  SELECT rr.v, e2.d FROM reach rr JOIN edges e2 ON e2.s = rr.r
)
SELECT v AS vec_id, min(r) AS component, v = min(r) AS keep
FROM reach GROUP BY v
"""




# --- IVF-PQ: product-quantized ANN (round 4) ----------------------------------

PQ_M = 8                      # subspaces
PQ_SUB = EMB_DIM // PQ_M      # dims per subspace (8)
PQ_K = 8                      # codewords per subspace (3-bit codes)


def _int_l2(a_col, b_lits):
    """Exact integer squared L2 between an array column and a literal int
    list (the determinism device: every distance is an int64)."""
    lit_arr = F.array(*[F.lit(int(x)) for x in b_lits])
    return F.aggregate(
        F.zip_with(a_col, lit_arr, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_argmin(sub_col, codebook_m):
    """code = argmin_k ||sub - codebook_m[k]||^2, ties -> lowest k."""
    return F.array_min(
        F.array(*[
            F.struct(_int_l2(sub_col, cw).alias("d"), F.lit(k).alias("k"))
            for k, cw in enumerate(codebook_m)
        ])
    )["k"]


def ivfpq_topk(spark, sf_dir):
    """IVF-PQ (Jegou et al., 'Product Quantization for Nearest Neighbor
    Search', TPAMI 2011 -- public) over the embeddings table, fully
    deterministic and oracle-checked:

    - coarse quantizer: the deterministic centroid sample of sim_ivf_topk
      (vec_id % 31), cells assigned by EXACT int64 squared L2 on the
      2^20-fixed-point vectors (ties -> lowest centroid id);
    - RESIDUAL encoding: rq = vq - cq(cell); one shared codebook per
      subspace (M=8 x 8 dims, K=8 codewords), initialized from the first
      K residuals by vec_id and refined with ONE exact-integer Lloyd
      iteration (empty codewords keep their previous value) -- the same
      fixed-point device as sim_ivf_kmeans, so DuckDB mirrors training
      bit-for-bit;
    - search: probe the query's nprobe=2 nearest coarse cells; per probed
      cell the query residual yields an ADC lookup table (2 x 8 x 8 int64
      distances, computed on the driver -- bounded scalars like the
      centroid collects); each candidate's approximate distance is the
      table sum over its 8 stored codes: NO original vectors are touched
      at search time, which is the entire point of PQ at 10^12 vectors
      (codes are M bytes per vector; the corpus never rescans floats).

    Scale shape: codes are computed once (index build), candidates prune
    to probed cells before any scoring, and scoring is 8 integer adds per
    candidate. Output: top-10 by (adc ASC, vec_id ASC) with the EXACT
    int64 ADC distance -- hash-comparable with no float tolerance."""
    emb = _emb(spark, sf_dir).select("vec_id", _quantize("embedding").alias("vq"))
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    coarse = emb.filter(F.col("vec_id") % IVF_CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("c_id"), F.col("vq").alias("cq")
    )
    cells = _assign_cells_fxp(
        emb.withColumn("v", F.col("vq")), coarse
    ).select("vec_id", "vq", "cell")
    resid = (
        cells.join(F.broadcast(coarse), cells["cell"] == coarse["c_id"])
        .select(
            "vec_id", "cell",
            F.zip_with("vq", "cq", lambda x, y: x - y).alias("rq"),
        )
    )

    # codebook init: residual subvectors of the first PQ_K vec_ids (bounded
    # driver collect, like the k-means centroid roundtrip)
    seed_rows = sorted(
        resid.filter(F.col("vec_id") < PQ_K).select("vec_id", "rq").collect(),
        key=lambda r: r["vec_id"],
    )
    if len(seed_rows) < PQ_K:
        raise ValueError(f"need vec_id 0..{PQ_K - 1} present to seed PQ")
    cb = [
        [list(seed_rows[k]["rq"][m * PQ_SUB:(m + 1) * PQ_SUB]) for k in range(PQ_K)]
        for m in range(PQ_M)
    ]

    def sub(m):
        return F.slice("rq", m * PQ_SUB + 1, PQ_SUB)

    # one exact-integer Lloyd iteration over all residual subvectors:
    # (m, code, sub) exploded -> per-component int sums -> driver rebuild
    import math

    events = F.array(*[
        F.struct(
            F.lit(m).alias("m"),
            _pq_argmin(sub(m), cb[m]).alias("code"),
            sub(m).alias("sub"),
        )
        for m in range(PQ_M)
    ])
    rows = (
        resid.select(F.explode(events).alias("ev"))
        .select("ev.m", "ev.code", F.posexplode("ev.sub").alias("d", "x"))
        .groupBy("m", "code", "d")
        .agg(F.sum("x").alias("s"), F.count("*").alias("cnt"))
        .collect()
    )
    agg: dict = {}
    for r in rows:
        agg.setdefault((r["m"], r["code"]), {})[r["d"]] = (r["s"], r["cnt"])
    cb1 = [
        [
            [
                int(math.floor(agg[(m, k)][d][0] / agg[(m, k)][d][1] + 0.5))
                for d in range(PQ_SUB)
            ]
            if (m, k) in agg else list(cb[m][k])   # empty codeword: keep old
            for k in range(PQ_K)
        ]
        for m in range(PQ_M)
    ]

    codes = resid.select(
        "vec_id", "cell",
        F.array(*[_pq_argmin(sub(m), cb1[m]) for m in range(PQ_M)]).alias("codes"),
    )

    # query side: qvq + the nprobe coarse cells -- bounded driver collects
    qvq = [int(x) for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID)
           .select("vq").collect()[0]["vq"]]
    qdist = _int_l2(F.col("cq"), qvq)
    probe_rows = (
        coarse.select("c_id", "cq", qdist.alias("d"))
        .orderBy("d", "c_id").limit(IVF_NPROBE).collect()
    )
    # ADC tables: per probed cell, per subspace, distance of the query
    # RESIDUAL to every codeword (2 x 8 x 4 exact ints)
    adc_tab = {}
    for pr in probe_rows:
        qres = [qvq[i] - int(pr["cq"][i]) for i in range(EMB_DIM)]
        adc_tab[int(pr["c_id"])] = [
            [
                sum((qres[m * PQ_SUB + i] - cb1[m][k][i]) ** 2
                    for i in range(PQ_SUB))
                for k in range(PQ_K)
            ]
            for m in range(PQ_M)
        ]

    def adc_for(cell_id):
        tab = adc_tab[cell_id]
        return sum(
            (
                F.element_at(
                    F.array(*[F.lit(int(v)) for v in tab[m]]),
                    F.col("codes").getItem(m) + 1,
                ).cast("long")
            )
            for m in range(PQ_M)
        )

    probe_ids = [int(pr["c_id"]) for pr in probe_rows]
    adc = None
    for cid in probe_ids:
        branch = adc_for(cid)
        adc = F.when(F.col("cell") == cid, branch) if adc is None else adc.when(
            F.col("cell") == cid, branch
        )

    return (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .filter(F.col("cell").isin(probe_ids))
        .select("vec_id", adc.alias("adc"))
        .orderBy(F.asc("adc"), F.asc("vec_id"))
        .limit(TOPK)
    )


def _ivfpq_sql() -> str:
    """DuckDB mirror of the ENTIRE IVF-PQ chain: quantize -> coarse assign
    -> residuals -> codebook init + one exact-int Lloyd iteration (empty
    codewords kept) -> encode -> probe -> ADC sum. Every arithmetic step is
    int64, so the hash compare has no float tolerance."""
    dist = ("list_sum(list_transform(list_zip({a}, {b}), "
            "s -> (s[1] - s[2]) * (s[1] - s[2])))")
    comp_sums = ", ".join(f"sum(sub[{i + 1}]) AS s{i}" for i in range(PQ_SUB))
    rebuild = ", ".join(
        f"CAST(floor(s{i} * 1.0 / cnt + 0.5) AS BIGINT)" for i in range(PQ_SUB)
    )
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {FXP_SCALE} + 0.5) AS BIGINT)) AS vq
  FROM embeddings
),
coarse AS (
  SELECT vec_id AS c_id, vq AS cq FROM e WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
),
cells AS (
  SELECT vec_id, vq, c_id AS cell FROM (
    SELECT e.vec_id, e.vq, c.c_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist.format(a='e.vq', b='c.cq')} ASC,
                                       c.c_id ASC) AS rnk
    FROM e, coarse c
  ) WHERE rnk = 1
),
resid AS (
  SELECT cells.vec_id, cells.cell,
         list_transform(list_zip(cells.vq, coarse.cq), s -> s[1] - s[2]) AS rq
  FROM cells JOIN coarse ON cells.cell = coarse.c_id
),
subs AS (
  SELECT vec_id, cell, m,
         rq[m * {PQ_SUB} + 1 : m * {PQ_SUB} + {PQ_SUB}] AS sub
  FROM resid, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)
),
cb0 AS (
  SELECT m, vec_id AS k, sub FROM subs WHERE vec_id < {PQ_K}
),
asg0 AS (
  SELECT vec_id, m, k, sub FROM (
    SELECT s.vec_id, s.m, c.k, s.sub,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {dist.format(a='s.sub', b='c.sub')} ASC,
                                       c.k ASC) AS rnk
    FROM subs s JOIN cb0 c USING (m)
  ) WHERE rnk = 1
),
cb1 AS (
  SELECT cb0.m, cb0.k,
         coalesce(t.newsub, cb0.sub) AS sub
  FROM cb0 LEFT JOIN (
    SELECT m, k, list_value({rebuild}) AS newsub
    FROM (SELECT m, k, count(*) AS cnt, {comp_sums}
          FROM asg0 GROUP BY m, k) z
  ) t ON cb0.m = t.m AND cb0.k = t.k
),
codes AS (
  SELECT vec_id, cell, m, k AS code FROM (
    SELECT s.vec_id, s.cell, s.m, c.k,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {dist.format(a='s.sub', b='c.sub')} ASC,
                                       c.k ASC) AS rnk
    FROM subs s JOIN cb1 c USING (m)
  ) WHERE rnk = 1
),
q AS (SELECT vq AS qvq FROM e WHERE vec_id = {QUERY_VEC_ID}),
probes AS (
  SELECT c.c_id AS probe_cell, c.cq
  FROM coarse c, q
  ORDER BY {dist.format(a='q.qvq', b='c.cq')} ASC, c.c_id ASC
  LIMIT {IVF_NPROBE}
),
qres AS (
  SELECT probe_cell,
         list_transform(list_zip(q.qvq, probes.cq), s -> s[1] - s[2]) AS qr
  FROM probes, q
),
adc AS (
  SELECT codes.vec_id, sum(
    {dist.format(
        a='qres.qr[codes.m * ' + str(PQ_SUB) + ' + 1 : codes.m * '
          + str(PQ_SUB) + ' + ' + str(PQ_SUB) + ']',
        b='cb1.sub')}
  ) AS adc
  FROM codes
  JOIN qres ON codes.cell = qres.probe_cell
  JOIN cb1 ON cb1.m = codes.m AND cb1.k = codes.code
  WHERE codes.vec_id <> {QUERY_VEC_ID}
  GROUP BY codes.vec_id
)
SELECT vec_id, CAST(adc AS BIGINT) AS adc
FROM adc ORDER BY adc ASC, vec_id ASC LIMIT {TOPK}
"""


IVFPQ_SQL = _ivfpq_sql()


QUERIES = {
    "sim_cosine_topk": (cosine_topk, COSINE_TOPK_SQL),
    "sim_knn_join": (knn_join, KNN_JOIN_SQL),
    "sim_dup_keep_list": (dup_keep_list, SIM_DUP_KEEP_SQL),
    "sim_ivf_topk": (ivf_topk, IVF_TOPK_SQL),
    "sim_ivf_kmeans_topk": (ivf_kmeans_topk, IVF_KMEANS_SQL),
    "sim_cosine_dup_pairs": (cosine_dup_pairs, COSINE_DUP_SQL),
    "sim_lsh_buckets": (lsh_buckets, LSH_BUCKETS_SQL),
    "sim_lsh_ann_topk": (lsh_ann_topk, LSH_ANN_SQL),
    "sim_ivfpq_topk": (ivfpq_topk, IVFPQ_SQL),
}
