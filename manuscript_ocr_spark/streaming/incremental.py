"""Incremental / streaming surfaces.

The reference is strictly synchronous single-image (SURVEY.md §2.9 — no
streaming operators exist), so the engine's streaming layer is the natural
extension, not a port:

1. `run_incremental_extraction` — Structured Streaming over the docs table
   with Trigger.AvailableNow + foreachBatch: each micro-batch of newly
   arrived documents runs the SAME batch pipeline (extract_spans) against
   the static media table and appends to the output; the streaming
   checkpointLocation gives exactly-once file-source progress across
   restarts (the streaming counterpart of operators/checkpoint.py).

2. `windowed_event_counts` — watermarked tumbling-window aggregation
   (the standard late-data pattern) over an event stream.

3. `stateful_sessionize` — custom stateful operator via
   applyInPandasWithState: gap-based sessionization with per-user session
   state carried across micro-batches (the streaming twin of the batch
   functions.relational.sessionize query, which is its oracle in
   tests/test_resume_streaming.py). Sessions are emitted when CLOSED by a
   later event past the gap; the open tail session stays in state.
   `stateful_sessionize_tws` is the same operator on Spark 4's
   transformWithStateInPandas (StatefulProcessor + ValueState); it needs
   google.protobuf at runtime, so the offline sandbox exercises the
   applyInPandasWithState twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import SEMDEDUP_CELL_CAP
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def run_incremental_extraction(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    **extract_kwargs,
):
    """Process all docs parquet files that arrived since the last run
    (Trigger.AvailableNow), extract spans per micro-batch, write parquet.
    Restart-safe AND exactly-once end-to-end: the streaming checkpoint makes
    the file source replay each batch at most once per commit, and the sink
    is idempotent per batch — every micro-batch overwrites its own
    out_dir/batch_id=<id>/ directory, so a batch replayed after a crash
    between the sink write and the checkpoint commit replaces its own
    output instead of appending duplicates (a blind mode('append') here
    would be at-least-once). Returns after draining."""
    from ..pipeline import extract_spans

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        out = extract_spans(batch_df, media, **extract_kwargs)
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    # drop the query from the session's active registry immediately — an
    # availableNow query that has drained can otherwise linger there briefly
    # and a fast follow-up run on the SAME checkpoint trips Spark's
    # concurrent-checkpoint-use guard
    q.stop()
    return progress


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_idx bigint, n_events bigint, session_value double"
)
SESSION_STATE_SCHEMA = (
    "last_us bigint, session_idx bigint, n_events bigint, session_value double"
)


def stateful_sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    groupBy(user_id).applyInPandasWithState — per-user state is the OPEN
    session (last event time µs, session index, running count/value); each
    micro-batch folds its (ts, event_id)-sorted events into that state and
    emits every session closed by a > gap_s silence. Arrow-batched pandas,
    no per-row Python on the Spark side; state size is O(distinct users),
    independent of event volume — the property that lets it hold at 10^12
    events. Batch oracle: functions.relational.sessionize (same gap, same
    (ts, event_id) ordering, same session_idx numbering from 1).

    Requires event-time-ordered arrival per user across micro-batches (the
    file-source replay in tests provides it; in production pair with a
    watermark + ordered ingestion or a pre-sort per trigger).
    """
    import pandas as pd  # noqa: F401 (worker-side)

    def fold(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_us, idx, n, val = state.get
        else:
            last_us, idx, n, val = None, 0, 0, 0.0
        closed = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
            for t, v in zip(ts_us, pdf["value"].values):
                if last_us is None:
                    idx, n, val = 1, 1, float(v)
                elif t - last_us > gap_s * 1_000_000:
                    closed.append((user_id, idx, n, val))
                    idx, n, val = idx + 1, 1, float(v)
                else:
                    n += 1
                    val += float(v)
                last_us = int(t)
        state.update((last_us, idx, n, val))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_idx", "n_events", "session_value"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUT_SCHEMA = "text_md5 string, keep_doc_id string"
DEDUP_STATE_SCHEMA = "keep_doc_id string"


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """Cross-batch streaming exact dedup: emit each distinct text exactly
    once, the first micro-batch it appears in (keeper = min doc_id within
    that batch; later duplicates are swallowed by the per-hash state).

    The streaming twin of functions.dedup.exact_dedup for an append-only
    corpus feed: groupBy(md5(text)).applyInPandasWithState with O(1) state
    per distinct hash — state volume tracks the distinct corpus, not the
    stream, and shards with the shuffle on text_md5 (hot exact-dup hashes
    land on one key's state, which stays one row regardless of copy count)."""
    import pandas as pd  # noqa: F401 (worker-side)

    hashed = docs.select(F.md5("text").alias("text_md5"), "doc_id")

    def fold(key, pdf_iter, state):
        import pandas as pd

        (md5_hex,) = key
        best = None
        for pdf in pdf_iter:
            if len(pdf):
                m = pdf["doc_id"].min()
                best = m if best is None else min(best, m)
        if state.exists or best is None:
            return  # already emitted in an earlier batch (or empty group)
        state.update((str(best),))
        yield pd.DataFrame({"text_md5": [md5_hex], "keep_doc_id": [str(best)]})

    from pyspark.sql.streaming.state import GroupStateTimeout

    return hashed.groupBy("text_md5").applyInPandasWithState(
        fold,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LSH_PAIR_OUT_SCHEMA = "doc_a string, doc_b string"
LSH_STATE_SCHEMA = "seen array<string>"


def streaming_minhash_lsh_pairs(
    docs: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Near-dup candidate pairs AT INGEST: the streaming twin of
    functions.dedup.minhash_lsh_pairs for an append-only corpus feed.

    max_bucket_size (None → functions.dedup.DEFAULT_MAX_BUCKET_SIZE; pass
    0 or a negative value to opt out) caps per-bucket STATE — the streaming face of the same
    degenerate-bucket hazard the batch cap defuses, here it is unbounded
    state growth rather than a quadratic join. Asymmetry with batch,
    documented: batch drops a hot bucket RETROACTIVELY (no pairs at all);
    a stream cannot retract emitted pairs, so the cap binds PROSPECTIVELY —
    docs are admitted (emitting pairs against the bucket) until the bucket
    holds max_bucket_size members, then the bucket is frozen and further
    arrivals are ignored. When the cap never binds the two are identical.

    Plan shape: per micro-batch, MinHash signatures + band keys are computed
    with the SAME JVM expressions as the batch query (no Python), exploded
    to (band, key, doc_id) rows; groupBy(band, key).applyInPandasWithState
    keeps the doc_ids previously seen in each LSH bucket and emits every
    (seen × new + new × new) pair. The union of emissions over all batches
    equals the batch query's bucket-cojoin output (modulo the cross-band
    DISTINCT, which is stateless and stays downstream — dedupe at the sink).

    Scale: state per bucket is its member list — exactly the LSH premise
    (buckets are small); hot buckets shard by the (band, key) shuffle. This
    is the production dedup-at-ingestion pattern: new documents are checked
    against the accumulated corpus without ever rescanning it."""
    import pandas as pd  # noqa: F401 (worker-side)

    from ..functions.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        N_BANDS,
        N_MINHASH,
        SHINGLE,
    )

    if max_bucket_size is None:
        max_bucket_size = DEFAULT_MAX_BUCKET_SIZE
    elif max_bucket_size <= 0:
        max_bucket_size = None  # explicit opt-out: <= 0 disables the cap

    toks = F.split(F.trim(F.col("text")), r"\s+")
    shingles = F.when(
        F.size(toks) >= SHINGLE,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (SHINGLE - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE)),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    sh = F.array_distinct(shingles)

    def _mh(i: int):
        # factory keeps the lambda 1-ary: a (s, i=...) default would make
        # pyspark treat it as the 2-ary (element, index) transform variant
        prefix = f"{i}|"
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s)))
        )

    mh = [_mh(i) for i in range(N_MINHASH)]
    bands = F.array(
        *[F.md5(F.concat_ws("|", mh[2 * b], mh[2 * b + 1])) for b in range(N_BANDS)]
    )
    keyed = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(bands).alias("band", "key"),
    )

    cap = max_bucket_size

    def fold(key, pdf_iter, state):
        import pandas as pd

        seen = list(state.get[0]) if state.exists else []
        new_docs = []
        for pdf in pdf_iter:
            new_docs.extend(str(d) for d in pdf["doc_id"])
        new_docs = sorted(set(new_docs) - set(seen))
        pairs = []
        admitted = []
        for d in new_docs:
            if cap is not None and len(seen) + len(admitted) >= cap:
                break  # bucket frozen: deterministic (new_docs is sorted)
            for s in seen:
                pairs.append((min(d, s), max(d, s)))
            for e in admitted:
                pairs.append((min(d, e), max(d, e)))
            admitted.append(d)
        state.update((seen + admitted,))
        if pairs:
            yield pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    from pyspark.sql.streaming.state import GroupStateTimeout

    return keyed.groupBy("band", "key").applyInPandasWithState(
        fold,
        outputStructType=LSH_PAIR_OUT_SCHEMA,
        stateStructType=LSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — works on a
    streaming OR batch events DataFrame (same plan both ways)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stateful_sessionize_tws(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization on the transformWithStateInPandas API
    (Spark 4's successor to applyInPandasWithState): the open session lives
    in a named ValueState managed by a StatefulProcessor. Same closed-session
    semantics as stateful_sessionize (same batch oracle); the handle-based
    state API is what a production job would extend with event-time timers
    to flush open sessions at the watermark.

    Runtime requirement: TWS's JVM↔Python state channel speaks protobuf, so
    executing this operator needs `google.protobuf` installed (absent in the
    offline build sandbox — the pytest variant auto-skips there; the
    applyInPandasWithState twin has no such dependency and is the one
    exercised by CI here)."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("last_us", LongType()),
            StructField("session_idx", LongType()),
            StructField("n_events", LongType()),
            StructField("session_value", DoubleType()),
        ]
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open_session", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            if self._open.exists():
                last_us, idx, n, val = self._open.get()
            else:
                last_us, idx, n, val = None, 0, 0, 0.0
            closed = []
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values(["ts", "event_id"])
                ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
                for t, v in zip(ts_us, pdf["value"].values):
                    if last_us is None:
                        idx, n, val = 1, 1, float(v)
                    elif t - last_us > gap_s * 1_000_000:
                        closed.append((user_id, idx, n, val))
                        idx, n, val = idx + 1, 1, float(v)
                    else:
                        n += 1
                        val += float(v)
                    last_us = int(t)
            self._open.update((int(last_us), int(idx), int(n), float(val)))
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=["user_id", "session_idx", "n_events", "session_value"],
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def stateful_sessionize_tws_timers(
    events: DataFrame, gap_s: int = 1800, watermark: str = "0 seconds"
) -> DataFrame:
    """Sessionization with EVENT-TIME TIMER flush (SURVEY §9 item 3): same
    closed-session emission as stateful_sessionize_tws, plus each open
    session registers a timer at last_event + gap; when the watermark passes
    it, handleExpiredTimer flushes the open session and clears the state —
    so sessions of users who simply STOP sending events still emit, which
    the no-timer twins structurally cannot do (their tail sessions wait in
    state forever). This is the production form at 10^12 events: state is
    self-draining, bounded by ACTIVE users inside the gap horizon.

    Input must be watermarked (timeMode='EventTime' requires it); the timer
    is re-registered (old one deleted) whenever a batch extends the open
    session. Same protobuf runtime requirement as the other TWS operator —
    the pytest body is written and auto-skips in this sandbox; on a
    protobuf-equipped host it asserts closed-session equality with
    stateful_sessionize plus the flushed tails."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("last_us", LongType()),
            StructField("session_idx", LongType()),
            StructField("n_events", LongType()),
            StructField("session_value", DoubleType()),
        ]
    )

    class TimerSessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState("open_session", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            if self._open.exists():
                last_us, idx, n, val = self._open.get()
            else:
                last_us, idx, n, val = None, 0, 0, 0.0
            old_last = last_us
            closed = []
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values(["ts", "event_id"])
                ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
                for t, v in zip(ts_us, pdf["value"].values):
                    if last_us is None:
                        idx, n, val = 1, 1, float(v)
                    elif t - last_us > gap_s * 1_000_000:
                        closed.append((user_id, idx, n, val))
                        idx, n, val = idx + 1, 1, float(v)
                    else:
                        n += 1
                        val += float(v)
                    last_us = int(t)
            self._open.update((int(last_us), int(idx), int(n), float(val)))
            # slide the flush timer to the new session end (one live timer
            # per key: delete the superseded expiry before registering)
            if old_last is not None and old_last != last_us:
                self._handle.deleteTimer(old_last // 1000 + gap_s * 1000)
            self._handle.registerTimer(last_us // 1000 + gap_s * 1000)
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=["user_id", "session_idx", "n_events", "session_value"],
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            (user_id,) = key
            if not self._open.exists():
                return
            last_us, idx, n, val = self._open.get()
            # the watermark passed last_event + gap: flush the open tail
            if expiredTimerInfo.getExpiryTimeInMs() >= last_us // 1000 + gap_s * 1000:
                self._open.clear()
                yield pd.DataFrame(
                    [(user_id, idx, n, val)],
                    columns=["user_id", "session_idx", "n_events", "session_value"],
                )

        def close(self) -> None:
            pass

    return events.withWatermark("ts", watermark).groupBy(
        "user_id"
    ).transformWithStateInPandas(
        TimerSessionProcessor(),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


EMBEDDINGS_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def run_incremental_ann_ingest(
    spark: SparkSession,
    vectors_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """ANN index ingest AT STREAM TIME (round-5): every micro-batch of
    newly-arrived embedding files is encoded with the materialized IVF-PQ
    index's FROZEN coarse centroids + codebook (functions.similarity.
    ivfpq_append — assignment, residuals, Arrow-batched code argmin) and
    appended to the index's cell-partitioned codes.parquet. Searches see
    new vectors as soon as their batch commits; nothing retrains, nothing
    rescans the existing corpus — the operational shape of a 10^12-vector
    index taking daily increments.

    Restart-safe at-least-once into an idempotent-by-content sink: a batch
    replayed after a crash between the append and the checkpoint commit
    writes duplicate (vec_id, cell, codes) rows — encoding is
    deterministic, so duplicates are EXACT copies and search results only
    ever duplicate a hit's id, never change a distance. Compact with a
    distinct-by-vec_id rewrite if exactly-once ids matter downstream.
    Returns the final streaming progress after draining."""
    from ..functions.similarity import ivfpq_appender

    # the index's codebook + centroids are FROZEN: load and broadcast them
    # ONCE before the stream starts — appending per-batch via the one-shot
    # ivfpq_append would re-collect the metadata and leak one codebook
    # broadcast per micro-batch over a long-running ingest
    append = ivfpq_appender(spark, index_dir)

    reader = spark.readStream.schema(EMBEDDINGS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(vectors_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        append(batch_df.select("vec_id", "embedding"))

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    q.stop()
    return progress


TEXT_DOCS_SCHEMA = "doc_id bigint, text string"


def run_incremental_quality_scores(
    spark: SparkSession,
    docs_dir: str,
    lm_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Corpus-quality scoring AT INGEST (round 7): every micro-batch of
    newly-arrived document files is scored under the FROZEN
    reference-corpus unigram LM (functions.text.lm_build — counts +
    normalizer materialized before the stream starts; retraining per
    shard would make scores incomparable across shards, and a
    stream-side aggregation would need cross-batch state for no reason).
    This is the CCNet operational shape: train the LM on the curated
    corpus once, score every incoming shard under it, band downstream.

    The scoring tail is functions.text._lm_score_frame — the SAME
    expressions as the batch registry query — via foreachBatch (the
    per-doc aggregation is within-batch by construction: each document
    arrives whole in one file/batch, so no streaming-state aggregation
    is involved). Out-of-vocabulary words score the unseen-word add-one
    probability 1/(N+V) (the left-join coalesce in the shared tail).

    Restart-safe at-least-once into an idempotent-by-content sink (the
    ANN-ingest device): scoring is deterministic under the frozen model,
    so a replayed batch appends exact duplicate rows — dedupe by doc_id
    downstream if exactly-once matters. Returns the final progress."""
    from ..functions.text import _lm_score_frame

    import os

    counts = spark.read.parquet(os.path.join(lm_dir, "counts.parquet"))
    norm = spark.read.parquet(os.path.join(lm_dir, "norm.parquet"))

    reader = spark.readStream.schema(TEXT_DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        (
            _lm_score_frame(batch_df, counts, norm)
            .write.mode("append").parquet(out_dir)
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    q.stop()
    return progress


SEM_PAIR_OUT_SCHEMA = "vec_a bigint, vec_b bigint, cosine double"
SEM_KEEP_OUT_SCHEMA = "vec_id bigint, cell int, is_dup boolean"
SEM_STATE_SCHEMA = "ids array<bigint>, vecs array<array<double>>"

# Above this K, the literal-centroid argmin expression (~K·130 Catalyst
# nodes) crosses into the repo's recorded literal-tree landmine (a
# 2048-literal create_map cost ~7 s of ANALYSIS; memory: round-5 notes) —
# assignment switches to the Arrow-batched numpy path, whose exact-integer
# math is order-free and therefore bit-identical to the JVM expression.
STREAM_ASSIGN_MAX_LITERAL_K = 256


def _fold_dots(mat, a):
    """Left-to-right double-fold dot products of each row of `mat` against
    `a`, bit-identical to functions.similarity._dot (F.aggregate from 0.0):
    elementwise products are single IEEE multiplies either way, and
    np.add.accumulate is a strict serial accumulation — the same addition
    order as the SQL fold, unlike BLAS `@` (multi-accumulator summation,
    ±1 ulp off, enough to flip a round() or a threshold compare)."""
    import numpy as np

    prods = mat * a[None, :]
    return np.add.accumulate(prods, axis=1)[:, -1]


def _round3_half_up(c: float) -> float:
    """Spark F.round(_, 3) for doubles: HALF_UP on the shortest decimal
    representation (java BigDecimal.valueOf ≡ Python repr), NOT Python's
    round() (half-to-even: round(0.0625, 3) = 0.062, Spark gives 0.063)."""
    import decimal

    return float(
        decimal.Decimal(repr(c)).quantize(
            decimal.Decimal("0.001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _collect_frozen_centroids(spark, index_dir: str):
    """The trained centroids, collected ONCE before a stream starts (the
    frozen-codebook rule of run_incremental_ann_ingest), sorted by c_id so
    np.argmin's first-minimum rule matches the struct-min tie-break."""
    import os

    return sorted(
        (int(r["c_id"]), list(r["cq"]))
        for r in spark.read.parquet(
            os.path.join(index_dir, "centroids.parquet")
        ).collect()
    )


def _assign_stream_cells(
    vectors: DataFrame, cents, assign_max_literal_k: int
) -> DataFrame:
    """(vec_id, embedding) → (vec_id, v, cell) against the frozen trained
    centroids — the shared stateless assignment stage of every streaming
    SemDeDup face (the stateful dup stream AND the contamination stream).

    For K ≤ assign_max_literal_k the centroids ride as literal int arrays
    and the cell is a pure-JVM argmin over K exact-integer squared L2
    distances (array_min over (dist, c_id) structs — no shuffle, no
    Python). Beyond that, the literal tree would trip the Catalyst
    analysis-cost landmine (~K·130 nodes), so assignment switches to an
    Arrow-batched numpy stage against the same centroid matrix —
    bit-identical output: every distance is exact int64 arithmetic in
    both shapes (order-free), and np.argmin's first-minimum rule is the
    struct-min's lowest-c_id tie-break."""
    import numpy as np

    from ..functions.similarity import FXP_SCALE, _int_l2, _quantize

    emb = vectors.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        _quantize("embedding").alias("vq"),
    )
    if len(cents) <= assign_max_literal_k:
        dc = F.array(*[
            F.struct(_int_l2(F.col("vq"), cq).alias("d"),
                     F.lit(cid).alias("c_id"))
            for cid, cq in cents
        ])
        return emb.select(
            "vec_id", "v", F.array_min(dc)["c_id"].alias("cell"))

    cid_arr = np.array([c for c, _ in cents], dtype=np.int64)
    cq_mat = np.array([q for _, q in cents], dtype=np.int64)
    cq_sq = (cq_mat * cq_mat).sum(axis=1)  # ‖c‖² per centroid, exact
    CHUNK = 256  # bounds scratch to CHUNK×K int64 (~128 MB at K=2^16)

    def assign(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            # Arrow hands each list element as a numpy array: stack
            # them without a per-row Python list round-trip (this is
            # the deployment-K ingest hot path)
            vs = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64, copy=False)
            vq = np.floor(vs * FXP_SCALE + 0.5).astype(np.int64)
            cells = np.empty(len(vq), dtype=np.int64)
            for lo in range(0, len(vq), CHUNK):
                part = vq[lo:lo + CHUNK]
                # ‖v−c‖² = ‖v‖² − 2 v·c + ‖c‖², all int64 (exact and
                # order-free, so bit-identical to the JVM fold);
                # argmin's first-minimum == the struct-min's lowest-
                # c_id tie-break because cq_mat is sorted by c_id
                d = (
                    (part * part).sum(axis=1)[:, None]
                    - 2 * (part @ cq_mat.T)
                    + cq_sq[None, :]
                )
                cells[lo:lo + CHUNK] = cid_arr[np.argmin(d, axis=1)]
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "v": [list(row) for row in vs],
                "cell": cells,
            })

    return emb.select("vec_id", F.col("v").alias("embedding")) \
        .mapInPandas(assign, "vec_id bigint, v array<double>, cell int")


def _semantic_stream(
    vectors: DataFrame,
    index_dir: str,
    max_cell_size: int | None,
    assign_max_literal_k: int,
    emit: str,
) -> DataFrame:
    """Shared core of the two streaming SemDeDup faces: frozen-centroid
    cell assignment + the per-cell stateful fold. emit="pairs" yields
    (vec_a, vec_b, cosine) rows (streaming_semantic_dup_pairs);
    emit="keep" yields one (vec_id, cell, is_dup) row per ADMITTED
    arrival (streaming_semantic_dedup_at_ingest). One fold, two outputs —
    the admission logic, state layout, cap semantics, and exact-arithmetic
    contract cannot drift between them.

    Semantic near-dup pairs AT INGEST: the embedding twin of
    streaming_minhash_lsh_pairs, and the streaming face of
    functions.similarity.semantic_dup_pairs — new vectors are assigned to
    the materialized index's FROZEN trained k-means cells and compared
    (exact cosine) only against the vectors already accumulated in their
    cell, emitting every pair above DUP_COS_THRESHOLD. New documents are
    checked against the whole prior corpus without ever rescanning it —
    the incremental SemDeDup shape for a continuously-ingesting pipeline.

    Cell assignment: the K trained centroids are collected ONCE before the
    stream starts (the frozen-codebook rule of run_incremental_ann_ingest).
    For K ≤ assign_max_literal_k they ride as literal int arrays and each
    row's cell is a pure-JVM argmin over K exact-integer squared L2
    distances (array_min over (dist, c_id) structs — no shuffle, no
    Python). Beyond that, the literal expression tree would trip the
    Catalyst analysis-cost landmine (~K·130 nodes), so assignment switches
    to an Arrow-batched numpy stage against the same centroid matrix —
    bit-identical output, because every distance is exact int64 arithmetic
    in both shapes (order-free), and np.argmin's first-minimum rule is the
    struct-min's lowest-c_id tie-break. Either way the only STATEFUL
    operator is the per-cell fold, so the plan stays legal in append mode.

    max_cell_size follows the batch query's convention exactly (they are
    documented as two faces of one operator): the default applies
    SEMDEDUP_CELL_CAP, None opts out. It caps per-cell STATE,
    prospectively like the LSH twin: once a cell holds cap members, later
    arrivals are ignored (within a micro-batch, admission order is vec_id
    — deterministic under replay). Asymmetry with batch, documented: the
    batch cap keeps each cell's first cap vectors by GLOBAL vec_id order,
    a stream can only freeze in arrival order; when the cap never binds
    the two outputs are identical.

    Exactness contract: emitted cosines are BIT-IDENTICAL to the batch
    query's — dot products and norms use the same left-to-right double
    fold as the SQL expressions (_fold_dots) and rounding is Spark's
    HALF_UP-on-decimal-repr (_round3_half_up), so a threshold-straddling
    pair can never be emitted by one face and dropped by the other.

    Scale: state per cell is its (bounded) member list — cap·dim doubles,
    ≤ ~0.5 MB at the defaults; cells shard across executors by the one
    `cell` shuffle, and K is sized with the corpus (the coarse-K sizing
    rule), so per-cell state stays constant as the corpus grows. Per
    arrival, scoring is one vectorized multiply + serial-accumulate over
    the cell's (n, dim) state matrix with cached per-member norms — no
    per-pair Python loops, no norm recomputation.

    Restart-safe at-least-once: a replayed micro-batch re-admits the same
    vec_ids (state dedupes by id), so duplicate emissions are exact
    copies — dedupe at the sink if exactly-once pairs matter."""
    import numpy as np

    from ..functions.similarity import DUP_COS_THRESHOLD

    spark = vectors.sparkSession
    cents = _collect_frozen_centroids(spark, index_dir)
    keyed = _assign_stream_cells(vectors, cents, assign_max_literal_k)

    cap = max_cell_size
    thresh = DUP_COS_THRESHOLD

    def fold(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            ids = list(state.get[0])
            vecs = [list(x) for x in state.get[1]]
        else:
            ids, vecs = [], []
        new = []
        for pdf in pdf_iter:
            for vid, v in zip(pdf["vec_id"], pdf["v"]):
                new.append((int(vid), [float(x) for x in v]))
        new.sort()  # deterministic admission under replay
        seen = set(ids)
        dim = len(vecs[0]) if vecs else (len(new[0][1]) if new else 0)
        mat = np.array(vecs, dtype=np.float64).reshape(len(vecs), dim)
        # cached per-member norms: sqrt of the same left-to-right fold
        norms = list(np.sqrt(_fold_dots(mat * mat, np.ones(dim)))
                     ) if len(vecs) else []
        # (mat*mat then fold against ones == fold of squares in order)
        out = []
        for vid, v in new:
            if vid in seen:
                continue  # at-least-once replay: already admitted
            if cap is not None and len(ids) >= cap:
                break  # cell frozen prospectively
            a = np.asarray(v, dtype=np.float64)
            na = float(np.sqrt(_fold_dots(a[None, :] * a[None, :],
                                          np.ones(dim))[0]))
            hit = False
            if len(ids):
                dots = _fold_dots(mat, a)
                cos = dots / (np.array(norms) * na)
                for j in np.nonzero(cos > thresh)[0]:
                    hit = True
                    if emit == "pairs":
                        oid = ids[j]
                        lo, hi = (oid, vid) if oid < vid else (vid, oid)
                        out.append((lo, hi, _round3_half_up(float(cos[j]))))
            if emit == "keep":
                out.append((vid, int(key[0]), hit))
            ids.append(vid)
            vecs.append(v)
            mat = np.vstack([mat, a[None, :]])
            norms.append(na)
            seen.add(vid)
        state.update((ids, vecs))
        if out:
            cols = (["vec_a", "vec_b", "cosine"] if emit == "pairs"
                    else ["vec_id", "cell", "is_dup"])
            yield pd.DataFrame(out, columns=cols)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return keyed.groupBy("cell").applyInPandasWithState(
        fold,
        outputStructType=(SEM_PAIR_OUT_SCHEMA if emit == "pairs"
                          else SEM_KEEP_OUT_SCHEMA),
        stateStructType=SEM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_semantic_dup_pairs(
    vectors: DataFrame,
    index_dir: str,
    max_cell_size: int | None = SEMDEDUP_CELL_CAP,
    assign_max_literal_k: int = STREAM_ASSIGN_MAX_LITERAL_K,
) -> DataFrame:
    """Semantic near-dup pairs at ingest — see _semantic_stream for the
    full contract (cell assignment, cap semantics, exactness, scale,
    replay). Output: (vec_a, vec_b, cosine) append rows whose union over
    all micro-batches equals batch semantic_dup_pairs (pinned by test)."""
    return _semantic_stream(
        vectors, index_dir, max_cell_size, assign_max_literal_k, "pairs")


def streaming_semantic_dedup_at_ingest(
    vectors: DataFrame,
    index_dir: str,
    max_cell_size: int | None = SEMDEDUP_CELL_CAP,
    assign_max_literal_k: int = STREAM_ASSIGN_MAX_LITERAL_K,
) -> DataFrame:
    """The semantic dedup DECISION at ingest: one (vec_id, cell, is_dup)
    row per admitted arrival, is_dup = true iff its cosine against some
    EARLIER-ADMITTED member of its cell exceeds DUP_COS_THRESHOLD. The
    embedding twin of streaming_exact_dedup, and the online face of the
    batch keep list (semantic_dup_keep with the default min-id keeper):
    route is_dup=false rows into the corpus, drop the rest — new data is
    deduplicated against everything already ingested without ever
    rescanning it.

    Soundness law vs batch (always, cap non-binding): is_dup=true ⇒ batch
    keep=false. An arrival that pairs with an earlier admitted member has
    a smaller vec_id in its component, so it cannot be the component's
    min-id keeper. Online drops are therefore always batch-sanctioned —
    the stream NEVER discards a vector the batch keep list would keep.

    Documented divergence (prospective-irrevocable, same class as the LSH
    and cap asymmetries): the converse fails on LATE BRIDGES — a member
    whose only path to a smaller id runs through a vector that arrives
    later is kept online (no edge existed at its admission) but is a
    batch non-keeper once the bridge lands. Online keepers are thus a
    superset of batch keepers: conservative in the safe direction (keeps
    slightly more near-dups; never loses data). The divergence set is
    exactly the late-bridge members — pinned by test against the batch
    pair graph. Under the centroid keeper policy (semantic_dup_keep
    keeper="centroid") no online analogue exists: that policy needs the
    finished component.

    Same state, cap, replay, and exact-arithmetic contract as
    streaming_semantic_dup_pairs (one shared fold); frozen-cell arrivals
    (cap bound) emit nothing, mirroring the batch keep list's restriction
    to capped members."""
    return _semantic_stream(
        vectors, index_dir, max_cell_size, assign_max_literal_k, "keep")


def streaming_semantic_contamination(
    vectors: DataFrame,
    index_dir: str,
    bench_df: DataFrame,
    assign_max_literal_k: int = STREAM_ASSIGN_MAX_LITERAL_K,
) -> DataFrame:
    """Benchmark DECONTAMINATION at ingest: flag arriving vectors whose
    embedding is near-duplicate (cosine > DUP_COS_THRESHOLD) to an eval
    vector — the streaming face of functions.similarity
    .semantic_contamination, blocking eval-contaminated examples BEFORE
    they enter the corpus. bench_df is the eval suite as a bounded
    (vec_id, embedding) batch DataFrame (external vectors — eval suites
    are not part of the training corpus).

    STATELESS, unlike the dup stream: the benchmark is fixed before the
    stream starts, so this is a stream-static broadcast join — arrivals
    are assigned to the frozen trained cells (_assign_stream_cells, the
    same literal/Arrow split as the dup stream), the benchmark side is
    assigned ONCE on the driver (exact-int64 argmin against the collected
    centroids, the batch external-bench device) and grouped into per-cell
    member lists that ride a broadcast; cosine is computed inside the
    array transform with the SAME _dot/_norm JVM folds as the batch query
    and thresholded BEFORE the explode. No shuffle, no state store, plan
    trivially legal in append mode; per-arrival work is
    O(bench-members-in-cell), bounded by the benchmark size.

    Output (vec_id, bench_vec_id, cosine rounded 3) — BIT-IDENTICAL to
    the batch query restricted to the arrived vectors (pinned by test:
    same assignment math, same fold cosine, same F.round). Self-pairs
    excluded by id, as in batch — namespace external bench ids if
    collisions are possible. Emissions are per-arrival facts, so replay
    duplicates are exact copies; contaminated cell membership never
    changes mid-stream (frozen benchmark), making this safe to use as an
    ingest filter (anti-join arrivals against the flagged vec_ids)."""
    import numpy as np

    from ..functions.similarity import (
        DUP_COS_THRESHOLD,
        FXP_SCALE,
        _dot,
        _norm,
    )

    spark = vectors.sparkSession
    cents = _collect_frozen_centroids(spark, index_dir)
    keyed = _assign_stream_cells(vectors, cents, assign_max_literal_k)

    cid_arr = np.array([c for c, _ in cents], dtype=np.int64)
    cq_mat = np.array([q for _, q in cents], dtype=np.int64)
    assigned = []
    for r in bench_df.select("vec_id", "embedding").collect():
        v = [float(x) for x in r["embedding"]]
        vq = np.floor(np.asarray(v, dtype=np.float64)
                      * FXP_SCALE + 0.5).astype(np.int64)
        d = ((vq[None, :] - cq_mat) ** 2).sum(axis=1)
        assigned.append(
            (int(cid_arr[int(np.argmin(d))]), int(r["vec_id"]), v))
    bgrp = (
        spark.createDataFrame(
            assigned, schema="cell int, vec_id bigint, v array<double>")
        .select("cell", "vec_id", "v", _norm(F.col("v")).alias("nn"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("vec_id", "v", "nn")))
             .alias("bs"))
    )
    hits = F.filter(
        F.transform(
            "bs",
            lambda b: F.struct(
                b["vec_id"].alias("bench_vec_id"),
                (_dot(F.col("v"), b["v"]) / (F.col("nn") * b["nn"]))
                .alias("c"),
            ),
        ),
        lambda p: (p["c"] > DUP_COS_THRESHOLD)
        & (p["bench_vec_id"] != F.col("vec_id")),
    )
    return (
        keyed.withColumn("nn", _norm(F.col("v")))
        .join(F.broadcast(bgrp), "cell")
        .select("vec_id", F.explode(hits).alias("p"))
        .select("vec_id", "p.bench_vec_id",
                F.round("p.c", 3).alias("cosine"))
    )
