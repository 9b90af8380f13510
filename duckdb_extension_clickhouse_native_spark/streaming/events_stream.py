"""Structured Streaming surface over the events table.

The reference is batch-only (SURVEY.md §2.2: streaming absent); this
module adds the streaming analogues a pipeline needs: windowed
aggregation with watermarked late-data handling, and a custom
stateful operator via ``applyInPandasWithState``. Tests drive these
with a file source over the driver's parquet + a memory sink and
``processAllAvailable()`` so they run deterministically offline.

On a real cluster the same code runs against Kafka/file streams —
only the reader changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# nanos-era fallback layout; read_events_stream prefers the actual
# parquet footer schema (the driver's data has stored ts as int64-ns
# and as timestamp[us] across rounds — both are normalized to
# TIMESTAMP below)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # ns since epoch (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch in tests); ns epoch converted to TIMESTAMP."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    # the file stream source needs a directory; expose events.parquet
    # alone via a symlink dir (streaming the raw sf_dir would ingest
    # every table)
    import os
    import tempfile

    import hashlib

    # key by the FULL path (two sf_dirs can share a basename) and
    # re-link when the target moved or the old link is dangling
    target = os.path.abspath(f"{sf_dir}/events.parquet")
    tag = hashlib.md5(target.encode()).hexdigest()[:12]
    stream_dir = os.path.join(tempfile.gettempdir(), "chsql_stream_src", tag)
    os.makedirs(stream_dir, exist_ok=True)
    # the file stream source does not recurse into subdirectories: link
    # each part file when the source is a parquet DIRECTORY, else one
    # link for the single file
    if os.path.isdir(target):
        sources = [
            os.path.join(target, f)
            for f in sorted(os.listdir(target))
            if f.endswith(".parquet")
        ]
    else:
        sources = [target]
    expected = {f"events-{i:03d}.parquet": src for i, src in enumerate(sources)}
    for f in os.listdir(stream_dir):
        if f not in expected:  # stale link from an older layout
            os.remove(os.path.join(stream_dir, f))
    for name, src in expected.items():
        link = os.path.join(stream_dir, name)
        if os.path.islink(link) and os.path.realpath(link) != os.path.realpath(src):
            os.remove(link)
        if not os.path.lexists(link):
            os.symlink(src, link)
    # use the file's real schema (the stream source needs one declared
    # up front): ts has been int64-ns in some rounds and timestamp[us]
    # in others; normalize either to TIMESTAMP (LTZ, session tz UTC)
    from pyspark.sql.types import LongType as _Long, TimestampNTZType as _NTZ

    try:
        schema = spark.read.parquet(stream_dir).schema
    except Exception:
        schema = EVENTS_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, _Long):
        return raw.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    if isinstance(ts_type, _NTZ):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts with a watermark: the streaming analogue
    of the batch ``events_time_buckets`` conformance query. State for
    windows older than the watermark is dropped — bounded memory on an
    unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


SESSION_STATE_SCHEMA = "last_ts double, session_no bigint, n_events bigint"
SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_no bigint, n_events bigint, last_ts double"
)


def running_sessions(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator: per-user gap-based session tracking
    via applyInPandasWithState (the streaming twin of the batch
    ``events_sessionize`` query). State = (last_ts, session_no,
    n_events) per user — O(users) memory, partitioned by key."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        if state.exists:
            last_ts, session_no, n_events = state.get
        else:
            last_ts, session_no, n_events = float("-inf"), 0, 0
        # accumulate ALL chunks first: a large group arrives as several
        # Arrow chunks, and sorting per chunk would process out-of-order
        # timestamps against the wrong last_ts
        all_ts: list[float] = []
        for pdf in pdf_iter:
            if not pdf.empty:
                all_ts.extend(pdf["ts_sec"].tolist())
        if not all_ts:
            return
        for t in sorted(all_ts):
            if t - last_ts > gap_seconds:
                session_no += 1
                n_events = 0
            last_ts = t
            n_events += 1
        state.update((last_ts, session_no, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_no": [session_no],
                "n_events": [n_events],
                "last_ts": [last_ts],
            }
        )

    prepared = events.select(
        "user_id", F.col("ts").cast("double").alias("ts_sec")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion over the available files
    and return the memory-sink table name."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def click_purchase_join(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Stream-stream interval join: each click joined to the same
    user's purchases within ``minutes`` after it.

    Both sides carry a watermark and the join condition bounds purchase
    time relative to click time, so state on each side evicts once the
    watermark passes the interval — bounded memory on an unbounded
    stream (the canonical attribution-join shape). Inner-join matches
    emit as soon as both rows have arrived; no output waits on the
    watermark, so over a bounded stream the result equals the batch
    join exactly.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    return clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user_id)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (
            purchases.purchase_ts
            <= clicks.click_ts + F.expr(f"INTERVAL {minutes} MINUTES")
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.col("purchase_value"),
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
        ).alias("gap_us"),
    )


def write_stream_native(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    compression: str | None = None,
    partition_by: str | None = None,
):
    """Streaming sink into the ClickHouse Native format: each
    micro-batch lands as its own batch directory of Native part files,
    written by the DISTRIBUTED batch writer (one file per partition) —
    the ingest loop the reference has no analogue for (its extension is
    read-only; SURVEY.md §2.1 'Sinks: none').

    Exactly-once across restarts: the batch directory is named by the
    deterministic ``batchId`` and written with ``mode("overwrite")``,
    so a replayed batch (after a crash between write and checkpoint
    commit) overwrites its own partial output instead of duplicating
    it — foreachBatch idempotency the way the Structured Streaming
    guide prescribes. Returns the StreamingQuery; callers drive it
    (``processAllAvailable`` in tests) and read the result back with
    ``spark.read.format("clickhouse_native").load(f"{out_dir}/batch-*")``.
    """
    import os

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch-{batch_id:05d}")
        w = batch_df.write.format("clickhouse_native").mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        if partition_by:
            # each batch directory is its own hive root (key=value
            # subdirs inside batch-N); readers open batch dirs
            # individually so partition discovery and pruning apply
            w = w.option("partition_by", partition_by)
        w.save(target)

    return (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _split_parquet_stream(
    spark: SparkSession,
    target: str,
    n_parts: int,
    root: str,
    prefix: str,
) -> DataFrame:
    """File-source stream over one parquet table, split row-wise into
    ``n_parts`` part files so tests exercise REAL multi-micro-batch
    execution (one file per trigger), not a single-batch degenerate
    run. The split fixture lives under a content-stamped tmp dir
    (mtime_ns + size of the source parquet) and is rebuilt only when
    the source changes; stale stamps for the same source are pruned.
    Part files get strictly ascending mtimes so the file stream source
    (which orders by modification time) replays them in ROW order —
    order-independent consumers don't care, order-sensitive ones (the
    streaming funnel) rely on it. On a real cluster this reader is
    Kafka/file-drop ingestion — only the reader changes, as with the
    events stream."""
    import os
    import shutil
    import tempfile

    import hashlib

    from ..plans.base import ensure_session

    ensure_session(spark)
    target = os.path.abspath(target)
    st = os.stat(target)
    tag = hashlib.md5(target.encode()).hexdigest()[:12]
    parent = os.path.join(tempfile.gettempdir(), root, tag)
    stamp = f"{st.st_mtime_ns}_{st.st_size}_{n_parts}"
    part_dir = os.path.join(parent, stamp)
    if not os.path.isdir(part_dir):
        import pyarrow.parquet as pq
        import pyarrow.parquet as pqw

        import time

        os.makedirs(parent, exist_ok=True)
        for old in os.listdir(parent):
            if old == stamp or old.endswith(".tmp"):
                continue
            full = os.path.join(parent, old)
            # age guard (r7 review fix): a concurrent process whose
            # stream started just before the source was rewritten may
            # still be reading an older stamp's part files — only
            # reap stamps old enough that no short-lived conformance
            # stream can still be on them
            try:
                if time.time() - os.stat(full).st_mtime < 600:
                    continue
            except OSError:
                pass
            shutil.rmtree(full, ignore_errors=True)
        tmp = part_dir + f".{os.getpid()}.tmp"
        os.makedirs(tmp, exist_ok=True)
        t = pq.read_table(target)
        n = t.num_rows
        step = max(1, (n + n_parts - 1) // n_parts)
        base_mtime = int(time.time()) - n_parts - 1
        for i in range(0, n_parts):
            chunk = t.slice(i * step, step)
            if chunk.num_rows:
                path = os.path.join(tmp, f"{prefix}-{i:03d}.parquet")
                pqw.write_table(chunk, path)
                os.utime(path, (base_mtime + i, base_mtime + i))
        try:
            os.rename(tmp, part_dir)  # atomic publish; loser cleans up
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    schema = spark.read.parquet(part_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(part_dir)
    )


def read_documents_stream(
    spark: SparkSession, sf_dir: str, n_parts: int = 4
) -> DataFrame:
    """Multi-micro-batch stream over the documents table (see
    ``_split_parquet_stream``)."""
    return _split_parquet_stream(
        spark, f"{sf_dir}/documents.parquet", n_parts, "chsql_stream_src_docs", "docs"
    )


def read_events_stream_parts(
    spark: SparkSession, sf_dir: str, n_parts: int = 4
) -> DataFrame:
    """Multi-micro-batch stream over the events table with ts
    normalized to TIMESTAMP, replayed in row (= event-time) order —
    the in-order ingest the stateful funnel assumes (the same
    assumption the stateful sessionizer documents; a production
    deploy buffers within a watermark instead)."""
    from pyspark.sql.types import LongType as _Long, TimestampNTZType as _NTZ

    raw = _split_parquet_stream(
        spark, f"{sf_dir}/events.parquet", n_parts, "chsql_stream_src_evparts", "ev"
    )
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, _Long):
        return raw.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    if isinstance(ts_type, _NTZ):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def running_funnel(
    events: DataFrame,
    chain: tuple = None,
    window_us: int = 4 * 3600 * 1_000_000,
) -> DataFrame:
    """Streaming twin of the batch ``window_funnel_sql`` DP: per-user
    state = the latest viable chain-start per level (K-1 BIGINTs, -1
    sentinel) plus the achieved level — O(users * K) memory total,
    independent of event volume. Each micro-batch replays the SAME
    greedy recurrence the batch query's running-MAX windows compute
    (operators/funnel.py — dominance makes it exact), so after the
    stream drains, per-user MAX(level) equals the batch funnel row
    for row-order ingest. Levels are monotone, so emitted updates are
    safe under append-style collection."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.funnel import FUNNEL_CHAIN

    chain = tuple(chain or FUNNEL_CHAIN)
    k = len(chain)

    def track(key, pdf_iter, state: GroupState):
        if state.exists:
            bests, level = list(state.get[0]), state.get[1]
            first = False
        else:
            bests, level = [-1] * (k - 1), 0
            first = True
        rows: list = []
        # accumulate all chunks, then sort: within a micro-batch Arrow
        # chunking is arbitrary, the DP needs (t, event_id) order
        for pdf in pdf_iter:
            if not pdf.empty:
                rows.extend(
                    zip(pdf["t"].tolist(), pdf["event_id"].tolist(), pdf["event_type"].tolist())
                )
        if not rows:
            return
        rows.sort()
        prev_level = level
        for t, _eid, ty in rows:
            starts = [-1] * k
            if ty == chain[0]:
                starts[0] = t
                level = max(level, 1)
            for j in range(1, k):
                if ty == chain[j] and bests[j - 1] >= 0 and t - bests[j - 1] <= window_us:
                    starts[j] = bests[j - 1]
                    level = max(level, j + 1)
            # strictly-preceding semantics: fold the row's starts into
            # the running maxima only AFTER evaluating the row
            for j in range(k - 1):
                if starts[j] > bests[j]:
                    bests[j] = starts[j]
        state.update((bests, level))
        if first or level > prev_level:
            yield pd.DataFrame({"user_id": [key[0]], "funnel_level": [level]})

    prepared = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("t"),
    ).where(F.col("event_type").isin(list(chain)))
    return prepared.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id bigint, funnel_level int",
        stateStructType="bests array<bigint>, level int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
