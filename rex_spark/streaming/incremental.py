"""Incremental ingest via Structured Streaming (SURVEY §2.9).

The reference has no event-time streaming (its StreamReadDataset,
rex/data/dataset.py:59-93, is a lazy iterator = mapPartitions
semantics); the batch pipeline is primary.  This module is the
optional incremental path: new page files landing in a directory are
picked up by ``readStream``, run through the SAME batch stage
functions inside ``foreachBatch``, and appended to the same output
tables — one code path for the transforms, two drivers (batch rerun vs
micro-batch).

Scale notes: ``maxFilesPerTrigger`` bounds micro-batch size; the
``warc_ts`` watermark bounds state for the windowed aggregation; all
heavy lifting stays in the batch operators, so everything said about
their partitioning/skew behavior applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import document_triple_set, extract_triples_fused
from ..operators.textplane import PAGES_SCHEMA, clean_pages, segment_sentences


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Streaming source over a directory of pages parquet files
    (the sandbox stand-in for an Iceberg incremental-read stream)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def stream_warc_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Streaming source over a GROWING crawl directory of raw
    *.warc(.gz) files: binaryFile file stream -> io/warc record
    fan-out inside the Arrow batch -> PAGES_SCHEMA rows (text/lang
    null — a raw dump has neither; the pipeline recomputes).  New
    crawl files landing in ``path`` become micro-batches, so the
    same exactly-once foreachBatch pipeline that consumes the parquet
    stream consumes the crawl as it is written."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from ..io.warc import iter_warc

    bin_schema = StructType(
        [
            StructField("path", StringType(), True),
            StructField("modificationTime", TimestampType(), True),
            StructField("length", LongType(), True),
            StructField("content", BinaryType(), True),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
        .select("content")
    )

    def expand(batches):
        CHUNK_ROWS = 2048
        rows = []
        for pdf in batches:
            for content in pdf["content"]:
                for url, ts, html in iter_warc(bytes(content)):
                    rows.append((url, ts, html, None, None))
                    if len(rows) >= CHUNK_ROWS:
                        yield pd.DataFrame(
                            rows, columns=[f.name for f in PAGES_SCHEMA.fields]
                        )
                        rows = []
        if rows:
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields]
            )

    return files.mapInPandas(expand, schema=PAGES_SCHEMA)


def incremental_triples(
    pages_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """pages stream -> triples appended to ``output_dir`` (parquet).

    foreachBatch reuses the batch operators verbatim; the streaming
    checkpoint gives exactly-once per micro-batch, which together with
    the deterministic transforms makes the output restart-idempotent —
    the streaming analog of the StageStore resume contract.

    Returns the StreamingQuery; with ``available_now`` the query drains
    everything currently in the directory and stops (use
    ``query.awaitTermination()``).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        triples = document_triple_set(
            extract_triples_fused(segment_sentences(clean_pages(batch_df)))
        )
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_neardup(
    pages_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    n: int = 3,
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Incremental MinHash-LSH near-dup detection inside foreachBatch
    against a persistent band-signature stage table (VERDICT r3 #8).

    Per micro-batch of pages (doc identity = xxhash64(url)):

    1. band signatures + shingle sets for the batch docs, with the
       SAME kernels as the batch ``minhash_lsh_pairs`` (band_rows /
       shingle_rows);
    2. candidates = batch band rows joined against the band table
       (previous batches + this one) on (band_id, band_key) — each
       pair is discovered exactly once, in the batch where its LATER
       member arrives, so new waves only pay for their own band keys,
       never a full-history self-join;
    3. exact-Jaccard verify against the persistent shingle table
       (verify_jaccard_pairs), pairs appended to ``pairs``.

    State tables live under ``state_root`` (bands/, shingles/,
    pairs/), each row stamped with batch_id; every write is guarded by
    its own batch_id-presence check and the transforms are
    deterministic, so a replayed micro-batch is a no-op — the same
    exactly-once argument as incremental_triples, extended to stateful
    joins.  After all waves, the union of appended pairs equals the
    batch ``minhash_lsh_pairs`` over the full corpus (pinned by
    tests/test_streaming.py and tools/stream_soak.py).

    Scale notes: the band table grows O(docs x bands) with fixed-width
    rows; on an Iceberg deployment it is bucketed by band_key so the
    per-wave candidate join co-locates without a full shuffle of
    history.  Assumes each url is ingested in exactly one micro-batch
    (file-drop / log-stream semantics — same assumption as
    running_surface_state's doc counting).
    """
    import os

    from ..operators.dedup import band_rows, shingle_rows, verify_jaccard_pairs

    # A crash mid-compaction can leave a table dir absent with its
    # .pre-compact sibling holding the state; running on the bare
    # directory would silently rebuild history from this batch alone
    # and miss every old-vs-new pair.  Roll out of the window first.
    recover_compaction(state_root)

    bands_dir = os.path.join(state_root, "bands")
    sh_dir = os.path.join(state_root, "shingles")
    pairs_dir = os.path.join(state_root, "pairs")

    def _docs(batch_df: DataFrame) -> DataFrame:
        return clean_pages(batch_df).select(
            F.xxhash64("url").alias("doc_id"),
            F.col("clean_text").alias("text"),
        )

    def _has_batch(spark: SparkSession, path: str, batch_id: int) -> bool:
        try:
            df = spark.read.parquet(path)
        except Exception:
            return False
        return df.where(F.col("batch_id") == batch_id).limit(1).count() > 0

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = _docs(batch_df)
        new_bands = band_rows(docs, n=n).localCheckpoint(eager=True)
        new_sh = shingle_rows(docs, n=n).localCheckpoint(eager=True)
        if not _has_batch(spark, bands_dir, batch_id):
            new_bands.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(bands_dir)
        if not _has_batch(spark, sh_dir, batch_id):
            new_sh.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sh_dir)
        if _has_batch(spark, pairs_dir, batch_id):
            return
        # history INCLUDING this batch's just-written rows: new-new
        # pairs meet table-side, new-old pairs meet exactly here
        history = spark.read.parquet(bands_dir).where(
            F.col("batch_id") <= batch_id
        )
        cand = (
            new_bands.alias("x")
            .join(history.alias("y"), ["band_id", "band_key"])
            .where(F.col("x.doc_id") != F.col("y.doc_id"))
            .select(
                F.least("x.doc_id", "y.doc_id").alias("a"),
                F.greatest("x.doc_id", "y.doc_id").alias("b"),
            )
            .dropDuplicates(["a", "b"])
        )
        # every candidate involves >= 1 doc from THIS batch (x side is
        # new), so a pair is only ever generated in its later member's
        # batch — no cross-batch duplicates to filter
        all_sh = spark.read.parquet(sh_dir).where(
            F.col("batch_id") <= batch_id
        ).select("doc_id", "sh")
        verified = verify_jaccard_pairs(cand, all_sh, threshold)
        verified.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(pairs_dir)

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_STATE_TABLES = ("bands", "shingles", "pairs")


def recover_compaction(state_root: str) -> dict:
    """Roll the near-dup state tables out of any crash window left by
    ``compact_neardup_state``'s two-rename swap.  Idempotent; safe to
    call between drains (and called automatically by both
    ``incremental_neardup`` and ``compact_neardup_state``).

    Per table ``t`` under ``state_root``:

    - ``t`` absent + ``t.pre-compact`` present: the crash hit between
      ``rename(t, t.pre-compact)`` and ``rename(t.compacting, t)`` —
      restore the pre-compact table.  The rewrite (even if it finished
      verifying) was never promoted, so it is discarded; re-running
      compaction recovers it.  Without this, the next drain's
      ``_has_batch`` would silently recreate the table from only the
      new batch, losing all band/shingle history.
    - ``t`` present + ``t.pre-compact`` present: the crash hit after
      the swap, before cleanup — the compacted table is live; the
      leftover is deleted.
    - a leftover ``t.compacting`` is always deleted (it is rebuilt
      from scratch by the next compaction).

    Either way the next reader sees exactly the OLD state or exactly
    the NEW state, never a mix.  Returns {table: action} for the
    tables that needed any action.
    """
    import os
    import shutil

    actions: dict[str, str] = {}
    for name in _STATE_TABLES:
        path = os.path.join(state_root, name)
        old = path + ".pre-compact"
        tmp = path + ".compacting"
        if os.path.isdir(old):
            if os.path.isdir(path):
                shutil.rmtree(old)
                actions[name] = "dropped-pre-compact"
            else:
                os.rename(old, path)
                actions[name] = "restored-pre-compact"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
            actions.setdefault(name, "dropped-compacting")
    return actions


def compact_neardup_state(
    spark: SparkSession, state_root: str, partitions: int | None = None
) -> dict:
    """Rewrite the near-dup state tables into few, join-key-clustered
    files — the Iceberg ``rewrite_data_files`` analog for this stage
    store.  Every drain appends one file set per micro-batch, so after
    thousands of waves the per-wave candidate join pays file-listing
    and tiny-file scan costs; compaction clusters ``bands`` on
    band_key (the join key), ``shingles`` on doc_id, ``pairs`` on
    (a, b).

    Row-preserving by construction: every row including ``batch_id``
    survives, so the ``_has_batch`` replay guards and the
    ``batch_id <= N`` history filters behave identically after
    compaction (pinned by tests/test_streaming.py — a post-compaction
    wave still yields exact batch parity and an idle re-drain still
    appends nothing).  The rewrite lands in a sibling directory, is
    row-count-verified, then swapped in with two renames — run it
    BETWEEN drains (no active query may hold the state open), the
    same maintenance window Iceberg compaction wants.  A crash
    anywhere in the swap is recoverable: ``recover_compaction`` (run
    on entry here and by ``incremental_neardup``) restores the
    pre-compact table if the promotion rename never happened, so the
    next drain always sees a complete state, old or new.

    Returns {table: (files_before, files_after)}.
    """
    import glob
    import os
    import shutil

    recover_compaction(state_root)

    layout = {
        "bands": ["band_key", "band_id"],
        "shingles": ["doc_id"],
        "pairs": ["a", "b"],
    }
    report = {}
    for name, keys in layout.items():
        path = os.path.join(state_root, name)
        if not os.path.isdir(path):
            continue
        before = len(glob.glob(os.path.join(path, "*.parquet")))
        # never "compact" into MORE files than exist: a table with few
        # appended files gets at most that many back
        n_parts = min(
            partitions or spark.sparkContext.defaultParallelism,
            max(before, 1),
        )
        df = spark.read.parquet(path)
        n_rows = df.count()
        tmp = path + ".compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            df.repartition(n_parts, keys[0])
            .sortWithinPartitions(*keys)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        if spark.read.parquet(tmp).count() != n_rows:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(f"compaction row-count mismatch for {name}")
        old = path + ".pre-compact"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        report[name] = (before, len(glob.glob(os.path.join(path, "*.parquet"))))
    return report


def running_surface_state(
    pages_stream: DataFrame,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per mention
    surface, a running (n_mentions, n_docs_seen, first_us, last_us)
    maintained across micro-batches — the incremental analog of the
    batch graph plane's surface_nodes frequency table, and the state a
    continuously-updating entity canonicalizer reads.

    The reference has no streaming analog (its datasets are static);
    this is the Spark-native design: per-key state lives in the state
    store (checkpointed, restart-safe), each micro-batch's mention rows
    fold into it, and the operator emits the UPDATED state row per key
    per batch (outputMode update).  State size is bounded by the
    surface vocabulary — the same gazetteer-bounded vs open-vocabulary
    trade documented for the batch canonicalizer.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..kernels.extractor import extract_mentions

    sentences = segment_sentences(clean_pages(pages_stream))

    def mention_batches(batches):
        for pdf in batches:
            rows = []
            for url, wts, tokens in zip(
                pdf["url"], pdf["warc_ts"], pdf["tokens"]
            ):
                us = int(pd.Timestamp(wts).value // 1000)
                for surface, _et, _s, _e in extract_mentions(list(tokens)):
                    rows.append((surface, url, us))
            yield pd.DataFrame(rows, columns=["surface", "url", "warc_us"])

    mentions = sentences.select("url", "warc_ts", "tokens").mapInPandas(
        mention_batches, schema="surface string, url string, warc_us long"
    )

    out_schema = (
        "surface string, n_mentions long, n_docs long, "
        "first_us long, last_us long"
    )
    state_schema = "n long, n_docs long, first_us long, last_us long"

    def fold(key, pdfs, state: GroupState):
        n_new, docs_new, lo, hi = 0, set(), None, None
        for pdf in pdfs:
            n_new += len(pdf)
            if len(pdf):
                docs_new.update(pdf["url"])
                bl, bh = int(pdf["warc_us"].min()), int(pdf["warc_us"].max())
                lo = bl if lo is None else min(lo, bl)
                hi = bh if hi is None else max(hi, bh)
        if state.exists:
            n0, d0, f0, l0 = state.get
        else:
            n0, d0, f0, l0 = 0, 0, None, None
        n = n0 + n_new
        # exact for a file-drop source: each url is ingested in exactly
        # one micro-batch, so per-batch distinct urls never double-count
        n_docs = d0 + len(docs_new)
        first = f0 if lo is None or (f0 is not None and f0 <= lo) else lo
        last = l0 if hi is None or (l0 is not None and l0 >= hi) else hi
        state.update((n, n_docs, first, last))
        yield pd.DataFrame(
            {
                "surface": [key[0]],
                "n_mentions": [n],
                "n_docs": [n_docs],
                "first_us": [first],
                "last_us": [last],
            }
        )

    return mentions.groupBy("surface").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def triple_counts_by_window(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed page/lang counts with late-data handling.

    ``warc_ts`` is the event time (SURVEY §1.3); the watermark bounds
    aggregation state — pages later than ``watermark`` behind the max
    observed warc_ts are dropped, everything else updates its window.
    """
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
