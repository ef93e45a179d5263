"""Streaming document ingestion: the training-data cleaning pipeline
as Structured Streaming.

The batch text surface (quality cascade → PII scrub → token stats →
fingerprint, all pure Catalyst expressions) is stateless, so the SAME
column expressions run unchanged on a stream — this module wires them
to a file-drop source and an idempotent keyed sink, mirroring the
bronze weather path (``ingest_stream.py``):

- source: JSON-lines file drops (one corpus shard per file = one
  micro-batch), the streaming analog of a crawler handing off shards;
- per-batch exact dedup on the content fingerprint (first-wins inside
  a batch — deterministic because the merge key orders replays);
- sink: ``foreachBatch`` + ``merge_upsert`` keyed by (source, doc_id) —
  the merge key includes the partition column, so the key always
  resolves inside the one partition the merge rewrites (a key that
  crossed partitions would leave stale rows in the untouched ones);
  replaying a shard is an observable no-op (exactly-once effect);
- cross-shard NEAR-dup dedup: corpus-wide MinHash state in the stream
  itself would grow unboundedly (the standard reason production
  pipelines split online-scrub from offline-dedup) — instead, pass
  ``lsh_index_prefix`` and each batch probes the PERSISTED bucketed
  LSH index (``operators.dedup.persist_lsh_index``) and appends its
  survivors back, so batch N+1 drops near-dups of everything ingested
  through batch N while stream-side state stays O(batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.text import (
    doc_fingerprint,
    quality_drop_reason,
    redact_pii,
    token_count,
)
from ..operators.upsert import merge_upsert

DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING"


def read_document_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-drop document source: JSON-lines shards."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )


def clean_documents(docs: DataFrame) -> DataFrame:
    """The stateless scrub chain — identical semantics batch or stream
    (pure per-row expressions, no shuffle): quality-filter, redact,
    annotate. Kept as a separate function so the batch path and tests
    share it with the stream."""
    return (
        docs.withColumn(
            "drop_reason", quality_drop_reason(F.col("text"), F.col("lang"))
        )
        .filter(F.col("drop_reason") == "kept")
        .drop("drop_reason")
        .withColumn("text", redact_pii(F.col("text")))
        .withColumn("n_tokens", token_count(F.col("text")).cast("long"))
        .withColumn("fingerprint", doc_fingerprint(F.col("text")))
    )


def stream_clean_documents(
    stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    lsh_index_prefix: str | None = None,
    near_threshold: float = 0.5,
    search_index_prefix: str | None = None,
) -> StreamingQuery:
    """document stream → scrub → per-batch fingerprint dedup →
    (optional) near-dup probe against a persisted LSH index →
    idempotent keyed upsert. Partitioned by source (the natural
    domain-shard at scale); the merge key is (source, doc_id) so the
    key prefix IS the partition key — merge_upsert prunes to touched
    partitions, and a key that didn't determine its partition could
    silently duplicate across them.

    ``lsh_index_prefix`` closes the cross-batch near-dup gap WITHOUT
    unbounded stream state: each micro-batch is probed against the
    bucketed index tables ``persist_lsh_index`` wrote (index-side:
    pre-hashed file reads, zero kernels, zero Exchange), survivors are
    upserted, and their bands/shingles are appended back to the index
    (``append_lsh_index``) so the NEXT batch sees them. Corpus-wide
    state lives in the index tables on disk — per-batch memory stays
    O(batch). Replayed batches skip the append via a batch-id marker
    under the checkpoint dir (and their docs, already indexed, probe as
    near-dups of themselves — the keyed upsert makes that a no-op, so
    the replay is output-idempotent end to end)."""
    import os

    from pyspark.sql import Window

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # per-batch exact dedup must pick a DETERMINISTIC survivor per
        # fingerprint (dropDuplicates keeps an arbitrary row): the
        # search-index replay guard relies on a crash-replayed batch
        # re-deriving the SAME survivor rows so its appended postings
        # are byte-identical — a replay that picked a different doc_id
        # for the same text would append distinct rows and shift df.
        rn = F.row_number().over(
            Window.partitionBy("fingerprint").orderBy("source", "doc_id")
        )
        cleaned = (
            clean_documents(batch)
            .withColumn("_rn", rn)
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if lsh_index_prefix is not None:
            from ..operators.dedup import probe_lsh_index

            cleaned = probe_lsh_index(
                cleaned, lsh_index_prefix, threshold=near_threshold
            )
        if lsh_index_prefix is not None or search_index_prefix is not None:
            # multiple consumers (upsert + index appends + emptiness
            # check) — pin the survivor set so the scrub/probe plan
            # doesn't re-execute per consumer
            cleaned = cleaned.localCheckpoint()
        merge_upsert(
            batch.sparkSession,
            out_path,
            cleaned.withColumn("batch_seq", F.lit(batch_id)),
            keys=["source", "doc_id"],
            order_col="batch_seq",
            partition_by=("source",),
        )
        if search_index_prefix is not None and not cleaned.isEmpty():
            from ..functions.text import append_search_index

            # the stream also maintains the RETRIEVAL index: survivors'
            # postings + a per-batch stats row. No marker needed — the
            # search index's content dedup makes replays exactly-once
            # on its own, PROVIDED the replayed survivor set is the
            # committed one. That is why this append runs BEFORE the
            # LSH append: only the LSH append changes what a replayed
            # probe returns, so up to this point a replay re-derives
            # the identical survivors and re-appends byte-identical
            # rows (deduped). A replay AFTER the LSH append committed
            # probes its own docs as near-dups → empty survivors → the
            # isEmpty guard SKIPS the append entirely (appending an
            # empty set would reuse the batch_id with different
            # content — (b{N}, 0, NULL) — violating the content-dedup
            # contract), so the committed postings stand untouched.
            append_search_index(
                cleaned.select("doc_id", "text"),
                search_index_prefix,
                batch_id=f"b{batch_id}",
            )
        if lsh_index_prefix is not None:
            from ..operators.dedup import append_lsh_index

            # the LSH append runs LAST: after the upsert (a crash
            # between the two replays as probe(drops pre-indexed docs)
            # → keyed upsert no-op — appending BEFORE the upsert would
            # instead drop the whole batch on replay with its rows
            # never landed) and after the search append (see above —
            # this append is the event that empties a replay's probe
            # result, so every consumer needing the committed survivor
            # set must have run by now). PER-TABLE batch-id markers
            # (inside append_lsh_index) guard each table's append
            # separately, so a crash between the bands and sets
            # appends replays only the missing table instead of
            # duplicating the committed one.
            append_lsh_index(
                cleaned.select("doc_id", "text"),
                lsh_index_prefix,
                marker_dir=os.path.join(checkpoint_dir, "_lsh_applied"),
                marker_key=str(batch_id),
            )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
