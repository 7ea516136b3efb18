"""Continuous indexing: a Structured Streaming front-end over the
engine's crash-safe incremental commit protocol.

The reference refreshes its index by re-crawling on demand
(controllers/ApiController.java startIndexing); the streaming-native
equivalent is a `readStream` file source watching a drop directory of
page-batch parquet files, with each micro-batch applied through
`SearchEngine.upsert_docs` (streaming/incremental.py) inside
`foreachBatch`.

Delivery semantics: the file source + checkpoint give at-least-once
micro-batch delivery; `upsert_docs` is idempotent by url (replace-by-url
with stable doc_ids), so a replayed batch after a crash converges to the
same table state — effectively exactly-once at the index level, without
a transactional sink. The serving gate (plans/query.py) keeps queries on
the last fully-committed snapshot while a batch is mid-flight.

Scale shape: each micro-batch pays only bucket-scoped work (the touched
url/term buckets), so steady-state cost tracks batch size, not index
size; the stream's state is only the file-source log."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery

from ..sources.corpus import pages_schema


def stream_index(engine, source_dir: str, checkpoint_dir: str,
                 schema=None, available_now: bool = False,
                 processing_time: str | None = None,
                 max_files_per_trigger: int | None = None) -> StreamingQuery:
    """Start (and return) a streaming query that indexes every page-batch
    parquet file dropped into `source_dir`. `available_now=True` drains
    the backlog and stops (the batch-catchup trigger); otherwise pass
    `processing_time` (e.g. "30 seconds") for a long-lived stream."""
    reader = engine.spark.readStream.schema(schema or pages_schema())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.upsert_docs(batch_df)

    writer = (src.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
