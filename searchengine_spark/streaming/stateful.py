"""Custom stateful streaming operator: cross-batch first-occurrence
dedup via `applyInPandasWithState`.

The batch-side exact dedup (operators/dedup.py::exact_keep_first,
operators/curate.py) answers "which doc owns each distinct text" over a
finite corpus. An INGESTION pipeline needs the streaming form: as
micro-batches arrive, emit each distinct content signature's first
document and silently drop every later duplicate — across batches, with
the seen-set surviving restarts. Spark's built-in `dropDuplicates` on a
stream keeps unbounded state and emits the first arrival per trigger
order; this operator additionally (a) makes the keep-first choice
deterministic INSIDE a batch (min doc_id, matching the batch operators'
keep-first contract), (b) tracks per-signature duplicate counts in the
state for telemetry, and (c) offers a processing-time TTL so state is
bounded when the dedup horizon can be finite (the documented trade-off:
a duplicate arriving after the TTL re-emits).

State model (per signature key):
  (first_doc_id long, n_dups long)  — tiny and fixed-width; the text
  itself is never stored in state, only its md5 signature is the key.

Scale shape: the signature groupBy is the stream's one shuffle; state
is partitioned by the same key, so each executor owns a disjoint
signature range (RocksDB/HDFS state store at production scale). The
emitted frame is exactly the novel documents of each batch.

Reference context: the reference engine dedups at the URL level inside
its crawl (SURVEY.md §2 J6); content-signature streaming dedup is the
pipeline-side generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

OUT_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("sig", StringType(), False),
    StructField("text", StringType(), True),
])
STATE_SCHEMA = StructType([
    StructField("first_doc_id", LongType(), False),
    StructField("n_dups", LongType(), False),
])


def _dedup_first_fn(ttl_ms: int | None):
    """Builds the per-key stateful function. A key (signature) group
    yields its min-doc_id row the FIRST time the key is ever seen and
    nothing afterwards; state counts suppressed duplicates."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # TTL horizon passed with no new arrivals: evict. A later
            # duplicate will re-emit — the documented bounded-state trade.
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if state.exists:
            first_id, n_dups = state.get
            state.update((int(first_id), int(n_dups) + len(rows)))
            return
        keep = rows.loc[rows["doc_id"].idxmin()]
        state.update((int(keep["doc_id"]), int(len(rows) - 1)))
        yield pd.DataFrame({"doc_id": [int(keep["doc_id"])],
                            "sig": [key[0]],
                            "text": [keep["text"]]})

    return fn


ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


def rocksdb_state_conf(spark=None) -> dict[str, str]:
    """Session conf routing streaming state to the RocksDB provider —
    REQUIRED at production scale for streaming_dedup_first: the default
    HDFS-backed store keeps every version of the state map on the
    executor HEAP, and a web-scale seen-set is ~10^9 signatures × ~64 B
    of (key md5 + first_doc_id + n_dups + store overhead) ≈ 64 GB per
    full corpus — RocksDB keeps it on local SSD with a bounded block
    cache and incremental checkpoint uploads, so state size is bounded
    by disk, not heap. Pass spark to apply in place (affects queries
    STARTED afterwards; set before .start()), or merge the returned dict
    into SparkSession.builder configs."""
    conf = {"spark.sql.streaming.stateStore.providerClass":
            ROCKSDB_PROVIDER}
    if spark is not None:
        for k, v in conf.items():
            spark.conf.set(k, v)
    return conf


def streaming_dedup_first(stream: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          ttl_minutes: int | None = None) -> DataFrame:
    """(doc_id, sig, text) — the first document ever seen for each
    distinct content signature, across micro-batches. Duplicates (same
    md5(text), any later batch or later row of the same batch) are
    dropped; within one batch the kept row is the min doc_id
    (deterministic, matching exact_keep_first). ttl_minutes bounds state
    by evicting signatures idle longer than the TTL.

    Run with outputMode("update") — the operator declares update output
    (it emits a key's row once, when first seen); starting the query
    with append raises an AnalysisException by Spark's stateful-operator
    rules. The checkpoint persists the seen-set across restarts. At
    production scale start the query under rocksdb_state_conf() (above)
    so the per-signature seen-set lives on executor disk, not heap."""
    ttl_ms = None
    timeout = GroupStateTimeout.NoTimeout
    if ttl_minutes is not None:
        ttl_ms = int(ttl_minutes) * 60_000
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    keyed = (stream.select(F.col(id_col).alias("doc_id"),
                           F.md5(F.col(text_col)).alias("sig"),
                           F.col(text_col).alias("text"))
             .groupBy("sig"))
    return keyed.applyInPandasWithState(
        _dedup_first_fn(ttl_ms), OUT_SCHEMA, STATE_SCHEMA,
        "update", timeout)
