"""Deterministic, dense, cluster-reproducible doc-id assignment.

The reference relies on MySQL autoincrement PKs (model/Page.java:13-16) —
nondeterministic under parallel load. Delta-gap posting compression and
rank-identical tiebreaks both need ids that are dense and identical on every
run and cluster size, so we define:

    doc_id = position of url in the ordering  (bucket(url), url)
    bucket(url) = int(md5(url)[:8], 16) % n_buckets

Implementation: one hash-bucket shuffle + per-bucket window sort + a
driver-side prefix-sum over bucket counts (n_buckets scalars). No global
sort, no monotonically_increasing_id (partition-dependent), no collect of
data rows. Scales by raising n_buckets; each window group sorts one bucket.

Matches oracle.assign_doc_ids exactly (same md5 spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import url_bucket_col


def assign_doc_ids(docs: DataFrame, n_buckets: int = 8,
                   url_col: str = "url") -> DataFrame:
    """Add a dense deterministic `doc_id` column; preserves other columns."""
    with_bucket = docs.withColumn("_bucket", url_bucket_col(F.col(url_col), n_buckets))

    # driver-side prefix sums over n_buckets counters (tiny)
    counts = {r["_bucket"]: r["cnt"]
              for r in with_bucket.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)

    # map literal lookup: bucket -> offset
    mapping = F.create_map(*[x for b in range(n_buckets)
                             for x in (F.lit(b), F.lit(offsets[b]))])
    w = Window.partitionBy("_bucket").orderBy(F.col(url_col))
    return (with_bucket
            .withColumn("doc_id",
                        (F.row_number().over(w) - 1 + mapping[F.col("_bucket")])
                        .cast("long"))
            .drop("_bucket"))
