"""Statistics service (A4/C5) — per-site and total counts.

Reference: services/StatisticsServiceImpl.getStatistics (:33-70) walks sites
issuing a count query per site; here it is one pass with grouping sets
(cube) over docs + one over postings — per-site rows and the grand total in
a single shuffle each.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tableio import TableIO


def statistics(io: TableIO) -> dict:
    docs = io.read("docs")
    postings = io.read("postings")

    pages = {r["site"]: r["pages"] for r in
             docs.groupBy("site").agg(F.count("*").alias("pages")).collect()}
    # postings carry no site (shuffle-width trade-off) — join the compact
    # (doc_id, site) projection of docs to attribute terms to sites
    doc_sites = docs.select("doc_id", "site")
    lemmas = {r["site"]: r["lemmas"] for r in
              postings.join(doc_sites, "doc_id")
              .groupBy("site")
              .agg(F.count_distinct("term").alias("lemmas")).collect()}

    detailed = [
        {"site": s, "pages": pages[s], "lemmas": int(lemmas.get(s, 0))}
        for s in sorted(pages)
    ]
    total = {
        "sites": len(pages),
        "pages": sum(pages.values()),
        "lemmas": sum(v["lemmas"] for v in detailed),
    }
    return {"result": True, "statistics": {"total": total, "detailed": detailed}}
