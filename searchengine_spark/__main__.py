"""spark-submit entry point (north_rule: `spark-submit --py-files`).

Package the library and submit:

    cd <repo> && zip -r /tmp/engine.zip searchengine_spark
    spark-submit --py-files /tmp/engine.zip \
        searchengine_spark/__main__.py build \
        --pages /data/pages --work /data/index_work [--resume]

    spark-submit ... __main__.py search --work /data/index_work \
        --query "появление леопарда" --limit 10 [--strategy wand]

    spark-submit ... __main__.py gen --out /data/pages --docs 100000

On a cluster, master/executors come from spark-submit flags (--master,
--num-executors ...); locally the session defaults to the submitting
master. Replaces the reference's REST control plane
(controllers/ApiController.java:28-52) with batch jobs.

NB Cyrillic --query arguments require a UTF-8 locale for the spark-submit
JVM (`LANG=C.UTF-8 spark-submit ...`) — under the C locale Java replaces
non-ASCII argv bytes with '?' before Python sees them. `--query-file` is
the locale-proof alternative.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName(app).getOrCreate()


def cmd_build(args) -> None:
    from searchengine_spark.plans.api import SearchEngine

    spark = _spark("searchengine-build")
    eng = SearchEngine(spark, args.work)
    pages = spark.read.parquet(args.pages)
    report = eng.build_index(pages, resume=args.resume)
    print(json.dumps(report, ensure_ascii=False))


def _fix_argv_encoding(s: str | None) -> str | None:
    """spark-submit may launch Python under the C locale, where non-ASCII
    argv (Cyrillic queries) arrives surrogate-escaped; re-decode as UTF-8."""
    if s is None:
        return None
    try:
        return s.encode("utf-8", "surrogateescape").decode("utf-8")
    except UnicodeError:
        return s


def cmd_search(args) -> None:
    from searchengine_spark.plans.api import SearchEngine

    if args.query_file:
        with open(args.query_file, encoding="utf-8") as f:
            args.query = f.read().strip()
    args.query = _fix_argv_encoding(args.query)
    args.site = _fix_argv_encoding(args.site)
    spark = _spark("searchengine-search")
    eng = SearchEngine(spark, args.work)
    res = eng.search(args.query, limit=args.limit, offset=args.offset,
                     site=args.site, strategy=args.strategy,
                     with_snippets=not args.no_snippets)
    print(json.dumps(res, ensure_ascii=False))


def cmd_statistics(args) -> None:
    from searchengine_spark.plans.api import SearchEngine

    spark = _spark("searchengine-statistics")
    print(json.dumps(SearchEngine(spark, args.work).statistics(),
                     ensure_ascii=False))


def cmd_upsert(args) -> None:
    """C3 indexPage as a batch job: replace-by-url from a pages table of
    the changed/new documents (partition-scoped index maintenance)."""
    from searchengine_spark.plans.api import SearchEngine

    spark = _spark("searchengine-upsert")
    eng = SearchEngine(spark, args.work)
    report = eng.upsert_docs(spark.read.parquet(args.pages))
    print(json.dumps(report, ensure_ascii=False))


def cmd_remove(args) -> None:
    """S7/S8 as a batch job: cascade-delete a site or a single page."""
    from searchengine_spark.plans.api import SearchEngine

    spark = _spark("searchengine-remove")
    eng = SearchEngine(spark, args.work)
    if args.site is not None:
        report = eng.remove_site(_fix_argv_encoding(args.site))
    else:
        report = eng.remove_page(_fix_argv_encoding(args.url))
    print(json.dumps(report, ensure_ascii=False))


def cmd_vacuum(args) -> None:
    """Remove data files not referenced by the stage manifests (debris of
    an interrupted partition commit) — run before serving after a crash."""
    from searchengine_spark.sources.tableio import TableIO

    spark = _spark("searchengine-vacuum")
    io = TableIO(spark, args.work)
    removed = {t: io.vacuum(t)
               for t in ("docs", "postings", "terms", "blocks")}
    print(json.dumps({"removed_files": removed}))


def cmd_gen(args) -> None:
    from searchengine_spark.sources.corpus import gen_pages_spark

    spark = _spark("searchengine-gen")
    gen_pages_spark(spark, args.docs, seed=args.seed).write \
        .mode("overwrite").parquet(args.out)
    print(json.dumps({"written": args.docs, "path": args.out}))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="searchengine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index from a pages table")
    b.add_argument("--pages", required=True)
    b.add_argument("--work", required=True)
    b.add_argument("--resume", action="store_true",
                   help="skip stages whose checkpoint manifest is complete")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="run a query against a built index")
    s.add_argument("--work", required=True)
    s.add_argument("--query", default=None)
    s.add_argument("--query-file", default=None,
                   help="read the UTF-8 query from a file (locale-proof "
                        "alternative to --query under spark-submit)")
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--site", default=None)
    s.add_argument("--strategy",
                   choices=["exact", "wand", "driver", "auto"],
                   default="auto")
    s.add_argument("--no-snippets", action="store_true")
    s.set_defaults(fn=cmd_search)

    st = sub.add_parser("statistics", help="per-site index statistics")
    st.add_argument("--work", required=True)
    st.set_defaults(fn=cmd_statistics)

    u = sub.add_parser("upsert", help="incrementally (re)index changed pages")
    u.add_argument("--pages", required=True,
                   help="parquet table of changed/new pages (same schema)")
    u.add_argument("--work", required=True)
    u.set_defaults(fn=cmd_upsert)

    rm = sub.add_parser("remove", help="cascade-delete a site or one page")
    rm.add_argument("--work", required=True)
    grp = rm.add_mutually_exclusive_group(required=True)
    grp.add_argument("--site", default=None)
    grp.add_argument("--url", default=None)
    rm.set_defaults(fn=cmd_remove)

    vc = sub.add_parser("vacuum", help="drop unreferenced data files")
    vc.add_argument("--work", required=True)
    vc.set_defaults(fn=cmd_vacuum)

    g = sub.add_parser("gen", help="write a deterministic synthetic pages table")
    g.add_argument("--out", required=True)
    g.add_argument("--docs", type=int, default=10000)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
