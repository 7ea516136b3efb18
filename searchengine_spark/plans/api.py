"""Public engine facade — the Spark-native equivalents of the reference's
five REST endpoints (controllers/ApiController.java:28-52):

  C1 startIndexing  -> SearchEngine.build_index(pages_df)
  C2 stopIndexing   -> job cancellation + manifest marks (resume per stage)
  C3 indexPage      -> SearchEngine.upsert_docs(changed_pages_df)
  C4 search         -> SearchEngine.search(query, limit, offset, site)
  C5 statistics     -> SearchEngine.statistics()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig
from ..sources.tableio import TableIO
from .build import IndexBuilder
from .query import QueryEngine
from .statistics import statistics as _statistics


class SearchEngine:
    def __init__(self, spark: SparkSession, work_dir: str,
                 cfg: EngineConfig | None = None):
        from ..sources.deploy import ship_package

        ship_package(spark)  # --py-files equivalent for driver-launched runs
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.io = TableIO(spark, work_dir)
        self._query_engine: QueryEngine | None = None

    # --- build (C1) ------------------------------------------------------

    def build_index(self, pages: DataFrame, resume: bool = False) -> dict:
        report = IndexBuilder(self.spark, self.io, self.cfg).build(pages, resume=resume)
        self._query_engine = None  # stats changed; rebuild lazily
        return report

    # --- query (C4) ------------------------------------------------------

    @property
    def query_engine(self) -> QueryEngine:
        if self._query_engine is None:
            self._query_engine = QueryEngine(self.spark, self.io, self.cfg)
        return self._query_engine

    def warm(self) -> "SearchEngine":
        """Serving mode: pin query-side tables in executor memory."""
        self.query_engine.warm()
        return self

    def search(self, query: str, limit: int | None = None, offset: int = 0,
               site: str | None = None, relevance_mode: str = "bm25",
               with_snippets: bool = True, strategy: str = "exact",
               count_mode: str = "exact") -> dict:
        return self.query_engine.search(query, limit=limit, offset=offset,
                                        site=site, relevance_mode=relevance_mode,
                                        with_snippets=with_snippets,
                                        strategy=strategy, count_mode=count_mode)

    # --- statistics (C5) --------------------------------------------------

    def statistics(self) -> dict:
        return _statistics(self.io)

    # --- incremental maintenance (C3/S7/S8) -------------------------------

    def upsert_docs(self, changed_pages: DataFrame) -> dict:
        from ..streaming.incremental import upsert_docs
        report = upsert_docs(self.spark, self.io, self.cfg, changed_pages)
        self._query_engine = None
        return report

    def remove_site(self, site: str) -> dict:
        from ..streaming.incremental import remove_docs
        report = remove_docs(self.spark, self.io, self.cfg, site=site)
        self._query_engine = None
        return report

    def remove_page(self, url: str) -> dict:
        from ..streaming.incremental import remove_docs
        report = remove_docs(self.spark, self.io, self.cfg, url=url)
        self._query_engine = None
        return report
