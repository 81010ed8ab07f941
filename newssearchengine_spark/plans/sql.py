"""SQL sugar: `bm25_match(...)` / `phrase_match(...)` table functions.

The last ergonomic gap between "library" and "engine" (SURVEY §4.3
deferred it from v1): letting a user write

    SELECT m.doc_id, m.score, d.sha256
    FROM bm25_match('hash table merge', 10) m
    JOIN doc_store d ON m.doc_id = d.doc_id
    ORDER BY m.rank

the way they would against a search-enabled SQL engine, instead of
stitching DataFrames in Python. The reference gets this surface from ES's
query DSL (es.search bodies, /root/reference/wapo/experiments/
ranking.py:117-137); plans/dsl.py adapts those bodies — this module is
the equivalent for SQL text.

Mechanics (and their honest limits): pure PySpark cannot register a
Catalyst table-valued function — that requires JVM extension points — and
a Python UDTF cannot launch distributed jobs from inside an executor. So
this is a string-level pre-parser: each `<fn>('<query>'[, k])` table
reference is evaluated through SegmentIndex on the driver (one Spark job,
the same path every other caller uses), registered as a session temp
view, and the SQL text is rewritten to name the view before spark.sql
runs it. The result DataFrame composes with the whole session catalog
(joins, CTEs, windows). Match results are therefore materialized eagerly
per distinct (fn, query, k) — exactly like the Python API the views wrap.

Supported table functions:
  bm25_match('<free text>'[, k])    OR-disjunction BM25 top-k
                                    (rank, doc_id, score)
  phrase_match('<free text>'[, k])  exact-phrase BM25 top-k over the
                                    positional sidecar, same schema
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

from .search import SegmentIndex

_TVF_RE = re.compile(
    r"\b(bm25_match|phrase_match)\s*\(\s*'([^']*)'\s*(?:,\s*(\d+)\s*)?\)",
    re.IGNORECASE,
)


class SqlEngine:
    """SQL front door over one SegmentIndex.

    >>> eng = SqlEngine(spark, si)
    >>> eng.register_doc_store()
    >>> eng.sql("SELECT * FROM bm25_match('hash table', 5)").show()
    """

    def __init__(self, spark: SparkSession, index: SegmentIndex, *,
                 default_k: int = 10, mode: str = "taat"):
        self.spark = spark
        self.index = index
        self.default_k = default_k
        self.mode = mode
        self._views: set[str] = set()

    def register_doc_store(self, name: str = "doc_store") -> None:
        """Expose the index's doc store as a temp view so match results
        can join document metadata in plain SQL."""
        self.index.doc_store().createOrReplaceTempView(name)

    def _materialize(self, fn: str, qtext: str, k: int) -> str:
        # The key must carry the INDEX identity: temp views are
        # session-global, so two SqlEngine instances over different
        # indexes issuing the same query text would otherwise clobber
        # each other's _match_* view and silently cross-serve results.
        # index_dir distinguishes persisted indexes; id(self.index)
        # distinguishes in-memory ones (and a rebuilt SegmentIndex
        # object over the same dir gets a fresh key).
        ident = f"{getattr(self.index, 'index_dir', '')}#{id(self.index)}"
        key = hashlib.md5(
            f"{ident}|{fn}|{qtext}|{k}|{self.mode}".encode()
        ).hexdigest()[:12]
        view = f"_match_{key}"
        if view not in self._views:
            if fn == "bm25_match":
                df = self.index.search(qtext, k, mode=self.mode)
            else:  # phrase_match
                terms = self.index.analyze_query(qtext)
                df = self.index.search_phrase(terms, k)
            df.createOrReplaceTempView(view)
            self._views.add(view)
        return view

    def sql(self, query: str) -> DataFrame:
        """Run SQL text that may reference the match table functions."""
        def repl(m: re.Match) -> str:
            fn = m.group(1).lower()
            k = int(m.group(3)) if m.group(3) else self.default_k
            return self._materialize(fn, m.group(2), k)

        return self.spark.sql(_TVF_RE.sub(repl, query))

    def clear(self) -> None:
        """Drop the materialized match views (session hygiene)."""
        for v in self._views:
            self.spark.catalog.dropTempView(v)
        self._views.clear()
