"""newssearchengine_spark — a from-scratch PySpark-native full-text analytics engine.

Re-implements, Spark-first, the query/data-processing capabilities that the
reference repo (DucAnhPhi/NewsSearchEngine, read-only at /root/reference)
delegates to Elasticsearch/Lucene and hnswlib:

- code-aware analyzer (tokenize/normalize) — vectorized, no per-row Python
  (reference analyzer declared at wapo/index_es.py:65-91)
- inverted-index build: per-bucket sorted posting lists, delta + varbyte
  compressed docID/tf blocks with block-max metadata, lineage manifests,
  resumable (the structure Lucene builds inside ES for wapo/index_es.py:93-114)
- Okapi BM25 (k1=1.2, b=0.75) top-k query with block-max WAND pruning
  (the engine behind every es.search(size=k), e.g. wapo/experiments/ranking.py:128-139)
- the reference's relational operator surface (joins, aggregations, windows,
  set ops — SURVEY.md §2) expressed as Catalyst-native DataFrame ops
- training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search (brute-force + IVF), text analysis,
  multimodal column plumbing
"""

__version__ = "0.1.0"
