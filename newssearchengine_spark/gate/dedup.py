"""Gate entries for the dedup operator family.

The documents table has no natural duplicates, so each entry augments the
corpus in-query with deterministic clones (exact or near) — the SAME
augmentation in the Spark query and the DuckDB oracle — so the operators
produce non-trivial output to verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from .registry import gate_query, load

_AUG_EXACT_SQL = """aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
)"""

_AUG_NEAR_SQL = """aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' zzextra zzmore zztail' AS text
  FROM documents WHERE doc_id % 7 = 0
)"""

# normalized + 1-based shingling in DuckDB (mirror of operators/dedup.py)
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"
_SHINGLES_SQL = f"""shing AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len({_TOKS_SQL}) >= 3 THEN
             list_transform(generate_series(1, len({_TOKS_SQL}) - 2),
                            i -> {_TOKS_SQL}[i] || ' ' || {_TOKS_SQL}[i+1] || ' ' || {_TOKS_SQL}[i+2])
           ELSE [] END) AS shingles
  FROM aug
), shing_ne AS (SELECT * FROM shing WHERE len(shingles) > 0)"""


def _aug_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return d.unionByName(clones)


def _aug_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzextra zzmore zztail")).alias("text"),
    )
    return d.unionByName(clones)


@gate_query(
    "dd_exact",
    f"""WITH {_AUG_EXACT_SQL}
SELECT md5({_NORM_SQL}) AS content_hash,
       min(doc_id) AS keep_id,
       count(*)::BIGINT AS n_dupes,
       array_to_string(list(doc_id ORDER BY doc_id), ',') AS dupe_ids
FROM aug GROUP BY 1 HAVING count(*) >= 2""",
)
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.exact_dedup(_aug_exact(spark, sf_dir))
    return out.withColumn("dupe_ids", F.concat_ws(",", F.col("dupe_ids")))


def _minhash_sql() -> str:
    n, bands = D.N_MINHASH, D.LSH_BANDS
    p = D.MINHASH_PRIME
    rpb = n // bands
    base = f"list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {p})"
    sig_cols = ", ".join(
        f"list_min(list_transform({base}, h -> (h * {a} + {b}) % {p})) AS sig{i}"
        for i, (a, b) in enumerate(D.minhash_params(n))
    )
    sep = " || '|' || "
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5({sep.join(f'sig{b * rpb + r}' for r in range(rpb))}) AS band_hash "
        "FROM sigs"
        for b in range(bands)
    )
    return f"""WITH {_AUG_NEAR_SQL},
{_SHINGLES_SQL},
sigs AS (SELECT doc_id, {sig_cols} FROM shing_ne),
banded AS ({band_rows})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id"""


@gate_query("dd_minhash_lsh", _minhash_sql())
def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(_aug_near(spark, sf_dir))


@gate_query(
    "dd_ngram_jaccard",
    f"""WITH {_AUG_NEAR_SQL},
{_SHINGLES_SQL},
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM shing_ne),
sizes AS (SELECT doc_id, len(shingles)::BIGINT AS n_sh FROM shing_ne),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5""",
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(_aug_near(spark, sf_dir), threshold=0.5)


_EMB_THRESHOLD = 0.9
_EMB_CELLS = 16


@gate_query(
    "dd_embedding_cosine",
    f"""WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
  WHERE vec_id % 9 = 0
),
cents AS (
  SELECT vec_id AS cell, embedding::DOUBLE[] AS cvec FROM aug
  WHERE vec_id < {_EMB_CELLS}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT a.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], c.cvec), 9) DESC,
                      c.cell ASC) AS rn
    FROM aug a, cents c
  ) WHERE rn = 1
),
v AS (
  SELECT a.vec_id, a.embedding::DOUBLE[] AS v, s.cell
  FROM aug a JOIN assign s USING (vec_id)
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_EMB_THRESHOLD}""",
)
def dd_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, IVF-bucketed (clones injected
    in-query so the operator has non-trivial output to verify)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return D.embedding_near_dup_pairs(
        emb.unionByName(clones), threshold=_EMB_THRESHOLD, n_cells=_EMB_CELLS
    )


def _simhash_sql() -> str:
    bits = D.SIMHASH_BITS
    return f"""WITH aug AS (SELECT doc_id, text FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM aug
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
votes AS (
  SELECT doc_id, j.bit,
         sum(CASE WHEN substr(md5(term), j.bit + 1, 1) IN
                       ('8','9','a','b','c','d','e','f')
                  THEN tf ELSE -tf END) AS v
  FROM tf, (SELECT unnest(generate_series(0, {bits - 1})) AS bit) j
  GROUP BY 1, 2
)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id"""


@gate_query("dd_simhash", _simhash_sql())
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load(spark, sf_dir, "documents"))


# --- benchmark decontamination: n-gram membership vs a benchmark set ----
_CONTAM_N = 8
_CONTAM_BENCH = 16  # doc_id < 16 plays the benchmark suite


def _contamination_sql(n: int, bench: int) -> str:
    from .fulltext import _STOP_SQL

    return f"""WITH karr AS (
  SELECT doc_id,
         list_filter(
           string_split_regex(lower(
             regexp_replace(regexp_replace(text,
                 '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
                 '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')),
             '[^a-z0-9]+'),
           t -> length(t) >= 2 AND regexp_full_match(t, '[a-z][a-z0-9]*')
                AND t NOT IN ({_STOP_SQL})) AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= {n} THEN
           list_transform(range(1, len(toks) - {n} + 2),
             i -> array_to_string(list_slice(toks, i, i + {n} - 1), ' '))
           ELSE [] END) AS gs
  FROM karr
),
bg AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < {bench}),
ex AS (SELECT doc_id, unnest(gs) AS g FROM grams),
hit AS (SELECT ex.doc_id, count(*)::BIGINT AS n_contaminated
        FROM ex JOIN bg USING (g) GROUP BY 1)
SELECT g.doc_id, len(g.gs)::BIGINT AS n_grams,
       coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
       round(CASE WHEN len(g.gs) > 0
                  THEN coalesce(h.n_contaminated, 0) / len(g.gs)::DOUBLE
                  ELSE 0.0 END, 6) AS contamination
FROM grams g LEFT JOIN hit h USING (doc_id)"""


@gate_query("dd_contamination", _contamination_sql(_CONTAM_N, _CONTAM_BENCH))
def dd_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (training-data hygiene): per-doc overlap
    with the benchmark set's analyzed 8-grams. Docs with doc_id < 16
    stand in for the benchmark suite — they are fully contaminated by
    construction (they ARE the benchmark), so the gate verifies both the
    membership join and the clean tail."""
    from .fulltext import DOCS_ANALYZER

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < _CONTAM_BENCH)
    return D.benchmark_contamination(
        docs, bench, n=_CONTAM_N, text_col="text", id_col="doc_id",
        analyzer=DOCS_ANALYZER,
    )
