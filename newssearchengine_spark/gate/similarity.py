"""Gate entries for similarity search over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity as S
from .registry import gate_query, load

QUERY_ID = 0
K = 10
N_CELLS = 16
NPROBE = 2

_COS = "list_cosine_similarity({a}, {b})"


@gate_query(
    "sim_knn_bruteforce",
    f"""WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], q.qvec), 6) AS cos
  FROM embeddings, q WHERE vec_id <> {QUERY_ID}
)
SELECT (row_number() OVER (ORDER BY cos DESC, vec_id ASC) - 1)::BIGINT AS rank,
       vec_id, cos
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {K}""",
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k (the hnswlib capability, vector_storage.py:43-56,
    done as a Catalyst scan + fold — no Python in the hot path)."""
    return S.brute_force_knn(load(spark, sf_dir, "embeddings"), QUERY_ID, K)


_IVF_CTES = f"""cents AS (
  SELECT vec_id AS cell, embedding::DOUBLE[] AS cvec FROM embeddings
  WHERE vec_id < {N_CELLS}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 9) DESC,
                      c.cell ASC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
)"""


@gate_query(
    "sim_ivf_assign",
    f"WITH {_IVF_CTES} SELECT vec_id, cell FROM assign",
)
def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment (build-side of the ANN scale path)."""
    return S.ivf_assign(load(spark, sf_dir, "embeddings"), N_CELLS)


@gate_query(
    "sim_ivf_knn",
    f"""WITH {_IVF_CTES},
q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
probe AS (
  SELECT cell FROM cents, q
  ORDER BY round(list_cosine_similarity(cvec, q.qvec), 9) DESC, cell ASC
  LIMIT {NPROBE}
),
cand AS (
  SELECT a.vec_id FROM assign a JOIN probe USING (cell)
  WHERE a.vec_id <> {QUERY_ID}
),
scored AS (
  SELECT e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 6) AS cos
  FROM embeddings e JOIN cand USING (vec_id), q
)
SELECT (row_number() OVER (ORDER BY cos DESC, vec_id ASC) - 1)::BIGINT AS rank,
       vec_id, cos
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {K}""",
)
def sim_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat probe search: exact within the nprobe nearest cells."""
    return S.ivf_knn(load(spark, sf_dir, "embeddings"), QUERY_ID, K,
                     n_cells=N_CELLS, nprobe=NPROBE)
