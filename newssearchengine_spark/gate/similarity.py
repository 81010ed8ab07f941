"""Gate entries for similarity search over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import hnsw as H
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


KMEANS_ITERS = 3


def _kmeans_ctes(n_cells: int, n_iters: int) -> str:
    """Unrolled seeded spherical-k-means CTE chain, iteration-identical to
    operators.similarity.kmeans_centroids: unit vectors, argmax-cosine
    assignment rounded 9dp (lowest cell on ties), per-dimension mean of
    assigned unit vectors ROUNDED 12dp (so the iteration state is
    bit-comparable across engines despite differing summation orders),
    empty cells keep their previous centroid.
    Exposes `cents` (final centroids) and `assign` (final assignment)."""
    parts = [f"""unitv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y)))) AS uv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cell, uv AS cvec FROM unitv WHERE vec_id < {n_cells})"""]
    for i in range(1, n_iters + 1):
        p = i - 1
        parts.append(f"""a{i} AS (
  SELECT vec_id, cell FROM (
    SELECT u.vec_id, c.cell,
           row_number() OVER (PARTITION BY u.vec_id
             ORDER BY round(list_cosine_similarity(u.uv, c.cvec), 9) DESC,
                      c.cell ASC) AS rn
    FROM unitv u, c{p} c
  ) WHERE rn = 1
),
e{i} AS (
  SELECT a.cell, unnest(range(len(u.uv))) AS dim, unnest(u.uv) AS x
  FROM unitv u JOIN a{i} a USING (vec_id)
),
g{i} AS (SELECT cell, dim, avg(x) AS m FROM e{i} GROUP BY 1, 2),
n{i} AS (SELECT cell, list_transform(list(m ORDER BY dim), x -> round(x, 12)) AS nv
         FROM g{i} GROUP BY cell),
c{i} AS (SELECT c.cell, coalesce(n.nv, c.cvec) AS cvec
         FROM c{p} c LEFT JOIN n{i} n USING (cell))""")
    parts.append(f"""cents AS (SELECT cell, cvec FROM c{n_iters}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 9) DESC,
                      c.cell ASC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
)""")
    return ",\n".join(parts)


_IVF_CTES = _kmeans_ctes(N_CELLS, KMEANS_ITERS)


@gate_query(
    "sim_ivf_assign",
    f"WITH {_IVF_CTES} SELECT vec_id, cell FROM assign",
)
def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment over deterministic seeded-k-means centroids
    (build-side of the ANN scale path). The oracle unrolls the identical
    Lloyd iterations in SQL."""
    return S.ivf_assign(load(spark, sf_dir, "embeddings"), N_CELLS,
                        kmeans_iters=KMEANS_ITERS)


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
    """IVF-Flat probe search over k-means centroids: exact within the
    nprobe nearest cells."""
    return S.ivf_knn(load(spark, sf_dir, "embeddings"), QUERY_ID, K,
                     n_cells=N_CELLS, nprobe=NPROBE,
                     kmeans_iters=KMEANS_ITERS)


@gate_query(
    "sim_hnsw_knn",
    f"""WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], q.qvec), 6) AS cos
  FROM embeddings, q WHERE vec_id <> {QUERY_ID}
)
SELECT (row_number() OVER (ORDER BY cos DESC, vec_id ASC) - 1)::BIGINT AS rank,
       vec_id, cos
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {K}""",
)
def sim_hnsw_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HNSW graph search (the reference's hnswlib
    capability, pyw_hnswlib.py:61-69) in its provably-exhaustive
    configuration: with M / ef_construction / ef >= the largest shard
    the layer-0 graph is complete and the ef-beam visits every node, so
    per-shard candidates are the whole corpus, the Catalyst re-score is
    exact, and the oracle is plain brute force — the hash check runs the
    REAL graph build + beam-search code end to end. Production
    parameters (M=16, ef=64) are pytest-pinned for recall and
    benchmarked (hnsw_* bench entries)."""
    emb = load(spark, sf_dir, "embeddings")
    g = H.hnsw_build(emb, n_shards=4, m=2048, ef_construction=2048)
    return H.hnsw_knn(g, emb, QUERY_ID, K, ef=2048)


@gate_query(
    "sim_ivf_adaptive",
    f"""WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], q.qvec), 6) AS cos
  FROM embeddings, q WHERE vec_id <> {QUERY_ID}
)
SELECT (row_number() OVER (ORDER BY cos DESC, vec_id ASC) - 1)::BIGINT AS rank,
       vec_id, cos
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {K}""",
)
def sim_ivf_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive EXACT IVF (triangle-inequality cell pruning, stop proof
    per ivf_knn_adaptive): probes cells best-bound-first and stops once
    no unprobed cell can reach the top k — so the oracle is plain brute
    force, and the hash check proves exactness THROUGH the pruned path
    (the engine's recall-1.0 answer to hnswlib's ef tradeoff)."""
    return S.ivf_knn_adaptive(load(spark, sf_dir, "embeddings"), QUERY_ID,
                              K, n_cells=N_CELLS,
                              kmeans_iters=KMEANS_ITERS)
