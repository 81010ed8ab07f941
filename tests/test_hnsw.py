"""HNSW graph ANN: exactness proof config, production-config recall,
determinism, save/load, batch==single, shard-count invariance.

Reference capability: hnswlib cosine index
(/root/reference/pyw_hnswlib.py:61-69, vector_storage.py:43-56).
"""

from __future__ import annotations

import pytest

from newssearchengine_spark.operators import hnsw as H
from newssearchengine_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_tiny):
    df = spark.read.parquet(f"{sf_tiny}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def prod_graph(emb):
    g = H.hnsw_build(emb, n_shards=4, m=16, ef_construction=100).cache()
    g.count()
    return g


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_exact_config_matches_brute_force(emb):
    """M/efc/ef >= shard size -> complete layer-0 graph, exhaustive beam,
    exact result (the gate's hash-check invariant)."""
    g = H.hnsw_build(emb, n_shards=4, m=2048, ef_construction=2048)
    for qid in (0, 13, 250):
        got = rows(H.hnsw_knn(g, emb, qid, 10, ef=2048))
        want = rows(S.brute_force_knn(emb, qid, 10))
        assert got == want, qid


def test_exact_config_shard_count_invariant(emb):
    """In the exhaustive config the result is shard-count independent —
    the merge across shards is a true global top-k."""
    a = H.hnsw_build(emb, n_shards=1, m=2048, ef_construction=2048)
    b = H.hnsw_build(emb, n_shards=8, m=2048, ef_construction=2048)
    assert rows(H.hnsw_knn(a, emb, 7, 10, ef=2048)) == \
        rows(H.hnsw_knn(b, emb, 7, 10, ef=2048))


def test_production_config_recall(emb, prod_graph):
    """hnswlib-like parameters (M=16, ef=64): mean recall@10 over a
    query sample must be high — the quality bar the reference's ef=150
    setting exists for."""
    qids = [0, 7, 42, 99, 123, 250, 333, 444]
    got = H.hnsw_knn_many(prod_graph, emb, qids, 10, ef=64).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for q in qids:
        want = {r["vec_id"] for r in S.brute_force_knn(emb, q, 10).collect()}
        recalls.append(len(want & by_q[int(q)]) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_build_deterministic(emb):
    """Two independent builds are row-identical: splitmix64 levels +
    ascending-id insertion + id tie-breaks, no RNG anywhere."""
    a = H.hnsw_build(emb, n_shards=2, m=8, ef_construction=32)
    b = H.hnsw_build(emb, n_shards=2, m=8, ef_construction=32)
    ra = sorted(map(repr, a.collect()))
    rb = sorted(map(repr, b.collect()))
    assert ra == rb


def test_save_load_roundtrip(emb, prod_graph, tmp_path):
    path = str(tmp_path / "hnsw_idx")
    H.hnsw_save(prod_graph, path, m=16, ef_construction=100, n_shards=4)
    loaded, params = H.hnsw_load(emb.sparkSession, path)
    assert params == {"m": 16, "ef_construction": 100, "n_shards": 4}
    assert rows(H.hnsw_knn(loaded, emb, 42, 10, ef=64)) == \
        rows(H.hnsw_knn(prod_graph, emb, 42, 10, ef=64))


def test_batch_equals_single(emb, prod_graph):
    many = H.hnsw_knn_many(prod_graph, emb, [0, 7, 42], 10, ef=64).collect()
    for q in (0, 7, 42):
        one = rows(H.hnsw_knn(prod_graph, emb, q, 10, ef=64))
        sub = sorted((r["rank"], r["vec_id"], r["cos"])
                     for r in many if r["query_id"] == q)
        assert sub == one, q


def test_incremental_add_exact_config(emb):
    """hnsw_add(build(A), B) answers queries over A ∪ B exactly in the
    exhaustive config — the add_items / incremental-index parity."""
    old = emb.filter("vec_id < 400")
    new = emb.filter("vec_id >= 400")
    g = H.hnsw_build(old, n_shards=4, m=2048, ef_construction=2048)
    grown = H.hnsw_add(g, new, n_shards=4, m=2048, ef_construction=2048)
    for qid in (0, 450):
        got = rows(H.hnsw_knn(grown, emb, qid, 10, ef=2048))
        want = rows(S.brute_force_knn(emb, qid, 10))
        assert got == want, qid


def test_incremental_add_production_recall(emb):
    old = emb.filter("vec_id < 400")
    new = emb.filter("vec_id >= 400")
    g = H.hnsw_build(old, n_shards=4, m=16, ef_construction=100)
    grown = H.hnsw_add(g, new, n_shards=4, m=16, ef_construction=100)
    # new vectors are reachable and recall over the union stays high
    hits = 0
    for q in (0, 42, 411, 499):
        want = {r["vec_id"] for r in S.brute_force_knn(emb, q, 10).collect()}
        got = {r["vec_id"]
               for r in H.hnsw_knn(grown, emb, q, 10, ef=64).collect()}
        hits += len(want & got)
    assert hits / 40 >= 0.9


def test_incremental_add_rejects_duplicates(emb):
    g = H.hnsw_build(emb.filter("vec_id < 100"), n_shards=2, m=8,
                     ef_construction=32)
    with pytest.raises(Exception, match="already indexed"):
        H.hnsw_add(g, emb.filter("vec_id < 8"), n_shards=2, m=8,
                   ef_construction=32).count()


def test_incremental_add_passthrough_untouched_shards(emb):
    """Shards that receive no new vectors pass through row-identical —
    only touched shards pay any build cost."""
    g = H.hnsw_build(emb.filter("vec_id < 400"), n_shards=4, m=8,
                     ef_construction=32)
    # vec_id 401: 401 % 4 == 1 -> only shard 1 grows
    grown = H.hnsw_add(g, emb.filter("vec_id = 401"), n_shards=4, m=8,
                       ef_construction=32)
    before = sorted(map(repr, g.filter("shard <> 1").collect()))
    after = sorted(map(repr, grown.filter("shard <> 1").collect()))
    assert before == after


def test_reference_shape_dim768(spark):
    """The reference's exact operating point: dim=768 vectors
    (vector_storage.py:15), M=100, ef_construction=100, ef=150
    (pyw_hnswlib.py:9-16). Deterministic synthetic vectors; recall@10
    vs brute force at the reference's ef must be high."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, dim = 200, 768
    vecs = rng.standard_normal((n, dim)).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>")
    g = H.hnsw_build(emb, n_shards=2, m=100, ef_construction=100)
    got = {r["vec_id"] for r in H.hnsw_knn(g, emb, 0, 10, ef=150).collect()}
    want = {r["vec_id"] for r in S.brute_force_knn(emb, 0, 10).collect()}
    assert len(got & want) / 10 >= 0.9


def test_absent_query_id_returns_typed_empty(emb, prod_graph):
    res = H.hnsw_knn_many(prod_graph, emb, [10**9], 10, ef=64)
    assert res.count() == 0
    assert res.columns == ["query_id", "rank", "vec_id", "cos"]
