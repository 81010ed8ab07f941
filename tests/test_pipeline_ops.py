"""Training-data pipeline operators: dedup, similarity, text, multimodal,
streaming — unit-level checks against hand-computed / numpy references
(the DuckDB cross-check runs in the driver gate; these pin semantics)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from newssearchengine_spark.operators import dedup as D
from newssearchengine_spark.operators import multimodal as M
from newssearchengine_spark.operators import similarity as S
from newssearchengine_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "Der Hund ist nicht ein Katze und das ist gut"),
        (6, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = D.exact_dedup(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["keep_id"] == 1 and g["n_dupes"] == 2 and list(g["dupe_ids"]) == [1, 2]


def test_minhash_identical_docs_always_pair(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs            # identical => identical signatures
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_ngram_jaccard_exact_value(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    # doc1: 7 shingles, doc3: 8 shingles, 6 shared => 6/9
    assert pairs[(1, 3)] == pytest.approx(round(6 / 9, 6), abs=1e-6)


def test_simhash_properties(docs):
    fp = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert fp[1] == fp[2]                       # identical text
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(fp[1], fp[3]) <= ham(fp[1], fp[4])  # near-dup closer than random
    assert all(0 <= v < (1 << D.SIMHASH_BITS) for v in fp.values())


@pytest.fixture(scope="module")
def emb(spark, sf_tiny):
    return spark.read.parquet(f"{sf_tiny}/embeddings.parquet").persist()


def test_brute_force_knn_matches_numpy(emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = sorted(
        ((vid, round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6))
         for vid, v in vecs.items() if vid != 0),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = S.brute_force_knn(emb, 0, 10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (vid, pytest.approx(c, abs=2e-6)) for vid, c in sims
    ]


def test_ivf_results_are_exact_within_probed_cells(emb):
    got = S.ivf_knn(emb, 0, 10, n_cells=16, nprobe=2).collect()
    assert len(got) == 10
    brute = {r["vec_id"]: r["cos"]
             for r in S.brute_force_knn(emb, 0, 500).collect()}
    for r in got:  # every ivf hit carries its exact cosine
        assert r["cos"] == pytest.approx(brute[r["vec_id"]], abs=1e-6)
    # recall sanity: probing 2/16 cells must find a decent chunk of top-10
    top10 = set(list(brute)[:10])
    assert len(top10 & {r["vec_id"] for r in got}) >= 3


def test_kmeans_ivf_driver_route_equals_distributed(emb, monkeypatch):
    """The small-N driver regime (numpy sequential folds + HALF_UP
    rounding) must produce IDENTICAL rows to the distributed Lloyd/probe
    plans — centroids, and full ivf_knn results."""
    local_c = S.kmeans_centroids(emb, 8, 2).collect()
    local_knn = S.ivf_knn(emb, 0, 10, n_cells=16, nprobe=3,
                          kmeans_iters=3).collect()
    local_seed = S.ivf_knn(emb, 3, 10, n_cells=16, nprobe=2).collect()
    monkeypatch.setattr(S, "DRIVER_ELEMS_CAP", -1)
    dist_c = S.kmeans_centroids(emb, 8, 2).collect()
    dist_knn = S.ivf_knn(emb, 0, 10, n_cells=16, nprobe=3,
                         kmeans_iters=3).collect()
    dist_seed = S.ivf_knn(emb, 3, 10, n_cells=16, nprobe=2).collect()
    monkeypatch.undo()
    assert sorted(map(tuple, local_c)) == sorted(map(tuple, dist_c))
    assert local_knn and \
        [tuple(r) for r in local_knn] == [tuple(r) for r in dist_knn]
    assert local_seed and \
        [tuple(r) for r in local_seed] == [tuple(r) for r in dist_seed]


def test_driver_guard_is_element_based(spark, monkeypatch):
    """The driver-gather guard counts ELEMENTS (rows x dim), not rows
    (VERDICT r4): a high-dimensional corpus whose row count alone would
    fit must route to the distributed plan before a multi-GB gather —
    and both routes still agree row-for-row at small N."""
    import newssearchengine_spark.operators.similarity as sim

    dim = 96
    rng = np.random.default_rng(11)
    rows = [(i, rng.standard_normal(dim).tolist()) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    taken = []
    orig = sim._ivf_knn_local

    def spy(*a, **kw):
        taken.append("driver")
        return orig(*a, **kw)

    monkeypatch.setattr(sim, "_ivf_knn_local", spy)
    # 80 rows x 96 dims = 7680 elements: over a 4096-element cap even
    # though 80 rows would pass any row-count gate
    monkeypatch.setattr(sim, "DRIVER_ELEMS_CAP", 4096)
    dist = sim.ivf_knn(emb, 0, 10, n_cells=8, kmeans_iters=2,
                       nprobe=3).collect()
    assert taken == []  # high-dim corpus took the distributed route
    monkeypatch.setattr(sim, "DRIVER_ELEMS_CAP", 1 << 22)
    drv = sim.ivf_knn(emb, 0, 10, n_cells=8, kmeans_iters=2,
                      nprobe=3).collect()
    assert taken == ["driver"]
    assert drv and [tuple(r) for r in drv] == [tuple(r) for r in dist]


def test_ivf_adaptive_exact_and_prunes(spark, emb):
    """ivf_knn_adaptive must equal brute force EXACTLY (rounded cosines,
    (cos desc, vec_id asc) order — its stop rule is a proof, not a
    heuristic). Exactness is checked on the real corpus; the PRUNING is
    checked on a clustered fixture, because the synthetic embeddings are
    near-isotropic (cell radii ~90 deg), where the triangle bound
    correctly degenerates to a full scan rather than losing recall."""
    for qid in (0, 7, 123):
        stats: dict = {}
        got = S.ivf_knn_adaptive(emb, qid, 10, n_cells=16, kmeans_iters=3,
                                 stats_out=stats).collect()
        want = S.brute_force_knn(emb, qid, 10).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], qid
        assert stats["cells_probed"] <= stats["n_cells"]

    # clustered fixture: 4 tight clusters around orthogonal axes -> small
    # radii -> the stop rule must fire after the first batch of cells
    rng = np.random.default_rng(3)
    rows = []
    for c in range(4):
        axis = np.zeros(16)
        axis[c] = 1.0
        for i in range(40):
            v = axis + 0.01 * rng.standard_normal(16)
            rows.append((c * 40 + i, [float(x) for x in v]))
    clustered = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    stats2: dict = {}
    got = S.ivf_knn_adaptive(clustered, 0, 5, n_cells=4, kmeans_iters=2,
                             batch_cells=1, stats_out=stats2).collect()
    want = S.brute_force_knn(clustered, 0, 5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert stats2["cells_probed"] < stats2["n_cells"], stats2


def test_ivf_adaptive_driver_route_equals_distributed(spark, emb,
                                                      monkeypatch):
    """The adaptive driver regime (numpy mirror of the probe loop) must
    match the distributed plan row-for-row AND in its probe accounting
    (same bounds + same rounded scores => same stop decision)."""
    ls: dict = {}
    local = S.ivf_knn_adaptive(emb, 7, 10, n_cells=16, kmeans_iters=3,
                               stats_out=ls).collect()
    monkeypatch.setattr(S, "DRIVER_ELEMS_CAP", -1)
    ds: dict = {}
    dist = S.ivf_knn_adaptive(emb, 7, 10, n_cells=16, kmeans_iters=3,
                              stats_out=ds).collect()
    monkeypatch.undo()
    assert local and [tuple(r) for r in local] == [tuple(r) for r in dist]
    assert ls == ds  # cells_probed / n_cells identical
    # absent query id: typed empty on BOTH routes (ADVICE r4)
    assert S.ivf_knn_adaptive(emb, 10**9, 5, n_cells=8).collect() == []


def test_lang_id_heuristic(docs):
    pred = {r["doc_id"]: r["pred_lang"] for r in T.lang_id(docs).collect()}
    assert pred[1] == "en"
    assert pred[5] == "de"
    # no function-word hits at all => undetermined
    assert pred[4] == "und" and pred[6] == "und"


def test_quality_and_token_counts(docs):
    q = {r["doc_id"]: r for r in T.quality_features(docs).collect()}
    assert q[1]["n_tokens"] == 9
    assert q[1]["punct_ratio"] == 0.0
    assert q[6]["n_tokens"] == 1
    tc = {r["doc_id"]: r for r in T.token_counts(docs).collect()}
    assert tc[1]["n_ws_tokens"] == 9 and tc[1]["n_bpeish_tokens"] == 9


def test_fingerprints_layout_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "a b c"), (3, "c b a"), (4, "a b c d")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r for r in T.fingerprints(df).collect()}
    assert fp[1]["fp_content"] == fp[2]["fp_content"]       # whitespace-insensitive
    assert fp[2]["fp_content"] != fp[3]["fp_content"]       # order-sensitive
    assert fp[2]["fp_tokenset"] == fp[3]["fp_tokenset"]     # set: order-insensitive
    assert fp[2]["fp_tokenset"] != fp[4]["fp_tokenset"]


def test_multimodal_metadata_and_stub(spark, docs):
    payloads = M.to_payload(docs)
    meta = M.extract_metadata(payloads)
    joined = meta.join(
        payloads.select("doc_id", F.crc32("payload").alias("crc_jvm"),
                        F.length("payload").alias("len_jvm")),
        "doc_id",
    ).collect()
    for r in joined:
        assert r["checksum"] == r["crc_jvm"] % (1 << 16)  # python stub == JVM crc32
        assert r["n_bytes"] == r["len_jvm"]
        assert r["width"] == r["n_bytes"] % 640 and r["height"] == r["n_bytes"] % 480
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")


def test_streaming_equals_batch(spark, sf_tiny):
    from newssearchengine_spark.streaming.pipeline import (
        run_stateful_user_counts,
        run_windowed_counts,
    )

    path = f"{sf_tiny}/events.parquet"
    ev = spark.read.parquet(path)

    got = {(r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
           for r in run_windowed_counts(spark, path, query_name="t_win").collect()}
    exp_df = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    exp = {(r["w"], r["event_type"]): (r["n"], r["v"]) for r in exp_df.collect()}
    assert got == exp

    got2 = {r["user_id"]: r["n_events"]
            for r in run_stateful_user_counts(spark, path, query_name="t_state").collect()}
    exp2 = {r["user_id"]: r["count"] for r in ev.groupBy("user_id").count().collect()}
    assert got2 == exp2


def test_ivf_save_load_prunes_partitions(spark, emb, tmp_path):
    d = str(tmp_path / "ivf")
    S.ivf_save(emb, d, n_cells=16)
    qvec = [float(x) for x in
            emb.filter("vec_id = 0").collect()[0]["embedding"]]
    got = S.ivf_load_knn(spark, d, qvec, 10, nprobe=2).collect()
    # persisted-index results == in-memory ivf results (minus the self hit,
    # which ivf_knn drops but a raw-vector query keeps)
    # ivf_save defaults to k-means centroids: compare against the same
    mem = {r["vec_id"]: r["cos"]
           for r in S.ivf_knn(emb, 0, 10, n_cells=16, nprobe=2,
                              kmeans_iters=3).collect()}
    for r in got:
        if r["vec_id"] == 0:
            continue
        assert r["cos"] == pytest.approx(mem[r["vec_id"]], abs=1e-6)
    # the probe scan must be partition-pruned to the nprobe cells
    from tests.test_plans import plan

    cells = spark.read.parquet(f"{d}/cells")
    from pyspark.sql import functions as F2
    pruned = cells.filter(F2.col("cell").isin([0, 1]))
    assert "PartitionFilters" in plan(pruned) and "cell" in plan(pruned)


def test_frame_sample_reassembles_and_samples(spark, docs):
    """every_n=1 frames concatenate back to the exact payload bytes;
    every_n=3 keeps exactly frames 0,3,6,... of the same chunking."""
    payloads = M.to_payload(docs, text_col="text").limit(20)
    raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}

    full = M.frame_sample(payloads, frame_bytes=64, every_n=1).collect()
    by_doc: dict[int, list] = {}
    for r in full:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], bytes(r["frame"])))
    for doc_id, frames in by_doc.items():
        frames.sort()
        assert b"".join(b for _, b in frames) == raw[doc_id]
        assert [i for i, _ in frames] == list(range(len(frames)))

    sampled = M.frame_sample(payloads, frame_bytes=64, every_n=3).collect()
    for r in sampled:
        b = raw[r["doc_id"]]
        assert r["frame_idx"] % 3 == 0
        expect = b[r["frame_idx"] * 64:(r["frame_idx"] + 1) * 64]
        assert bytes(r["frame"]) == expect
        assert r["head_hex"] == expect[:4].hex().upper()


def test_ivf_kmeans_recall_and_determinism(spark, sf_tiny):
    """Seeded k-means IVF: centroids are bit-reproducible run-to-run,
    n_cells derives ~sqrt(N) from corpus size, and recall@10 vs brute
    force averages >= 0.9 over the fixture queries (nprobe=5 of 22 cells
    on near-uniform random embeddings — the adversarial case for IVF;
    clustered real embeddings do better)."""
    from newssearchengine_spark.operators.similarity import (
        brute_force_knn, derive_n_cells, ivf_knn, kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet").persist()
    n = emb.count()
    nc = derive_n_cells(n)
    assert nc == round(n ** 0.5)
    assert derive_n_cells(10 ** 12) == 10 ** 6

    c1 = kmeans_centroids(emb, nc, 3)
    c2 = kmeans_centroids(emb, nc, 3)
    assert sorted(map(tuple, ((r["cell"], tuple(r["cvec"])) for r in c1.collect()))) \
        == sorted(map(tuple, ((r["cell"], tuple(r["cvec"])) for r in c2.collect())))
    c1 = c1.persist()
    c1.count()

    recalls = []
    for qid in range(8):
        bf = {r["vec_id"] for r in brute_force_knn(emb, qid, 10).collect()}
        iv = {r["vec_id"] for r in ivf_knn(emb, qid, 10, n_cells=nc,
                                           nprobe=5, centroids=c1).collect()}
        recalls.append(len(bf & iv) / len(bf))
    assert sum(recalls) / len(recalls) >= 0.9 - 1e-9, recalls


def test_stream_dedup_equals_batch_distinct(spark, tmp_path):
    """Streaming stateful dedup (applyInPandasWithState, hash-prefix
    partitioned state): the admitted set equals the batch DISTINCT of
    content hashes, each hash emitted exactly once, regardless of how the
    stream is chunked into micro-batches."""
    from pyspark.sql import functions as F

    from newssearchengine_spark.datagen import source_files
    from newssearchengine_spark.sources.corpus import assign_doc_ids
    from newssearchengine_spark.streaming.pipeline import run_stream_dedup

    docs = assign_doc_ids(source_files(spark, 300, seed=13, partitions=3),
                          num_partitions=3)
    # inject real duplicates: every doc_id % 3 == 0 doc repeated verbatim
    dups = docs.filter("doc_id % 3 = 0")
    full = docs.unionByName(dups)
    src = str(tmp_path / "dedup_src")
    full.repartition(4).write.parquet(src)

    got = run_stream_dedup(spark, src, text_col="content",
                           query_name="t_sdedup").collect()
    hashes = [r["content_hash"] for r in got]
    assert len(hashes) == len(set(hashes)), "a hash was emitted twice"
    expected = {
        r["h"]
        for r in spark.read.parquet(src)
        .select(F.sha2("content", 256).alias("h")).distinct().collect()
    }
    assert set(hashes) == expected


def test_embedding_near_dup_neighbor_probe_recovers_boundary_pair(spark):
    """A constructed near-dup pair straddling an IVF cell boundary:
    single-cell bucketing (probe_cells=1) misses it, top-2-cell candidate
    generation (probe_cells=2) finds it — and emits it exactly once even
    though the pair shares both probed cells."""
    from newssearchengine_spark.operators.dedup import embedding_near_dup_pairs

    rows = [
        (0, [1.0, 0.0]),     # seed centroid for cell 0
        (1, [0.0, 1.0]),     # seed centroid for cell 1
        (2, [0.72, 0.69]),   # nearest cell 0 ...
        (3, [0.69, 0.72]),   # ... nearest cell 1, but cos(2,3) ~ 0.999
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    p1 = {(r["id_a"], r["id_b"])
          for r in embedding_near_dup_pairs(emb, threshold=0.95, n_cells=2,
                                            probe_cells=1).collect()}
    assert (2, 3) not in p1  # the documented single-probe boundary miss

    got = embedding_near_dup_pairs(emb, threshold=0.95, n_cells=2,
                                   probe_cells=2).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in got]
    assert pairs.count((2, 3)) == 1
    assert {(2, 3)} == set(pairs)  # centroid pair (0,1) has cos 0 < 0.95


def test_ivf_derived_sizing_production_path(spark, sf_tiny):
    """n_cells=None flows through ivf_assign/ivf_knn (derive_n_cells
    internally) and equals the explicitly-sized call — the production
    sizing path, not just the helper."""
    from newssearchengine_spark.operators.similarity import (
        derive_n_cells, ivf_assign, ivf_knn,
    )

    emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet").persist()
    n = emb.count()
    nc = derive_n_cells(n)
    assert nc != 16  # the gate constant must not mask the derived path

    a_none = sorted(map(tuple, ivf_assign(emb, None).collect()))
    a_expl = sorted(map(tuple, ivf_assign(emb, nc).collect()))
    assert a_none == a_expl
    assert len({c for _, c in a_none}) > 1

    k_none = [tuple(r) for r in ivf_knn(emb, 3, 10, n_cells=None,
                                        nprobe=5).collect()]
    k_expl = [tuple(r) for r in ivf_knn(emb, 3, 10, n_cells=nc,
                                        nprobe=5).collect()]
    assert k_none == k_expl and len(k_none) == 10
    emb.unpersist()


def test_benchmark_contamination_constructed(spark):
    """A doc embedding one exact 8-token benchmark run is flagged with
    exactly the expected gram counts; clean docs report zero; docs
    shorter than n report (0, 0, 0.0)."""
    from newssearchengine_spark.operators.dedup import benchmark_contamination

    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        (0, bench_text),                                    # the benchmark
        (1, "intro words then " + bench_text + " trailing content here"),
        (2, "totally unrelated clean document text with many other words"),
        (3, "tiny doc"),                                    # < n tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.filter("doc_id = 0")
    out = {r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["contamination"])
           for r in benchmark_contamination(docs, bench, n=8).collect()}
    # benchmark doc: 9 tokens -> 2 8-grams, both (trivially) contaminated
    assert out[0] == (2, 2, 1.0)
    # doc 1 contains the full benchmark run -> both benchmark 8-grams,
    # plus its own clean grams around them
    n_grams, n_hit, frac = out[1]
    assert n_hit == 2 and n_grams > 2 and 0 < frac < 1
    assert frac == round(n_hit / n_grams, 6)
    assert out[2][1] == 0 and out[2][2] == 0.0
    assert out[3] == (0, 0, 0.0)


def test_ivf_assign_literal_and_join_routes_agree(spark, sf_tiny, monkeypatch):
    """The literal-projection argmax and the broadcast-join + max_by
    fallback (taken when cells x dim exceeds LITERAL_ELEMS_CAP) must
    produce identical assignments — single-probe and multi-probe."""
    from newssearchengine_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet").persist()
    lit1 = sorted(map(tuple, S.ivf_assign(emb, 16).collect()))
    lit2 = sorted(map(tuple, S.ivf_assign_topn(emb, 16, 2).collect()))
    monkeypatch.setattr(S, "LITERAL_ELEMS_CAP", 0)  # force the join route
    join1 = sorted(map(tuple, S.ivf_assign(emb, 16).collect()))
    join2 = sorted(map(tuple, S.ivf_assign_topn(emb, 16, 2).collect()))
    assert lit1 == join1 and len(lit1) == emb.count()
    assert lit2 == join2 and len(lit2) == 2 * emb.count()
    km = S.kmeans_centroids(emb, 8, 2)  # join-route Lloyd iterations
    monkeypatch.undo()
    assert sorted(map(tuple, S.kmeans_centroids(emb, 8, 2).collect())) == \
        sorted(map(tuple, km.collect()))
    emb.unpersist()


def test_stream_decontaminate_equals_batch(spark, tmp_path):
    """Streaming decontamination (foreachBatch, stream-static broadcast)
    admits exactly the docs the batch operator admits, regardless of
    file-at-a-time arrival order, with identical per-doc profiles."""
    from newssearchengine_spark.operators.dedup import benchmark_contamination
    from newssearchengine_spark.streaming.pipeline import \
        run_stream_decontaminate

    bench_run = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [(i, f"doc {i} body filler words number{i} padding tokens "
                + (bench_run if i % 5 == 0 else "clean tail content here"))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches
    bench = spark.createDataFrame([(0, bench_run)],
                                  "doc_id long, content string")

    out = run_stream_decontaminate(
        spark, src, bench, str(tmp_path / "admitted"), n=8,
        checkpoint_dir=str(tmp_path / "ckpt"))
    got = {r["doc_id"]: (r["n_grams"], r["n_contaminated"],
                         r["contamination"]) for r in out.collect()}

    prof = benchmark_contamination(docs, bench, n=8, text_col="content")
    want = {r["doc_id"]: (r["n_grams"], r["n_contaminated"],
                          r["contamination"])
            for r in prof.filter("contamination <= 0.0").collect()}
    assert got == want
    assert got and all(i % 5 != 0 for i in got)  # contaminated all dropped
    assert set(got) | {i for i in range(40) if i % 5 == 0} == set(range(40))


def test_stream_decontaminate_all_rejected_and_dirty_outdir(spark, tmp_path):
    """ADVICE r3 edge cases: a stream where EVERY doc is contaminated
    must return an empty typed DataFrame (no 'unable to infer schema'
    read failure), and a pre-populated out_dir must be refused instead
    of silently mixing old and new results."""
    from newssearchengine_spark.streaming.pipeline import \
        run_stream_decontaminate

    bench_run = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [(i, f"doc {i} prefix words here {bench_run}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    src = str(tmp_path / "src")
    docs.repartition(2).write.parquet(src)
    bench = spark.createDataFrame([(0, bench_run)],
                                  "doc_id long, content string")

    out = run_stream_decontaminate(
        spark, src, bench, str(tmp_path / "admitted"), n=8,
        checkpoint_dir=str(tmp_path / "ckpt"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "content", "n_grams",
                           "n_contaminated", "contamination"]

    dirty = str(tmp_path / "dirty")
    docs.write.parquet(dirty)  # any pre-existing parquet output
    with pytest.raises(ValueError, match="already contains"):
        run_stream_decontaminate(spark, src, bench, dirty, n=8,
                                 checkpoint_dir=str(tmp_path / "ckpt2"))


def test_repetition_features_constructed(spark):
    """Known repetition profiles: pure spam, clean text, periodic
    boilerplate, empty, and below-n docs."""
    from newssearchengine_spark.operators.text import repetition_features

    rows = [
        (0, "spam spam spam spam spam"),
        (1, "a normal sentence with distinct words only here"),
        (2, "buy now buy now buy now limited offer"),
        (3, ""),
        (4, "one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_token_frac"],
                         r["top_bigram_share"], r["top_trigram_share"])
           for r in repetition_features(df).collect()}
    assert got[0] == (5, 0.8, 1.0, 1.0)
    assert got[1] == (8, 0.0, round(1 / 7, 6), round(1 / 6, 6))
    assert got[2] == (8, 0.5, round(3 / 7, 6), round(2 / 6, 6))
    assert got[3] == (0, 0.0, 0.0, 0.0)
    assert got[4] == (2, 0.0, 1.0, 0.0)
