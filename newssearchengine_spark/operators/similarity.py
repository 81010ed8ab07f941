"""Similarity search over embedding columns (array<float>).

The reference delegates vector KNN to an embedded hnswlib HNSW index
(/root/reference/vector_storage.py:43-56, pyw_hnswlib.py:61-69, cosine
space). Spark-native equivalents:

- brute-force cosine top-k: exact baseline. Fully Catalyst (zip_with +
  aggregate fold for the dot product — JVM-side, no Python). One scan,
  one TakeOrderedAndProject. The right answer until the corpus outgrows a
  full scan.
- IVF-Flat: the scale path. Vectors are assigned to the nearest of C
  centroids at build; a query probes the nprobe nearest cells and scans
  only those. Here centroids are a deterministic subset of the data
  (vec_id < C) so the DuckDB oracle can replicate the exact partition;
  swap in k-means centroids in production (assignment op is identical).

At 100 TB: the assignment is a broadcast join (C centroids) + argmax —
one map-side pass; cell-pruned search reads only matching partitions if
the table is written partitionBy(cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i — sequential left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_knn(emb: DataFrame, query_id: int, k: int,
                    *, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbours of the vector with id `query_id`
    (self-hit excluded — reference drops res_id == query_id,
    ranking.py:140). Returns (rank, vec_id, cos)."""
    q = emb.filter(F.col(id_col) == query_id).select(
        as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(as_double(F.col(vec_col)), F.col("qvec")), 6).alias("cos"),
        )
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return topk.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("rank"), "vec_id", "cos"
    )


def ivf_assign(emb: DataFrame, n_cells: int, *, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its max-cosine centroid (centroids = the
    vectors with id < n_cells; ties -> lowest centroid id).
    Returns (vec_id, cell)."""
    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), as_double(F.col(vec_col)).alias("cvec")
    )
    scored = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    ).crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell", F.round(cosine(F.col("v"), F.col("cvec")), 9).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def ivf_save(emb: DataFrame, index_dir: str, *, n_cells: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding") -> None:
    """Persist an IVF index: vectors partitioned by cell + a centroids table
    (the reference's save_index/load_index, pyw_hnswlib.py:48-56 /
    vector_storage.py:24-30, as a build-once-query-many on-disk layout).
    partitionBy(cell) makes probe queries partition-pruned scans."""
    assign = ivf_assign(emb, n_cells, id_col=id_col, vec_col=vec_col)
    vecs = emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"))
    (
        vecs.join(assign, "vec_id")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(f"{index_dir}/cells")
    )
    (
        emb.filter(F.col(id_col) < n_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid"))
        .write.mode("overwrite").parquet(f"{index_dir}/centroids")
    )


def ivf_load_knn(spark, index_dir: str, query_vec: list[float], k: int,
                 *, nprobe: int = 2) -> DataFrame:
    """Query a persisted IVF index: rank centroids, scan ONLY the nprobe
    matching cell partitions (directory pruning), exact cosine within."""
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    cents = spark.read.parquet(f"{index_dir}/centroids")
    probe = [
        r["cell"]
        for r in cents.select(
            "cell", cosine(as_double(F.col("centroid")), q).alias("c")
        ).orderBy(F.desc("c"), F.asc("cell")).limit(nprobe).collect()
    ]
    cells = spark.read.parquet(f"{index_dir}/cells").filter(
        F.col("cell").isin(probe)
    )
    scored = cells.select(
        "vec_id",
        F.round(cosine(as_double(F.col("embedding")), q), 6).alias("cos"),
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return topk.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("rank"), "vec_id", "cos"
    )


def ivf_knn(emb: DataFrame, query_id: int, k: int, *, n_cells: int = 16,
            nprobe: int = 2, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """IVF-Flat: probe the nprobe cells whose centroids are nearest the
    query, exact cosine within them. Returns (rank, vec_id, cos) —
    approximate overall (recall < 1 vs brute force), exact within cells."""
    assign = ivf_assign(emb, n_cells, id_col=id_col, vec_col=vec_col)
    q = emb.filter(F.col(id_col) == query_id).select(
        as_double(F.col(vec_col)).alias("qvec")
    )
    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), as_double(F.col(vec_col)).alias("cvec")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("cell", F.round(cosine(F.col("cvec"), F.col("qvec")), 9).alias("ccos"))
        .orderBy(F.desc("ccos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    cand = (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != query_id)
        .select(F.col("vec_id").alias("cand_id"))
    )
    scored = (
        emb.join(cand, F.col(id_col) == F.col("cand_id"))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("cand_id").alias("vec_id"),
            F.round(cosine(as_double(F.col(vec_col)), F.col("qvec")), 6).alias("cos"),
        )
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return topk.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("rank"), "vec_id", "cos"
    )
