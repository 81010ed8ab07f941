"""Deduplication operators for large-scale training-data pipelines.

All four are Catalyst-native (no Python in the hot path): hashing via
built-in md5, shingling via higher-order array functions, candidate
generation via hash-bucket self-joins. At 100 TB:

- exact: one map-side-combined groupBy on the content hash.
- MinHash-LSH: shingle -> n_hashes min-hashes -> bands; candidate pairs come
  from an equi-join on (band_idx, band_hash) — never an all-pairs product.
  Hot buckets (boilerplate docs) are the skew risk: AQE skew-join handles
  moderate cases; pathological buckets should be length-capped upstream.
- SimHash: bit-budget fingerprint; one groupBy(doc) after a bit fan-out.
- n-gram Jaccard: exact verification for candidate pairs (use after LSH at
  scale; standalone here) via a shingle inverted-list self-join.

Determinism: every hash is md5 (identical across JVM/DuckDB/Python), no
randomness — "permutations" are keyed hash families md5(i || ':' || x).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_K = 3
N_MINHASH = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def normalized(text: Column) -> Column:
    """Dedup normalization: lowercase + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def exact_dedup(docs: DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash. Returns one row per group
    with >= 2 members: (content_hash, keep_id, n_dupes, dupe_ids)."""
    h = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized(F.col(text_col))).alias("content_hash"),
    )
    return (
        h.groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_dupes"),
            F.sort_array(F.collect_list("doc_id")).alias("dupe_ids"),
        )
        .filter(F.col("n_dupes") >= 2)
    )


def shingles_from_tokens(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-shingles from a token array.

    Built with zip_with over shifted slices — NOT element_at inside a
    transform lambda: Catalyst's projection collapse inlines the upstream
    split() into lambda argument expressions, and element_at(split(...), i)
    then re-evaluates the split PER ELEMENT (O(len^2) per doc; measured
    12s -> 0.5s on the sf0.1 dedup corpus). zip_with arguments are
    evaluated once per row regardless of collapse.
    """
    n = F.size(toks)
    tri = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        tri = F.zip_with(tri, shifted, lambda x, y: F.concat_ws(" ", x, y))
    # zip_with pads the tail with nulls -> trailing (k-1) entries are short
    # n-grams; trim them
    sh = F.when(n >= k, F.slice(tri, 1, n - (k - 1))).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(sh)


def doc_shingles(docs: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id", k: int = SHINGLE_K) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized(F.col(text_col)), " ").alias("toks"),
    )
    return toks.select(
        "doc_id", shingles_from_tokens(F.col("toks"), k).alias("shingles")
    ).filter(F.size("shingles") > 0)


MINHASH_PRIME = 2147483647  # 2^31 - 1


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash family: sig_i = min((a*h + b) mod p)
    over shingle base-hashes h (universal-hash family on one md5-derived
    base hash — one md5 per shingle instead of n_hashes md5s)."""
    return [
        (((i + 1) * 2654435761) % MINHASH_PRIME | 1,
         ((i + 1) * 40503 * 61) % MINHASH_PRIME)
        for i in range(n_hashes)
    ]


def minhash_lsh_pairs(docs: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", n_hashes: int = N_MINHASH,
                      bands: int = LSH_BANDS, k: int = SHINGLE_K) -> DataFrame:
    """Candidate near-dup pairs via MinHash + banded LSH.

    base(s) = first 60 bits of md5(shingle) mod p (computed ONCE per
    shingle); sig_i(doc) = min over shingles of (a_i*base + b_i) mod p —
    integer arithmetic stays in whole-stage codegen, only one digest pass.
    A band's bucket key is md5 of its rows joined. Pairs sharing ANY band
    bucket are candidates. Returns distinct (id_a, id_b), id_a < id_b.
    """
    rows_per_band = n_hashes // bands
    sh = doc_shingles(docs, text_col=text_col, id_col=id_col, k=k)
    base = F.transform(
        F.col("shingles"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("bigint") % MINHASH_PRIME,
    )
    sh = sh.select("doc_id", base.alias("hs"))

    def family(a: int, b: int):
        return lambda h: (h * a + b) % MINHASH_PRIME

    sigs = [
        F.array_min(F.transform(F.col("hs"), family(a, b))).alias(f"sig{i}")
        for i, (a, b) in enumerate(minhash_params(n_hashes))
    ]
    sig_df = sh.select("doc_id", *sigs)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(F.concat_ws("|", *[F.col(f"sig{b * rows_per_band + r}")
                                     for r in range(rows_per_band)])).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = sig_df.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bd")
    ).select("doc_id", "bd.band_idx", "bd.band_hash")
    # ONE shuffle: bucket members per (band, hash), pairs expanded in-bucket
    # (a self-join would shuffle AND recompute the signature pipeline twice).
    # Hot buckets cost |B|^2 pairs — inherent to LSH; production caps bucket
    # size upstream by salting or dropping degenerate (boilerplate) buckets.
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    # 2-arg transform: (element, index) — used intentionally
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def ngram_jaccard_pairs(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = SHINGLE_K,
                        threshold: float = 0.5) -> DataFrame:
    """Exact shingle-Jaccard pairs >= threshold via inverted-list self-join
    (pairs only materialize for docs sharing at least one shingle)."""
    sh = doc_shingles(docs, text_col=text_col, id_col=id_col, k=k)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_near_dup_pairs(emb: DataFrame, *, threshold: float = 0.95,
                             n_cells: int = 16, probe_cells: int = 1,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed.

    Scale path: candidate pairs only form within a SHARED IVF cell
    (near-identical vectors share a nearest centroid), so the join is
    cell-local instead of an all-pairs product — the embedding analog of
    LSH banding. Returns (id_a, id_b, cos) with cos >= threshold,
    id_a < id_b.

    probe_cells=1 buckets each vector into its single nearest cell (the
    cheapest form; true near-dups straddling a cell boundary are missed).
    probe_cells=2 assigns each vector to its top-2 cells for CANDIDATE
    GENERATION (the scoring is exact either way): a boundary-straddling
    pair shares at least one cell whenever either vector's 2nd-nearest
    cell is the other's nearest — recall up at bounded cost (candidates
    ~probe_cells^2 per colliding pair, never corpus-quadratic).
    """
    from .similarity import as_double, cosine, ivf_assign_topn

    assign = ivf_assign_topn(emb, n_cells, probe_cells,
                             id_col=id_col, vec_col=vec_col)
    cand = (
        assign.alias("a")
        .join(assign.alias("b"),
              (F.col("a.cell") == F.col("b.cell"))
              & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"))
        .distinct()  # a pair sharing 2 cells must score (and emit) once
    )
    v = emb.select(F.col(id_col).alias("vec_id"),
                   as_double(F.col(vec_col)).alias("v"))
    return (
        cand.join(v.select(F.col("vec_id").alias("id_a"),
                           F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("vec_id").alias("id_b"),
                       F.col("v").alias("vb")), "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


SIMHASH_BITS = 16
_HIGH_HEX = list("89abcdef")


def simhash(docs: DataFrame, *, text_col: str = "text",
            id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash fingerprint (bit j from md5 hex digit j: digits
    8..f vote +tf, 0..7 vote -tf; bit set if the weighted sum > 0)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalized(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    bits_df = tf.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda j: F.struct(
                    j.alias("bit"),
                    F.when(
                        F.substring(F.md5(F.col("term")), 1, bits)
                        .substr(j + 1, F.lit(1))
                        .isin(_HIGH_HEX),
                        F.col("tf"),
                    ).otherwise(-F.col("tf")).alias("vote"),
                ),
            )
        ).alias("bv"),
    ).select("doc_id", "bv.bit", "bv.vote")
    return (
        bits_df.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0,
                       F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
                .otherwise(F.lit(0).cast("bigint"))
            ).cast("bigint").alias("simhash")
        )
    )


def benchmark_contamination(docs: DataFrame, benchmark: DataFrame, *,
                            n: int = 8, text_col: str = "text",
                            id_col: str = "doc_id",
                            analyzer=None) -> DataFrame:
    """Benchmark decontamination: per-doc overlap with a benchmark set's
    token n-grams (the training-data hygiene step that keeps eval
    benchmarks out of a training corpus — n-gram membership testing, the
    standard 8-13-gram protocol).

    Returns (doc_id, n_grams, n_contaminated, contamination): the doc's
    DISTINCT analyzed n-gram count, how many of them occur anywhere in
    the benchmark, and the contaminated fraction (0.0 when the doc is
    shorter than n tokens).

    Scale shape: n-grams are assembled with higher-order functions inside
    the scan (sequence -> slice -> concat_ws, all codegen) and deduped
    per doc with array_distinct BEFORE the explode — so the only shuffle
    is the final per-doc count, and the benchmark side collapses to a
    distinct-gram relation that is broadcast (a benchmark suite is
    O(10^6-10^7) grams; the corpus is the 100 TB side and is never
    shuffled on gram).
    """
    from ..functions.analysis import analyze_expr

    def gram_arrays(df: DataFrame) -> DataFrame:
        # ngram_array keeps the analyzer subtree in CSE-eliminated
        # top-level positions — a lambda-indexed assembly would re-run
        # the analyzer regexes once per gram (see operators.text)
        from .text import ngram_array

        toks = df.select(
            F.col(id_col).alias("doc_id"),
            analyze_expr(F.col(text_col), analyzer).alias("toks"),
        )
        return toks.select(
            "doc_id",
            F.array_distinct(ngram_array(F.col("toks"), n)).alias("grams"),
        )

    bench_grams = (
        gram_arrays(benchmark)
        .select(F.explode("grams").alias("g")).distinct()
    )
    dg = gram_arrays(docs)
    exploded = dg.select("doc_id", F.explode("grams").alias("g"))
    hits = (
        exploded.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated"))
    )
    return (
        dg.select("doc_id", F.size("grams").cast("bigint").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", "n_grams",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("bigint")
            .alias("n_contaminated"),
            F.round(
                F.when(F.col("n_grams") > 0,
                       F.coalesce(F.col("n_contaminated"), F.lit(0))
                       / F.col("n_grams"))
                .otherwise(F.lit(0.0)), 6
            ).alias("contamination"),
        )
    )
