"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation
/ stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting. All pure Catalyst expressions — these run over
every document of a 100 TB corpus, so they must stay inside whole-stage
codegen (no Python at all).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language function-word lists (deterministic heuristic; the gate
# corpus langs are en/de/es/fr/zh — zh won't hit latin stopwords and falls
# through to 'und').
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
    "fr": ["le", "la", "les", "des", "et", "est", "un", "une", "dans", "que"],
}

BPE_ISH_RE = "[a-z0-9]+|[^a-z0-9\\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text (empties filtered)."""
    return F.filter(
        F.split(F.lower(text), "\\s+"), lambda t: t != ""
    )


def ngram_array(toks: Column, n: int) -> Column:
    """Space-joined token n-grams as an array column; empty below n
    tokens.

    Assembled as arrays_zip of n shifted slices so `toks` appears only in
    TOP-LEVEL expression positions, where whole-stage codegen's
    subexpression elimination evaluates it once per row. The naive
    transform(sequence(1, L), i -> concat_ws(' ', slice(toks, i, n)))
    form references `toks` inside a lambda body — Catalyst does NOT CSE
    inside lambdas, so the whole token subtree (analyzer regexes
    included) re-evaluates once per element: O(len^2) per row, measured
    at >1 s/row on ordinary documents."""
    L = F.greatest(F.size(toks) - n + 1, F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, k + 1, L) for k in range(n)])
    return F.when(
        F.size(toks) >= n,
        F.transform(
            z, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
        ),
    ).otherwise(F.array().cast("array<string>"))


def lang_scores(text: Column) -> list[Column]:
    """One hit-count column per language."""
    toks = ws_tokens(text)

    def contains(words: list[str]):
        wl = F.lit(words).cast("array<string>")
        # single-param lambda on purpose (2-arg => F.filter passes an index)
        return lambda t: F.array_contains(wl, t)

    return [
        F.size(F.filter(toks, contains(words))).cast("bigint").alias(f"hits_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]


def lang_id(docs: DataFrame, *, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, hits): argmax stopword hits, ties -> lang asc,
    zero hits -> 'und' (undetermined, BCP-47 style)."""
    scored = docs.select(F.col(id_col).alias("doc_id"),
                         *lang_scores(F.col(text_col)))
    longform = scored.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(lang).alias("lang"), F.col(f"hits_{lang}").alias("hits"))
                for lang in sorted(LANG_STOPWORDS)
            ])
        ).alias("s"),
    ).select("doc_id", "s.lang", "s.hits")
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lang"))
    best = longform.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.select(
        "doc_id",
        F.when(F.col("hits") > 0, F.col("lang")).otherwise(F.lit("und"))
        .alias("pred_lang"),
        F.col("hits"),
    )


def quality_features(docs: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals + a composite score in [0, 1]."""
    t = F.col(text_col)
    toks = ws_tokens(t)
    n_chars = F.length(t)
    n_toks = F.size(toks)
    # punctuation = anything outside [a-z0-9\s] in the lowercased text
    n_punct = n_chars - F.length(F.regexp_replace(F.lower(t), "[^a-z0-9\\s]", ""))
    mean_tok = F.when(n_toks > 0,
                      F.aggregate(toks, F.lit(0.0),
                                  lambda acc, x: acc + F.length(x)) / n_toks
                      ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    en_stop = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(en_stop)))
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0))
    score = (
        F.least(n_toks / F.lit(50.0), F.lit(1.0)) * 0.5
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), 0.2).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("bigint").alias("n_chars"),
        n_toks.cast("bigint").alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(docs: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (words and
    isolated punctuation marks — a deterministic proxy for subword
    tokenizer budgeting)."""
    t = F.lower(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws_tokens(F.col(text_col))).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RE), 0))
        .cast("bigint").alias("n_bpeish_tokens"),
    )


def fingerprints(docs: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Two content fingerprints: md5 of whitespace-normalized text (layout-
    insensitive) and md5 of the sorted distinct token set (order- and
    multiplicity-insensitive — catches shuffled near-dupes)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    tokset = F.array_sort(F.array_distinct(F.split(norm, " ")))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fp_content"),
        F.md5(F.concat_ws(" ", tokset)).alias("fp_tokenset"),
    )


def denormalize_keywords(
    docs: DataFrame,
    *,
    keywords_col: str = "keywords",
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_order: bool = True,
    out_col: str = "denormalized",
) -> DataFrame:
    """Stemmed-keyword denormalization (SURVEY K5) — restore the surface
    form of analyzed/stemmed keywords by longest-prefix search in the
    source text, exactly the reference's algorithm at
    /root/reference/wapo/parser.py:59-72 (identical copy at
    netzpolitik/parser.py:60-68):

      for each keyword, regex-search \\b{kw}([\\wöüäß]+)?\\b case-
      insensitively; on no match shrink the keyword from the right until
      len 1; record (matched surface form, match offset); dedup the
      (surface, offset) pairs; if keep_order, sort by first-occurrence
      offset; emit the surface forms.

    Regex backoff is inherently per-string work, so this is the documented
    pandas-UDF slow path (SURVEY §2.6 K5): one Arrow batch in, one out —
    no per-row Python at the Spark level. Adds `out_col` array<string>.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _denorm(kw_lists: pd.Series, texts: pd.Series) -> pd.Series:
        def denorm_one(text: str, kw: str):
            if not text or not kw:
                return None
            query = kw
            while True:
                m = re.search(rf"\b{re.escape(query)}([\wöüäß]+)?\b", text,
                              flags=re.IGNORECASE)
                if m is not None:
                    return (m.group(0), m.start())
                query = query[:-1]
                if len(query) <= 1:
                    m = re.search(rf"\b{re.escape(query)}([\wöüäß]+)?\b",
                                  text, flags=re.IGNORECASE)
                    return (m.group(0), m.start()) if m else None

        out = []
        for kws, text in zip(kw_lists, texts):
            if kws is None or text is None:
                out.append([])
                continue
            pairs = {p for p in (denorm_one(text, k) for k in kws) if p}
            ordered = sorted(pairs, key=lambda t: t[1]) if keep_order \
                else sorted(pairs)
            out.append([s for s, _ in ordered])
        return pd.Series(out)

    return docs.withColumn(out_col, _denorm(F.col(keywords_col),
                                            F.col(text_col)))


def highlight(
    docs: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    context_words: int = 3,
) -> DataFrame:
    """Search-result highlighting (the ES `highlight` surface): wrap every
    whole-word, case-insensitive occurrence of the query terms in
    pre/post tags, and extract a first-match fragment with up to
    `context_words` words of context on each side. Pure Catalyst regex
    expressions — codegen'd, runs on the top-k join output (k rows), not
    the corpus. Adds `highlighted` and `fragment` columns.

    Contract note: tags fire on WHOLE words (\\b-delimited), the right
    semantics for natural-language fields (the reference's news domain).
    A camelCase/snake_case identifier is one \\b-word, so an analyzed
    SUB-token (e.g. 'node' from 'nodeCursor') never tags inside it —
    ES's offset-bearing highlighter would; reproducing that would need
    lookaround regexes RE2 (and so the DuckDB oracle) can't express.
    """
    import re as _re

    alt = "|".join(_re.escape(t) for t in sorted(set(terms)))
    tag_pat = rf"(?i)\b({alt})\b"
    frag_pat = (rf"(?i)((?:\S+\s+){{0,{context_words}}}(?:{alt})"
                rf"(?:\s+\S+){{0,{context_words}}})")
    return docs.withColumn(
        "highlighted",
        F.regexp_replace(F.col(text_col), tag_pat, f"{pre_tag}$1{post_tag}"),
    ).withColumn(
        "fragment", F.regexp_extract(F.col(text_col), frag_pat, 1)
    )


def _top_ngram_share(toks: Column, n: int) -> Column:
    """Occurrence share of the doc's most frequent token n-gram, as a pure
    Catalyst expression: assemble n-grams with higher-order functions,
    SORT them, and take the longest equal-adjacent run (= max count) with
    ONE aggregate fold — O(G log G) per row, no per-row Python and no
    explode/groupBy shuffle. 0.0 for docs with fewer than n tokens.

    The fold matters: Catalyst does not common-subexpression-eliminate
    inside lambda bodies, so any formulation that indexes back into the
    gram array per element (element_at(grams, i)) re-evaluates the whole
    tokenize+assemble+sort subtree per element — O(G^2) with regex
    constants, measured at >1 s/row. The fold references the gram array
    only in top-level (CSE-eliminated) positions."""
    grams = F.sort_array(ngram_array(toks, n))

    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        cur = F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), cur.alias("cur"),
            F.greatest(acc["best"], cur).alias("best"),
        )

    best = F.aggregate(grams, zero, step, lambda acc: acc["best"])
    return F.when(F.size(grams) > 0, best / F.size(grams)).otherwise(F.lit(0.0))


def repetition_features(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals over whitespace tokens: the
    duplicate-token fraction and the occurrence share of the most
    frequent 2-gram / 3-gram. High values mark boilerplate/spam docs a
    training pipeline should drop — the repetition companion to
    quality_features."""
    t = ws_tokens(F.col(text_col))
    n_toks = F.size(t)
    dup_frac = F.when(
        n_toks > 0, 1.0 - F.size(F.array_distinct(t)) / n_toks
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_toks.cast("bigint").alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(_top_ngram_share(t, 2), 6).alias("top_bigram_share"),
        F.round(_top_ngram_share(t, 3), 6).alias("top_trigram_share"),
    )
