"""Gate entries for the text-analysis operator family over `documents`."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators import text as T
from .registry import gate_query, load

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
_EN_STOP_SQL = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS["en"])


def _lang_sql() -> str:
    hit_cols = []
    for lang, words in sorted(T.LANG_STOPWORDS.items()):
        wl = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"len(list_filter({_TOKS}, t -> list_contains([{wl}], t)))::BIGINT AS hits_{lang}"
        )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, hits_{lang} AS hits FROM scored"
        for lang in sorted(T.LANG_STOPWORDS)
    )
    return f"""WITH scored AS (SELECT doc_id, {', '.join(hit_cols)} FROM documents),
lf AS ({unions}),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
  FROM lf
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
       hits
FROM best WHERE rn = 1"""


@gate_query("tx_lang_id", _lang_sql())
def tx_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.lang_id(load(spark, sf_dir, "documents"))


@gate_query(
    "tx_quality",
    f"""WITH feats AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         len({_TOKS})::BIGINT AS n_tokens,
         (length(text) - length(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g')))::DOUBLE AS n_punct,
         len(list_filter({_TOKS}, t -> list_contains([{_EN_STOP_SQL}], t)))::DOUBLE AS n_stop,
         CASE WHEN len({_TOKS}) > 0 THEN
           list_sum(list_transform({_TOKS}, t -> length(t)))::DOUBLE / len({_TOKS})
         ELSE 0.0 END AS mean_tok
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       round(mean_tok, 6) AS mean_token_len,
       round(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END, 6) AS punct_ratio,
       round(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END, 6) AS stopword_ratio,
       round(
         least(n_tokens / 50.0, 1.0) * 0.5
         + (1.0 - least(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END * 5.0, 1.0)) * 0.3
         + CASE WHEN mean_tok >= 3.0 AND mean_tok <= 10.0 THEN 0.2 ELSE 0.0 END,
       6) AS quality
FROM feats""",
)
def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_features(load(spark, sf_dir, "documents"))


@gate_query(
    "tx_token_counts",
    f"""SELECT doc_id,
       len({_TOKS})::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{T.BPE_ISH_RE}'))::BIGINT AS n_bpeish_tokens
FROM documents""",
)
def tx_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_counts(load(spark, sf_dir, "documents"))


@gate_query(
    "tx_fingerprints",
    """WITH n AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       md5(norm) AS fp_content,
       md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' ')) AS fp_tokenset
FROM n""",
)
def tx_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprints(load(spark, sf_dir, "documents"))


@gate_query("tx_denorm_keywords", None)  # regex backoff isn't SQL-expressible: rows-only
def tx_denorm_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY K5: restore surface forms of stemmed keywords by longest-
    prefix regex backoff against the source text (the reference's
    denormalization, wapo/parser.py:59-72). Keywords here are the Porter
    stems of each doc's first 3 distinct words — stems like 'merg'/'valu'
    force real backoff.

    Deliberately rows-only (sql=None): the KEYWORDS here are Porter
    stems, and DuckDB has no stemmer — that derivation is the one
    genuinely non-SQL piece. The backoff loop itself IS hash-checked:
    tx_denorm_backoff runs the same operator on SQL-computable keywords
    that force real backoff, with a bounded prefix-ladder oracle; the
    no-backoff case is hash-checked as tx_denorm_keywords_nb. Exact
    parity of THIS entry with a reference-faithful pure-Python oracle is
    asserted in tests/test_denorm_keywords.py."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from ..functions.porter import stem

    @pandas_udf("array<string>")
    def _stem_first3(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = []
            for w in (t or "").lower().split():
                if w not in words:
                    words.append(w)
                if len(words) == 3:
                    break
            out.append([stem(w) for w in words])
        return pd.Series(out)

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", _stem_first3(F.col("text")).alias("keywords")
    )
    out = T.denormalize_keywords(docs, keywords_col="keywords",
                                 text_col="text")
    # Project array<string> -> one space-joined string: the driver's rows-only
    # canonicalizer pandas-sorts column values and dies on unhashable lists.
    return out.select(
        "doc_id", F.concat_ws(" ", F.col("denormalized")).alias("denormalized")
    )


# -- denormalization with a REAL hash-checked oracle --------------------
# The general backoff loop (shrink the stem until the regex matches,
# wapo/parser.py:59-67) isn't SQL — but when every keyword resolves on the
# FIRST probe (no backoff), denormalization IS: surface =
# regexp_extract(text, '\b<kw>\w*') per keyword. Keywords here are 4-char
# prefixes of the doc's first 3 whitespace tokens, so each keyword matches
# its own source token by construction (prefix of a real word). Output
# order is lexicographic (match offsets aren't SQL-reconstructible);
# offset ordering + full backoff stay covered by the pytest-verified
# tx_denorm_keywords gate and tests/test_denorm_keywords.py.
#
# Oracle-parity contract (the engine regex is re.IGNORECASE, unicode \w,
# re.escape'd keyword; DuckDB's is case-sensitive ASCII \w, unescaped):
# the two agree iff keywords are lowercase ASCII alnum AND the corpus
# text is lowercase ASCII — so BOTH paths filter keywords to
# ^[a-z0-9]+$, and tests/test_denorm_keywords.py asserts the gate corpus
# is lowercase-ASCII (the precondition that makes case-insensitive vs
# -sensitive first-match, and unicode vs ASCII continuation, identical).
_DENORM_NB_SQL = """WITH kwd AS (
  SELECT doc_id, text,
         list_filter(
           list_transform(list_slice(string_split(text, ' '), 1, 3),
                          w -> substring(w, 1, 4)),
           k -> regexp_matches(k, '^[a-z0-9]+$')) AS kws
  FROM documents
),
ex AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(
           list_transform(kws,
             k -> regexp_extract(text, '\\b' || k || '[\\w]*', 0)),
           s -> s IS NOT NULL AND s <> ''))) AS surfaces
  FROM kwd
)
SELECT doc_id, array_to_string(surfaces, ' ') AS denormalized FROM ex"""


@gate_query("tx_denorm_keywords_nb", _DENORM_NB_SQL)
def tx_denorm_keywords_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY K5 denormalization through the REAL operator (the same
    pandas-UDF regex path as tx_denorm_keywords), hash-checked: keywords
    are constructed so no backoff is ever needed, which makes the oracle
    a per-keyword regexp_extract in DuckDB (see _DENORM_NB_SQL)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.filter(
            F.transform(F.slice(F.split(F.col("text"), " "), 1, 3),
                        lambda w: F.substring(w, 1, 4)),
            lambda k: k.rlike("^[a-z0-9]+$"),
        ).alias("keywords"),
    )
    out = T.denormalize_keywords(docs, keywords_col="keywords",
                                 text_col="text")
    return out.select(
        "doc_id",
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.col("denormalized"))))
        .alias("denormalized"),
    )


# -- the FULL backoff loop with a hash-checked oracle --------------------
# The r4 disclosure said the shrink-until-match retry loop is "genuinely
# non-SQL". It isn't: the loop is BOUNDED by the keyword length, so it IS
# SQL as an enumerate-prefixes / keep-longest-match. What stays non-SQL in
# tx_denorm_keywords is only its Porter-stemmed KEYWORDS (no stemmer in
# DuckDB). This entry forces real backoff with SQL-computable keywords
# instead — last char of each source word replaced by 'q', so the first
# probe never matches and the loop must shrink once — and hash-checks the
# loop itself: longest matching prefix, surface = the \w-word at the
# match, offset ordering, (surface, offset) dedup. Same lowercase-ASCII
# corpus precondition as the nb entry (engine regex is IGNORECASE +
# unicode \w; the oracle is case-sensitive ASCII — identical on this
# corpus, asserted in tests/test_denorm_keywords.py).
_DENORM_BACKOFF_SQL = r"""WITH kwd AS (
  SELECT doc_id, text,
         list_transform(
           list_filter(list_slice(string_split(text, ' '), 1, 3),
                       w -> regexp_matches(w, '^[a-z0-9]{2,}$')),
           w -> substring(w, 1, length(w) - 1) || 'q') AS kws
  FROM documents
),
kw AS (SELECT doc_id, text, unnest(kws) AS k FROM kwd),
pref AS (
  SELECT doc_id, text, k,
         unnest(list_transform(range(length(k), 0, -1),
                               i -> substring(k, 1, i::INT))) AS p
  FROM kw
),
hit AS (
  SELECT doc_id, text, k, p, length(p) AS lp
  FROM pref
  WHERE regexp_matches(text, '\b' || p || '([0-9a-zA-Z_]+)?\b')
),
best AS (
  SELECT doc_id, text, k, p FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, k
                                 ORDER BY lp DESC) AS rn
    FROM hit) WHERE rn = 1
),
m AS (
  SELECT doc_id,
         regexp_extract(text,
           '(?s)^.*?\b(' || p || '([0-9a-zA-Z_]+)?)\b', 1) AS surface,
         length(regexp_extract(text,
           '(?s)^(.*?)\b' || p || '([0-9a-zA-Z_]+)?\b', 1)) AS off
  FROM best
),
dedup AS (SELECT DISTINCT doc_id, surface, off FROM m),
agg AS (SELECT doc_id, string_agg(surface, ' ' ORDER BY off) AS dn
        FROM dedup GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.dn, '') AS denormalized
FROM documents d LEFT JOIN agg a USING (doc_id)"""


@gate_query("tx_denorm_backoff", _DENORM_BACKOFF_SQL)
def tx_denorm_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY K5 denormalization with REAL backoff, hash-checked: every
    keyword is a source word whose last char was replaced by 'q', so
    denorm_one's first regex probe fails and the shrink loop must run
    (wapo/parser.py:59-67 semantics). The oracle enumerates the bounded
    prefix ladder in DuckDB and keeps the longest matching prefix —
    pinning the loop, the surface extraction, the match OFFSET ordering
    (keep_order=True), and the (surface, offset) dedup. Keyword
    derivation is pure Catalyst; the operator is the same vectorized
    pandas-UDF path as tx_denorm_keywords."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.expr(
            "transform("
            "  filter(slice(split(text, ' '), 1, 3),"
            "         w -> w rlike '^[a-z0-9]{2,}$'),"
            "  w -> concat(substr(w, 1, length(w) - 1), 'q'))"
        ).alias("keywords"),
    )
    out = T.denormalize_keywords(docs, keywords_col="keywords",
                                 text_col="text")
    return out.select(
        "doc_id",
        F.concat_ws(" ", F.col("denormalized")).alias("denormalized"),
    )


_HL_TERMS = ["table", "merge"]


def _profile_sql() -> str:
    """One wide doc-profile row joining all four text-analysis families —
    lets the driver hash-check lang-id + quality + token counts +
    fingerprints in a single window slot (the single-family entries stay
    registered for direct use)."""
    from .registry import REGISTRY

    lang = REGISTRY["tx_lang_id"].sql
    qual = REGISTRY["tx_quality"].sql
    tok = REGISTRY["tx_token_counts"].sql
    fp = REGISTRY["tx_fingerprints"].sql
    return f"""SELECT l.doc_id, l.pred_lang, l.hits,
       q.n_chars, q.n_tokens, q.mean_token_len, q.punct_ratio,
       q.stopword_ratio, q.quality,
       t.n_ws_tokens, t.n_bpeish_tokens,
       f.fp_content, f.fp_tokenset
FROM ({lang}) l
JOIN ({qual}) q ON q.doc_id = l.doc_id
JOIN ({tok}) t ON t.doc_id = l.doc_id
JOIN ({fp}) f ON f.doc_id = l.doc_id"""


@gate_query("tx_profile", _profile_sql())
def tx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined text-analysis profile per document: language-ID, quality
    scoring, token counting, and fingerprints joined on doc_id (SURVEY
    LLM-pipeline text ops, all pure Catalyst)."""
    docs = load(spark, sf_dir, "documents")
    out = (
        T.lang_id(docs)
        .join(T.quality_features(docs), "doc_id")
        .join(T.token_counts(docs), "doc_id")
        .join(T.fingerprints(docs), "doc_id")
    )
    return out.select(
        "doc_id", "pred_lang", "hits", "n_chars", "n_tokens",
        "mean_token_len", "punct_ratio", "stopword_ratio", "quality",
        "n_ws_tokens", "n_bpeish_tokens", "fp_content", "fp_tokenset",
    )


@gate_query(
    "tx_highlight",
    r"""SELECT doc_id,
       regexp_replace(text, '(?i)\b(merge|table)\b', '<em>\1</em>', 'g')
         AS highlighted,
       regexp_extract(text,
         '(?i)((?:\S+\s+){0,3}(?:merge|table)(?:\s+\S+){0,3})', 1)
         AS fragment
FROM documents""",
)
def tx_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES-style highlighting: whole-word case-insensitive term tagging +
    first-match context fragment, as pure Catalyst regex projections."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return T.highlight(docs, _HL_TERMS, context_words=3).select(
        "doc_id", "highlighted", "fragment"
    )


# --- Gopher-style repetition signals ------------------------------------
_REP_SQL = """WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
g2 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM t WHERE len(toks) >= 2
),
c2 AS (SELECT doc_id, max(cnt)::DOUBLE / sum(cnt)::DOUBLE AS share
       FROM (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
       GROUP BY doc_id),
g3 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
  FROM t WHERE len(toks) >= 3
),
c3 AS (SELECT doc_id, max(cnt)::DOUBLE / sum(cnt)::DOUBLE AS share
       FROM (SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY 1, 2)
       GROUP BY doc_id)
SELECT t.doc_id, len(toks)::BIGINT AS n_tokens,
       round(CASE WHEN len(toks) > 0
                  THEN 1 - len(list_distinct(toks))::DOUBLE / len(toks)
                  ELSE 0.0 END, 6) AS dup_token_frac,
       round(coalesce(c2.share, 0.0), 6) AS top_bigram_share,
       round(coalesce(c3.share, 0.0), 6) AS top_trigram_share
FROM t LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)"""


@gate_query("tx_repetition", _REP_SQL)
def tx_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (duplicate-token fraction,
    top 2/3-gram occurrence share) — the boilerplate/spam filter a
    training pipeline runs next to quality_features. Catalyst-only: the
    max-count is the longest equal-adjacent run of the SORTED per-row
    gram array (no explode/groupBy shuffle); the oracle re-expresses it
    relationally (unnest -> group -> max/sum)."""
    return T.repetition_features(load(spark, sf_dir, "documents"))
