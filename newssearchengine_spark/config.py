"""Engine configuration: analyzer spec + BM25 parameters + index layout.

Plays the role of the ES index settings/mappings the reference declares at
/root/reference/wapo/index_es.py:57-129 (analyzer chain, BM25 similarity,
5-shard layout). Our analog: an explicit, versioned config object shared by
the write path (index build) and the read path (query analysis) so the two
can never diverge — rank-identity depends on it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Code-language keyword stoplist: the code-payload analog of the reference's
# 178-word NLTK english list (/root/reference/data/english_stopwords_nltk.txt,
# loaded at wapo/index_es.py:51-55). Fixed and versioned here — NOT generated.
CODE_STOPWORDS: frozenset[str] = frozenset(
    {
        # python
        "def", "return", "import", "class", "elif", "else", "for", "while",
        "in", "not", "and", "or", "is", "none", "true", "false", "pass",
        "break", "continue", "lambda", "try", "except", "finally", "with",
        "as", "from", "raise", "yield", "global", "nonlocal", "assert", "del",
        "if", "self",
        # java / js / go / rust common keywords
        "public", "private", "protected", "static", "final", "void", "new",
        "this", "extends", "implements", "interface", "package", "throws",
        "throw", "catch", "null", "var", "let", "const", "function",
        "typeof", "instanceof", "switch", "case", "default", "do", "func",
        "type", "struct", "chan", "defer", "go", "map", "range", "select",
        "fn", "impl", "pub", "mut", "use", "mod", "match", "enum", "trait",
        "where", "loop", "ref", "crate", "super", "dyn", "await", "async",
    }
)

# Minimal english stoplist used when analyzing the natural-language
# `documents` test table (role of the NLTK list for news text). Small and
# explicit so the DuckDB oracle can inline it as a SQL literal list.
ENGLISH_MIN_STOPWORDS: frozenset[str] = frozenset(
    {"the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for"}
)

# NLTK-style english stopword list (public standard list; the role of the
# reference's data/english_stopwords_nltk.txt loaded at wapo/index_es.py:51-55).
ENGLISH_NLTK_STOPWORDS: frozenset[str] = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves he
him his himself she her hers herself it its itself they them their theirs
themselves what which who whom this that these those am is are was were be
been being have has had having do does did doing a an the and but if or
because as until while of at by for with about against between into through
during before after above below to from up down in out on off over under
again further then once here there when where why how all any both each few
more most other some such no nor not only own same so than too very s t can
will just don should now d ll m o re ve y ain aren couldn didn doesn hadn
hasn haven isn ma mightn mustn needn shan shouldn wasn weren won wouldn
""".split())


@dataclass(frozen=True)
class AnalyzerConfig:
    """Deterministic analyzer spec (SURVEY.md §2.3, T1-T5). Two modes:

    mode="code" (default — the north-star payload). Pipeline (identical in
    the Catalyst-expression path, the pandas-UDF path, the pure-Python
    oracle, and the DuckDB oracle SQL):
      1. camelCase boundary split:  ([a-z0-9])([A-Z])   -> "x Y"
      2. acronym boundary split:    ([A-Z]+)([A-Z][a-z]) -> "HTTP Server"
      3. lowercase
      4. split on [^a-z0-9]+   (this also splits snake_case at '_')
      5. keep tokens matching ^[a-z][a-z0-9]*$ with length >= min_token_len
         (pure numbers are dropped by the leading-letter rule)
      6. drop stopwords
    No stemming: code identifiers must round-trip exactly (SURVEY.md T5).

    mode="news" — the reference's WAPO english analyzer chain
    (wapo/index_es.py:65-91): standard word tokenize -> possessive
    's-strip -> lowercase -> NLTK stoplist -> Porter stem. Runs via the
    Arrow pandas-UDF path (stemming is not regex-expressible); min_token_len
    is not applied (the reference's chain has no length filter).
    """

    stopwords: frozenset[str] = CODE_STOPWORDS
    min_token_len: int = 2
    mode: str = "code"  # "code" | "news" | "german"


def news_analyzer() -> AnalyzerConfig:
    """The reference's WAPO english analyzer (stop list + Porter)."""
    return AnalyzerConfig(stopwords=ENGLISH_NLTK_STOPWORDS, min_token_len=1,
                          mode="news")


def german_analyzer() -> AnalyzerConfig:
    """ES's built-in `german` analyzer — what the reference's netzpolitik
    half indexes with (/root/reference/netzpolitik/index_es.py:56,66):
    standard tokenize -> lowercase -> German stoplist -> umlaut/eszett
    normalization -> light German stemmer. Semantics pinned by the
    reference's own ES golden fixtures (test/netzpolitik/test_parse.py:
    40-104), asserted in tests/test_german_analyzer.py."""
    from .functions.german import GERMAN_STOPWORDS

    return AnalyzerConfig(stopwords=GERMAN_STOPWORDS, min_token_len=1,
                          mode="german")


@dataclass(frozen=True)
class BM25Config:
    """Okapi BM25 with the Lucene idf form and GLOBAL corpus stats.

    k1/b are the ES/Lucene defaults the reference relies on (similarity
    declared, params not overridden: wapo/index_es.py:97,103). We keep the
    classic (k1+1) numerator; constant positive factor per term => rank order
    identical to Lucene's simplified form. Global N/avgdl (ES 7 scores
    shard-locally — a known rank instability we deliberately fix; our oracle
    defines rank-identity with global stats).
    """

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    """Physical layout of the posting-segment table.

    Segment rows are keyed (term_bucket, term, doc_part):

    - term_bucket = crc32(term) % n_buckets — the partition column of the
      segment table. Plays the role of ES's 5 shards (wapo/index_es.py:62)
      on the read side: a query prunes the directory scan to exactly the
      buckets of its terms.
    - doc_part = doc_id // doc_range — the SALT that splits skewed hot
      terms (north rule): a term's postings are chunked into fixed,
      globally-aligned doc-id ranges, so no single build task or query task
      ever holds a whole hot term's postings, and — because the ranges are
      the same for every term — the query side can group chunks by doc_part
      and run doc-at-a-time block-max WAND with correct multi-term score
      sums (doc alignment is what a purely term-sharded layout loses).

    Build = ONE shuffle on (term_bucket, doc_part); group sizes are
    structurally bounded by tokens-per-range / n_buckets regardless of term
    skew. Global df/cf live in a separate term_stats table (Catalyst
    partial+final agg — map-side combine absorbs hot terms there).
    """

    n_buckets: int = 32
    doc_range: int = 1 << 20       # docs per doc_part chunk (the hot-term salt)
    block_size: int = 128          # postings per block-max block
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)
    bm25: BM25Config = field(default_factory=BM25Config)
    # Store per-posting token positions (delta+varbyte sidecar column) so
    # phrase queries are an INDEX operation (ES stores positions via
    # term_vector:'yes', wapo/index_es.py:99 — a phrase query must not
    # re-scan the corpus at 100 TB scale). Costs ~1 extra varbyte
    # stream per posting at build; disable for pure-disjunction workloads.
    with_positions: bool = True
    # Store per-doc term vectors (doc_id, term, tf) partitioned by
    # doc_part — the forward index ES keeps for term_vector:'yes' and
    # serves via es.termvectors (the reference's keyword extraction,
    # wapo/parser.py:10-47, reads exactly this). Opt-in like ES: it
    # roughly doubles the index's storage footprint.
    with_term_vectors: bool = False
