"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input shape mandated by BASELINE.json input_hint:
  (repo string, path string, commit string, lang string, content string)

Generation is a pure function of (seed, row index) — Philox counter-based
RNG keyed per row — so the corpus is identical regardless of partitioning,
parallelism, or generation order (required for cross-parallelism
rank-identity checks). Distributed: spark.range(n) -> mapInPandas, no
driver-side materialization.

Content: pseudo-code mixing camelCase/snake_case identifiers, language
keywords, symbols and string literals. Identifier frequencies are
Zipf(s=1.2) over a fixed 500-identifier vocabulary, so a handful of terms
are very hot (skew-path coverage) and tf/df stats are interesting at small
scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "java", "js", "go", "rs"]
LANG_W = [0.35, 0.2, 0.2, 0.15, 0.1]

_WORDS = (
    "get set add run map list node tree hash sort scan read write open close "
    "load store push pull send recv pack parse build merge split join batch "
    "queue stack cache index shard chunk block token buffer stream record "
    "field value count total delta gamma sigma alpha beta proto config state "
    "result status error retry limit offset cursor window frame page slot "
    "user group role item order event trace audit metric gauge probe signal"
).split()

KEYWORDS = ["def", "return", "import", "class", "if", "else", "for", "while",
            "try", "break", "public", "static", "void", "func", "let", "const"]

VOCAB_SIZE = 500


def _make_vocab(seed: int = 42) -> list[str]:
    """500 deterministic identifiers: half camelCase, half snake_case."""
    rng = np.random.default_rng(seed)
    vocab = []
    seen = set()
    while len(vocab) < VOCAB_SIZE:
        a, b = rng.choice(len(_WORDS), size=2)
        w1, w2 = _WORDS[int(a)], _WORDS[int(b)]
        if len(vocab) % 2 == 0:
            ident = w1 + w2.capitalize()
        else:
            ident = f"{w1}_{w2}"
        if ident not in seen:
            seen.add(ident)
            vocab.append(ident)
    return vocab


VOCAB = _make_vocab()


def _content_for(i: int, seed: int) -> str:
    """Pseudo-code content for row i — pure function of (seed, i)."""
    rng = np.random.default_rng(np.random.Philox(key=seed, counter=i))
    n_lines = int(rng.integers(5, 25))
    # Zipf(s=1.2) ranks clipped into the vocab => hot head, long tail
    lines = []
    for _ in range(n_lines):
        n_idents = int(rng.integers(2, 7))
        ranks = np.minimum(rng.zipf(1.2, size=n_idents), VOCAB_SIZE) - 1
        idents = [VOCAB[int(r)] for r in ranks]
        kw = KEYWORDS[int(rng.integers(0, len(KEYWORDS)))]
        tmpl = int(rng.integers(0, 4))
        if tmpl == 0:
            lines.append(f"{kw} {idents[0]}({', '.join(idents[1:3])}):")
        elif tmpl == 1:
            lines.append(f"    {idents[0]} = {idents[1]}({', '.join(idents[2:])})")
        elif tmpl == 2:
            lines.append(f"    {kw} {idents[0]}.{idents[1]} + \"{idents[-1]}\"")
        else:
            lines.append(f"    {idents[0]}[{int(rng.integers(0, 100))}] = {idents[1]}")
    return "\n".join(lines)


def source_files(spark: SparkSession, n_rows: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    """Distributed generator: n_rows of (repo, path, commit, lang, content)."""
    schema = "repo string, path string, commit string, lang string, content string"

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            repos, paths, commits, langs, contents = [], [], [], [], []
            for i in idx:
                i = int(i)
                rng = np.random.default_rng(np.random.Philox(key=seed + 1, counter=i))
                repo = f"org{i % 7}/repo{i % 23}"
                lang = LANGS[int(rng.choice(len(LANGS), p=LANG_W))]
                module = _WORDS[i % len(_WORDS)]
                name = VOCAB[i % VOCAB_SIZE].replace("_", "")
                path = f"src/{module}/{name}_{i}.{lang}"
                commit = hashlib.sha1(f"{seed}:{repo}:{i}".encode()).hexdigest()
                repos.append(repo); paths.append(path); commits.append(commit)
                langs.append(lang); contents.append(_content_for(i, seed))
            yield pd.DataFrame({"repo": repos, "path": paths, "commit": commits,
                                "lang": langs, "content": contents})

    base = spark.range(0, n_rows, numPartitions=partitions or 32)
    return base.mapInPandas(gen, schema=schema)
