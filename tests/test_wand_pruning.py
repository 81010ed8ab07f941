"""Block-max WAND pruning: on idf-skewed postings the algorithm must score
far fewer docs than exist, while staying exactly rank-identical to the
exhaustive path. (The synthetic gate corpus has a tiny flat vocabulary —
every term is hot — so pruning is demonstrated here at the function level
with constructed postings.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from newssearchengine_spark.functions.codec import encode_postings, lucene_idf
from newssearchengine_spark.plans.search import _taat_topk, _wand_topk

K1, B = 1.2, 0.75
N_DOCS = 200_000
AVGDL = 100.0


def _chunk(term, doc_ids, tfs, dls, block_size=128):
    docs_b, tfs_b, dls_b, blast, bmax = encode_postings(
        np.asarray(doc_ids, dtype=np.int64), np.asarray(tfs),
        np.asarray(dls), k1=K1, b=B, avgdl=AVGDL, block_size=block_size,
    )
    return dict(term=term, docs=docs_b, tfs=tfs_b, dls=dls_b,
                block_last=blast.tolist(),
                block_max=bmax.astype(np.float32).tolist())


@pytest.fixture(scope="module")
def skewed():
    """One selective term (df=300, high idf) + two hot terms (df=60k,
    tf=1 everywhere, near-zero idf) — the classic WAND-friendly mix."""
    rng = np.random.default_rng(17)
    rows, idf = [], {}
    sel_ids = np.sort(rng.choice(N_DOCS, size=300, replace=False))
    rows.append(_chunk("selective", sel_ids,
                       rng.integers(2, 8, 300), rng.integers(50, 150, 300)))
    idf["selective"] = float(lucene_idf(N_DOCS, 300.0))
    for name in ("hot1", "hot2"):
        ids = np.sort(rng.choice(N_DOCS, size=60_000, replace=False))
        rows.append(_chunk(name, ids, np.ones(ids.size, dtype=np.int64),
                           rng.integers(50, 150, ids.size)))
        idf[name] = float(lucene_idf(N_DOCS, float(ids.size)))
    return pd.DataFrame(rows), idf


def test_wand_prunes_and_stays_exact(skewed):
    pdf, idf = skewed
    t_ids, t_scores = _taat_topk(pdf, idf, k1=K1, b=B, avgdl=AVGDL, k=10)
    stats: dict = {}
    w_ids, w_scores = _wand_topk(pdf, idf, k1=K1, b=B, avgdl=AVGDL, k=10,
                                 stats=stats)
    assert np.array_equal(w_ids, t_ids)
    np.testing.assert_allclose(w_scores, t_scores, atol=1e-12)
    # pruning: the hot lists hold ~119k candidate docs; WAND must fully
    # score only a small fraction (docs that can possibly beat the top-10
    # threshold, i.e. roughly the selective list plus warm-up)
    assert stats["n_candidates"] > 100_000
    assert stats["n_scored"] < stats["n_candidates"] * 0.05, stats
    assert stats["n_skip_jumps"] > 0


def test_wand_no_pruning_possible_still_exact(skewed):
    """All-hot query (flat scores): nothing prunable, result still exact."""
    pdf, idf = skewed
    hot = pdf[pdf.term != "selective"]
    t = _taat_topk(hot, idf, k1=K1, b=B, avgdl=AVGDL, k=25)
    s: dict = {}
    w = _wand_topk(hot, idf, k1=K1, b=B, avgdl=AVGDL, k=25, stats=s)
    assert np.array_equal(w[0], t[0])
    np.testing.assert_allclose(w[1], t[1], atol=1e-12)
