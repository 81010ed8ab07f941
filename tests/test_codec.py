"""Posting codec: varbyte/delta roundtrips + block-max bound safety."""

from __future__ import annotations

import numpy as np
import pytest

from newssearchengine_spark.functions.codec import (
    decode_postings,
    encode_postings,
    tf_norm,
    vb_decode,
    vb_encode,
)


@pytest.mark.parametrize("seed", range(5))
def test_varbyte_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        bits = int(rng.integers(1, 64))
        n = int(rng.integers(0, 3000))
        vals = rng.integers(0, 1 << bits, size=n).astype(np.uint64)
        assert np.array_equal(vb_decode(vb_encode(vals)), vals)


def test_varbyte_edge_values():
    edge = np.array(
        [0, 1, 127, 128, 16383, 16384, 1 << 35, 1 << 56, (1 << 63) - 1,
         (1 << 64) - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(vb_decode(vb_encode(edge)), edge)
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_postings_roundtrip_and_blockmax():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10**12, size=5000)).astype(np.int64)
    tfs = rng.integers(1, 900, size=ids.size)
    dls = rng.integers(1, 20000, size=ids.size)
    k1, b, avgdl, bs = 1.2, 0.75, 432.1, 128
    d, t, l, blast, bmax = encode_postings(ids, tfs, dls, k1=k1, b=b,
                                           avgdl=avgdl, block_size=bs)
    i2, t2, l2 = decode_postings(d, t, l)
    assert np.array_equal(i2, ids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)
    tfn = tf_norm(tfs.astype(float), dls.astype(float), k1=k1, b=b, avgdl=avgdl)
    n_blocks = (ids.size + bs - 1) // bs
    assert blast.size == bmax.size == n_blocks
    for i in range(n_blocks):
        lo, hi = i * bs, min((i + 1) * bs, ids.size)
        assert blast[i] == ids[hi - 1]
        assert bmax[i] >= tfn[lo:hi].max()  # bound never underestimates


def test_unsorted_doc_ids_rejected():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 2]), np.array([1, 1]), np.array([5, 5]),
                        k1=1.2, b=0.75, avgdl=10.0, block_size=4)


# ---- property-based round-trip (hypothesis) --------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    postings = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),   # doc id gaps well past 32-bit
            st.integers(min_value=1, max_value=10_000),  # tf
            st.integers(min_value=1, max_value=100_000), # dl
        ),
        min_size=0, max_size=300,
    )

    @settings(max_examples=200, deadline=None)
    @given(postings, st.integers(min_value=1, max_value=64))
    def test_roundtrip_property(rows, block_size):
        """encode->decode is the identity for ANY strictly-increasing id
        list, and every block's max tf-norm bound is >= the true per-row
        tf-norm in that block (rank-safety of WAND pruning)."""
        import numpy as np

        from newssearchengine_spark.functions.codec import (
            decode_postings, encode_postings, tf_norm,
        )

        ids = np.cumsum(np.array([r[0] + 1 for r in rows], dtype=np.int64))
        tfs = np.array([r[1] for r in rows], dtype=np.int64)
        dls = np.array([r[2] for r in rows], dtype=np.int64)
        k1, b, avgdl = 1.2, 0.75, 37.5
        docs_b, tfs_b, dls_b, blast, bmax = encode_postings(
            ids, tfs, dls, k1=k1, b=b, avgdl=avgdl, block_size=block_size
        )
        out_ids, out_tfs, out_dls = decode_postings(docs_b, tfs_b, dls_b)
        assert np.array_equal(out_ids, ids)
        assert np.array_equal(out_tfs, tfs)
        assert np.array_equal(out_dls, dls)
        if ids.size:
            tfn = tf_norm(tfs.astype(np.float64), dls.astype(np.float64),
                          k1=k1, b=b, avgdl=avgdl)
            # block index of each row
            bi = np.searchsorted(blast, ids, "left")
            # float32 storage rounds UP at encode: bound must still hold
            assert np.all(np.asarray(bmax, dtype=np.float64)[bi] >= tfn)  # exact: encode rounds up
            assert int(blast[-1]) == int(ids[-1])


@pytest.mark.parametrize("seed", range(3))
def test_positions_roundtrip_random(seed):
    from newssearchengine_spark.functions.codec import (decode_positions,
                                                        encode_positions)

    rng = np.random.default_rng(100 + seed)
    for _ in range(30):
        n_docs = int(rng.integers(0, 40))
        lists = [
            np.sort(rng.choice(5000, size=int(rng.integers(1, 30)),
                               replace=False)).astype(np.int64)
            for _ in range(n_docs)
        ]
        tfs = np.array([len(x) for x in lists], dtype=np.int64)
        flat = (np.concatenate(lists) if lists
                else np.empty(0, dtype=np.int64))
        blob = encode_positions(flat, tfs)
        assert np.array_equal(decode_positions(blob, tfs), flat)


def test_positions_length_mismatch_rejected():
    from newssearchengine_spark.functions.codec import encode_positions

    with pytest.raises(ValueError):
        encode_positions(np.array([0, 1, 2]), np.array([2]))


@pytest.mark.parametrize("seed", range(2))
def test_positions_pack_expr_matches_numpy(spark, seed):
    """The pre-shuffle Catalyst packer is bit-identical to
    encode_positions: per row it must produce that row's varbyte run
    (first position absolute, rest gaps), and the doc-order byte-join of
    rows equals the per-term blob the segment encoder used to build
    post-shuffle. Values straddle every varbyte width up to 2^35."""
    from pyspark.sql import functions as F

    from newssearchengine_spark.functions.codec import (decode_positions,
                                                        encode_positions,
                                                        positions_pack_expr)

    rng = np.random.default_rng(2000 + seed)
    lists = [
        np.sort(rng.choice(int(hi), size=int(rng.integers(1, 25)),
                           replace=False)).astype(np.int64)
        for hi in (64, 5000, 1 << 20, (1 << 35) - 1)
        for _ in range(15)
    ]
    lists.append(np.array([0], dtype=np.int64))  # chr(0)/first-abs-0 edge
    rows = [(i, x.tolist()) for i, x in enumerate(lists)]
    df = spark.createDataFrame(rows, "row_id long, positions array<long>")
    got = {
        r["row_id"]: bytes(r["blob"])
        for r in df.select(
            "row_id",
            positions_pack_expr(F.col("positions")).alias("blob"),
        ).collect()
    }
    for i, x in enumerate(lists):
        want = encode_positions(x, np.array([len(x)], dtype=np.int64))
        assert got[i] == want, i
    # concat property: joined per-row blobs == whole-list encoding
    tfs = np.array([len(x) for x in lists], dtype=np.int64)
    joined = b"".join(got[i] for i in range(len(lists)))
    assert joined == encode_positions(np.concatenate(lists), tfs)
    assert np.array_equal(decode_positions(joined, tfs), np.concatenate(lists))
