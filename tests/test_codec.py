"""Codec round-trip + block structure (FIXTURES.md: encode→decode identity)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from invoicenet_spark.index.codec import (
    decode_block,
    decode_posting_list,
    encode_posting_list,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_small():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**35, 2**63], dtype=np.uint64)
    assert (vb_decode(vb_encode(v), count=len(v)) == v).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500))
def test_vb_roundtrip_property(values):
    v = np.array(values, dtype=np.uint64)
    assert (vb_decode(vb_encode(v)) == v).all() or len(values) == 0


def _random_plist(n, seed=0):
    rng = np.random.default_rng(seed)
    doc_ids = np.sort(rng.choice(10 * n, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 300, size=n).astype(np.int64)
    dls = rng.integers(20, 700, size=n).astype(np.int64)
    return doc_ids, tfs, dls


@pytest.mark.parametrize("n", [1, 5, 127, 128, 129, 1000, 5000])
def test_posting_roundtrip(n):
    doc_ids, tfs, dls = _random_plist(n, seed=n)
    row = encode_posting_list(doc_ids, tfs, dls, block_size=128)
    d2, t2, l2 = decode_posting_list(row)
    assert (d2 == doc_ids).all()
    assert (t2 == tfs).all()
    assert (l2 == dls).all()


def test_block_decode_and_metadata():
    n = 1000
    doc_ids, tfs, dls = _random_plist(n, seed=7)
    bs = 128
    row = encode_posting_list(doc_ids, tfs, dls, block_size=bs)
    n_blocks = (n + bs - 1) // bs
    assert len(row["block_last"]) == n_blocks
    for i in range(n_blocks):
        d, t, l = decode_block(row, i, block_size=bs)
        lo, hi = i * bs, min((i + 1) * bs, n)
        assert (d == doc_ids[lo:hi]).all()
        assert (t == tfs[lo:hi]).all()
        assert (l == dls[lo:hi]).all()
        assert row["block_last"][i] == doc_ids[hi - 1]
        assert row["block_max_tf"][i] == tfs[lo:hi].max()
        assert row["block_min_dl"][i] == dls[lo:hi].min()


def test_compression_actually_compresses():
    doc_ids = np.arange(0, 100_000, 3, dtype=np.int64)  # deltas of 3 → 1 byte each
    tfs = np.ones_like(doc_ids)
    dls = np.full_like(doc_ids, 100)
    row = encode_posting_list(doc_ids, tfs, dls)
    assert len(row["doc_blob"]) < doc_ids.size * 2  # ≪ 8 bytes/docID
