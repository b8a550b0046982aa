"""Codec: varint/delta round-trip (property-based) + block-max correctness."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from es_loaders_spark.codec import (
    BLOCK_SIZE,
    decode_block,
    decode_postings,
    encode_postings,
    tf_norm,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr))) == values


def test_varint_edges():
    edges = [0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63 - 1, 2**64 - 1]
    arr = np.asarray(edges, dtype=np.uint64)
    out = varint_decode(varint_encode(arr))
    assert [int(x) for x in out] == edges
    assert varint_encode(np.asarray([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.asarray([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.asarray([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_decode(b"") .size == 0


@given(st.integers(min_value=1, max_value=1000), st.integers(min_value=0, max_value=99))
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip_property(n, seed):
    rng = np.random.RandomState(seed)
    doc_ids = np.unique(rng.randint(0, 10_000_000, size=n))
    tfs = rng.randint(1, 50, size=doc_ids.size)
    dls = rng.randint(1, 500, size=doc_ids.size)
    blocks = encode_postings(doc_ids, tfs, dls)
    got_docs, got_tfs = decode_postings(blocks)
    assert np.array_equal(got_docs, doc_ids)
    assert np.array_equal(got_tfs, tfs)


def test_blocks_are_independent_and_sized():
    doc_ids = np.arange(0, 1000, 3, dtype=np.int64)
    tfs = np.ones(doc_ids.size, dtype=np.int64)
    dls = np.full(doc_ids.size, 100, dtype=np.int64)
    blocks = encode_postings(doc_ids, tfs, dls)
    assert len(blocks) == -(-doc_ids.size // BLOCK_SIZE)
    # each block decodes on its own (skip support)
    d1, t1 = decode_block(blocks[1])
    assert d1[0] == blocks[1].min_doc and d1[-1] == blocks[1].max_doc
    assert all(b.n <= BLOCK_SIZE for b in blocks)


def test_block_impact_bounds_all_contained():
    """tf_norm(max_tf, min_dl, avgdl) must dominate every posting's tf_norm
    under ANY avgdl — the append-stable query-time bound (codec.py)."""
    rng = np.random.RandomState(7)
    doc_ids = np.unique(rng.randint(0, 100000, size=500))
    tfs = rng.randint(1, 30, size=doc_ids.size)
    dls = rng.randint(10, 400, size=doc_ids.size)
    blocks = encode_postings(doc_ids, tfs, dls)
    for avgdl in (40.0, 120.0, 900.0):
        norms = tf_norm(tfs, dls, avgdl)
        i = 0
        for b in blocks:
            contained = norms[i : i + b.n]
            bound = tf_norm(np.asarray([b.max_tf]), np.asarray([b.min_dl]), avgdl)[0]
            assert bound >= contained.max()
            assert b.max_tf == tfs[i : i + b.n].max()
            assert b.min_dl == dls[i : i + b.n].min()
            i += b.n


def test_unsorted_docids_rejected():
    with pytest.raises(ValueError):
        encode_postings(
            np.asarray([5, 3]), np.asarray([1, 1]), np.asarray([10, 10])
        )


def test_skyline_vectorized_matches_per_block():
    """skyline_payloads_flat is byte-identical to the per-block path."""
    import numpy as np

    from es_loaders_spark.codec import (
        _block_skyline,
        skyline_payloads_flat,
        varint_encode,
    )

    rng = np.random.RandomState(1)
    for _ in range(20):
        n = rng.randint(1, 2000)
        tfs = rng.randint(1, 30, size=n).astype(np.int64)
        dls = rng.randint(1, 500, size=n).astype(np.int64)
        bs = np.arange(0, n, 128, dtype=np.int64)
        be = np.minimum(bs + 128, n)
        st, sd = skyline_payloads_flat(tfs, dls, bs, be)
        for i, (s_, e_) in enumerate(zip(bs, be)):
            t0, d0 = _block_skyline(tfs[s_:e_], dls[s_:e_])
            assert st[i] == varint_encode(t0.astype(np.uint64))
            assert sd[i] == varint_encode(d0.astype(np.uint64))


def test_positions_round_trip():
    """Positional payload round-trip (delta+varint, per-posting resets)."""
    import numpy as np

    from es_loaders_spark.codec import (
        decode_block,
        decode_block_positions,
        encode_blocks_flat,
    )

    rng = np.random.RandomState(0)
    doc_ids, tfs, dls, pos, seg = [], [], [], [], [0]
    for _ in range(3):
        docs = np.sort(rng.choice(10000, size=rng.randint(1, 300), replace=False))
        for d in docs:
            tf = rng.randint(1, 6)
            p = np.sort(rng.choice(500, size=tf, replace=False))
            doc_ids.append(d); tfs.append(tf); dls.append(rng.randint(10, 100))
            pos.extend(p.tolist())
        seg.append(len(doc_ids))
    fb = encode_blocks_flat(
        np.array(doc_ids), np.array(tfs), np.array(dls), np.array(seg),
        positions=np.array(pos),
    )
    got = []
    for i in range(fb["block_id"].size):
        blk = {k: fb[k][i] for k in
               ("min_doc", "max_doc", "n", "max_tf", "min_dl",
                "docs_payload", "tfs_payload", "pos_payload")}
        _, t = decode_block(blk)
        got.append(decode_block_positions(blk, t))
    assert np.array_equal(np.concatenate(got), np.array(pos))


def test_for_payload_round_trip_property():
    """FOR bit-packed payloads round-trip for random widths/sizes, incl.
    b=0 (all-zero), huge-value varint fallback, and partial blocks."""
    import numpy as np

    from es_loaders_spark.codec import pack_payloads, payload_decode

    rng = np.random.RandomState(3)
    for _ in range(40):
        n = rng.randint(1, 1500)
        maxbits = rng.choice([1, 3, 8, 17, 31, 52])
        vals = rng.randint(0, 1 << int(maxbits), size=n).astype(np.uint64)
        if rng.rand() < 0.3:
            vals[rng.randint(n)] = np.uint64(1) << np.uint64(60)  # force varint fallback
        if rng.rand() < 0.3:
            vals[: rng.randint(1, n + 1)] = 0
        bs = np.arange(0, n, 128, dtype=np.int64)
        be = np.minimum(bs + 128, n)
        payloads = pack_payloads(vals, bs, be)
        got = np.concatenate([payload_decode(p) for p in payloads])
        assert np.array_equal(got, vals)


def test_for_payload_smaller_than_varint_on_typical_deltas():
    """Size sanity: unit-tf payloads collapse to 4 bytes; small deltas
    pack below 1 byte/value (varint's floor)."""
    import numpy as np

    from es_loaders_spark.codec import pack_payloads

    zeros = np.zeros(128, dtype=np.uint64)
    bs, be = np.array([0]), np.array([128])
    assert len(pack_payloads(zeros, bs, be)[0]) == 4
    small = np.full(128, 25, dtype=np.uint64)  # 5-bit deltas
    assert len(pack_payloads(small, bs, be)[0]) == 4 + (128 * 5 + 7) // 8  # 84 < 128
