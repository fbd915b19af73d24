"""Bool coder loopback property test, mirroring the reference's
encode-loopback test (tests/encode-loopback.cc: random (prob, bit) pairs
must round-trip exactly through BoolEncoder -> BoolDecoder)."""
import numpy as np
import pytest

from alfalfa_tpu.bitstream.boolcoder import BoolDecoder, BoolEncoder, tree_path
from alfalfa_tpu.bitstream import tables


@pytest.mark.parametrize("seed", range(8))
def test_loopback_random(seed):
    rng = np.random.RandomState(seed)
    n = 10000
    probs = rng.randint(1, 256, n)
    bits = rng.randint(0, 2, n)

    enc = BoolEncoder()
    for p, b in zip(probs, bits):
        enc.put(int(b), int(p))
    data = enc.finish()

    dec = BoolDecoder(data)
    for p, b in zip(probs, bits):
        assert dec.get(int(p)) == b


def test_loopback_extreme_probs():
    # long runs at extreme probabilities exercise carry propagation
    enc = BoolEncoder()
    seq = [(1, 255)] * 500 + [(0, 1)] * 500 + [(1, 128)] + [(1, 255)] * 500
    for b, p in seq:
        enc.put(b, p)
    data = enc.finish()
    dec = BoolDecoder(data)
    for b, p in seq:
        assert dec.get(p) == b


def test_uint_sint_roundtrip():
    enc = BoolEncoder()
    values = [(5, 7), (0, 7), (127, 7), (3, 2), (1, 1)]
    svalues = [(-5, 6), (5, 6), (0, 6), (-63, 6)]
    for v, w in values:
        enc.put_uint(v, w)
    for v, w in svalues:
        enc.put_sint(v, w)
    dec = BoolDecoder(enc.finish())
    for v, w in values:
        assert dec.get_uint(w) == v
    for v, w in svalues:
        assert dec.get_sint(w) == v


def test_tree_roundtrip_all_leaves():
    for tree_arr, nleaves in [
        (tables.KF_Y_MODE_TREE, 5), (tables.Y_MODE_TREE, 5),
        (tables.UV_MODE_TREE, 4), (tables.B_MODE_TREE, 10),
        (tables.MV_REF_TREE, 5), (tables.SUBMV_REF_TREE, 4),
        (tables.SPLIT_MV_TREE, 4), (tables.SEGMENT_ID_TREE, 4),
        (tables.SMALL_MV_TREE, 8),
    ]:
        probs = np.full(len(tree_arr) // 2, 128, np.uint8)
        leaves = sorted({-v for v in tree_arr if v <= 0})
        assert len(leaves) == nleaves
        enc = BoolEncoder()
        for leaf in leaves:
            enc.tree(tree_arr, probs, leaf)
        dec = BoolDecoder(enc.finish())
        for leaf in leaves:
            assert dec.tree(tree_arr, probs) == leaf


def test_truncated_chunk_detection():
    enc = BoolEncoder()
    for i in range(100):
        enc.put(i % 2, 128)
    data = enc.finish()
    dec = BoolDecoder(data[:3], complete=False)
    for _ in range(200):
        dec.get(128)
    assert not dec.valid
    # a complete (but short) chunk zero-extends silently
    dec2 = BoolDecoder(data[:3], complete=True)
    for _ in range(200):
        dec2.get(128)
    assert dec2.valid
