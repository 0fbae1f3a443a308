"""SmallFloat invariants — style of the reference's TestSmallFloat
(exhaustive low range, sampled high range, monotonicity, exactness)."""

import numpy as np
import pytest

from lucene_spark.util import smallfloat as sf


def test_free_values_constant():
    # reference: NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) == 24
    assert sf.NUM_FREE_VALUES == 24


def test_exact_below_free_values():
    for x in range(sf.NUM_FREE_VALUES):
        assert sf.byte4_to_int(sf.int_to_byte4(x)) == x


def test_round_trip_never_exceeds():
    xs = list(range(4096)) + [2**i for i in range(4, 31)] + [2**31 - 1]
    for x in xs:
        d = sf.byte4_to_int(sf.int_to_byte4(x))
        assert d <= x
        # next encodable value is > x (tight quantization)
        b = sf.int_to_byte4(x)
        if b < 255:
            assert sf.byte4_to_int(b + 1) > x


def test_monotone():
    enc = sf.int_to_byte4_np(np.arange(0, 2**20, 13))
    assert (np.diff(enc.astype(np.int64)) >= 0).all()


def test_vectorized_matches_scalar():
    xs = np.concatenate(
        [np.arange(0, 1025), np.array([2**31 - 1, 123456789, 65535, 24, 23])]
    )
    enc = sf.int_to_byte4_np(xs)
    dec = sf.byte4_to_int_np(enc)
    for x, e, d in zip(xs, enc, dec):
        assert e == sf.int_to_byte4(int(x))
        assert d == sf.byte4_to_int(int(e))


def test_negative_rejected():
    with pytest.raises(ValueError):
        sf.int_to_byte4(-1)
