"""Native TSV codec: exactness vs the python reference + fallback behavior."""
import os

import numpy as np
import pytest

from cpt_tpu.utils import native
from cpt_tpu.utils.tsv import (TSVFile, decode_feature, decode_features,
                               encode_features, lineidx_path, tsv_writer)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_decode_exact(rng):
    feats = rng.randn(37, 517).astype(np.float32)
    enc = encode_features(feats)
    out = native.decode_features_native(enc, 517)
    np.testing.assert_array_equal(out, feats)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_decode_rejects_garbage():
    assert native.decode_features_native(["!!notbase64!!"], 4) is None


def test_decode_features_dispatch(rng):
    """decode_features must give identical results with or without the
    native path (mixed-length rows force the python fallback)."""
    feats = rng.randn(5, 64).astype(np.float32)
    enc = encode_features(feats)
    np.testing.assert_array_equal(decode_features(enc), feats)
    # single row takes the scalar path
    np.testing.assert_array_equal(decode_features(enc[:1]), feats[:1])


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_lineidx_matches_python(tmp_path):
    path = str(tmp_path / "t.tsv")
    tsv_writer([[str(i), "v" * (i % 7)] for i in range(500)], path)
    with open(lineidx_path(path)) as f:
        expected = [int(x) for x in f]
    got = native.scan_lineidx_native(path)
    assert got == expected
