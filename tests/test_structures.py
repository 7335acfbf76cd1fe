"""COCO RLE mask codec (pycocotools.mask replacement)."""
import numpy as np


def test_rle_codec_roundtrip_and_known_vectors():
    from cpt_tpu.utils import rle as R

    # known vectors (COCO 5-bit chunks, chr(c+48))
    zeros = np.zeros((3, 3), np.uint8)
    assert R.encode(zeros)["counts"] == "9"          # single run of 9
    col = np.zeros((3, 3), np.uint8)
    col[:, 0] = 1                                     # col-major: 3 ones first
    assert R.encode(col)["counts"] == "036"
    np.testing.assert_array_equal(R.decode({"size": [3, 3],
                                            "counts": "036"}), col)

    rng = np.random.RandomState(0)
    for shape in [(23, 17), (1, 1), (5, 40)]:
        m = (rng.rand(*shape) > 0.6).astype(np.uint8)
        e = R.encode(m)
        np.testing.assert_array_equal(R.decode(e), m)
        assert R.area(e) == int(m.sum())
        # uncompressed list counts round-trip too
        e2 = R.encode(m, compress=False)
        np.testing.assert_array_equal(R.decode(e2), m)


def test_rle_bbox_and_merge():
    from cpt_tpu.utils import rle as R

    box = np.zeros((10, 12), np.uint8)
    box[2:6, 3:9] = 1
    np.testing.assert_array_equal(R.to_bbox(R.encode(box)), [3, 2, 6, 4])

    other = np.zeros((10, 12), np.uint8)
    other[7:9, 0:2] = 1
    union = R.decode(R.merge([R.encode(box), R.encode(other)]))
    np.testing.assert_array_equal(union, box | other)
    inter = R.decode(R.merge([R.encode(box), R.encode(other)],
                             intersect=True))
    assert inter.sum() == 0

    # negative-count sign-extension path: a run longer than 2^4 after
    # difference coding exercises the 0x10 sign bit
    long = np.zeros((40, 40), np.uint8)
    long[:, 20:] = 1
    e = R.encode(long)
    np.testing.assert_array_equal(R.decode(e), long)
