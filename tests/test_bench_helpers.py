"""bench.py realistic-rect model: COCO size-band mixture + eligibility
fractions feeding the blended production headline."""
import sys

import numpy as np

sys.path.insert(0, ".")


def test_sample_coco_rects_bands_and_bounds():
    from bench import sample_coco_rects

    rng = np.random.RandomState(0)
    r = sample_coco_rects(20000, 640, 1024, rng)
    w = r[:, 2] - r[:, 0]
    h = r[:, 3] - r[:, 1]
    assert (r[:, 0] >= 0).all() and (r[:, 1] >= 0).all()
    assert (r[:, 2] <= 1024).all() and (r[:, 3] <= 640).all()
    assert (w > 0).all() and (h > 0).all()
    # the documented COCO mixture: ~41% small (sqrt-area < 32, x1.25
    # resize => < 40 px), aspect in [1/2, 2]
    side = np.sqrt(w * h)
    assert 0.35 < (side < 40).mean() < 0.48
    assert 0.18 < (side > 120).mean() < 0.32
    ar = w / h
    assert ar.min() > 0.4 and ar.max() < 2.6


def test_eligibility_fractions_ordering():
    from bench import eligibility_fractions

    f = eligibility_fractions(n=4000)
    # one fraction per LADDER rung, smallest window first; each smaller
    # window accepts a subset of the next rung's rects
    from bench import LADDER

    assert len(f) == len(LADDER)
    assert 0.0 < f[0]
    for small, big in zip(f, f[1:]):
        assert small <= big
    assert f[-1] <= 1.0
    # most realistic rects should ride a windowed path
    assert f[-1] > 0.6
