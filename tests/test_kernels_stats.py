"""Stat kernels vs independent formula transcriptions (cellstats.hpp,
src/pointzonalstats.cpp:281-294, src/raster.cpp:58-113)."""

import numpy as np
import pytest

from geotools_ray.kernels import stats as S


@pytest.fixture
def v():
    rng = np.random.RandomState(7)
    return rng.normal(10, 5, size=101)


def test_median_even_odd():
    assert S.ref_median(np.array([3.0, 1.0, 2.0])) == 2.0
    assert S.ref_median(np.array([4.0, 1.0, 3.0, 2.0])) == 2.5
    assert S.ref_median(np.array([])) == S.NODATA


def test_quantile_nearest_rank_up():
    vals = np.arange(10, dtype=float)  # sorted 0..9, cnt=10
    q = S.ref_quantiles(vals, 4)  # quartiles: 6 values incl min/max
    import math

    want = [vals[int(math.ceil(i / 5 * 9))] for i in range(6)]
    assert q.tolist() == want
    assert q[0] == 0.0 and q[-1] == 9.0


def test_variance_matches_two_pass(v):
    m = v.sum() / len(v)
    assert S.ref_variance(v, True) == pytest.approx(((v - m) ** 2).sum() / (len(v) - 1))
    assert S.ref_variance(v, False) == pytest.approx(((v - m) ** 2).sum() / len(v))


def test_skew_kurtosis_reference_quirks(v):
    m = v.sum() / len(v)
    s = np.sqrt(((v - m) ** 2).sum() / (len(v) - 1))
    assert S.ref_skewness(v) == pytest.approx(((v - m) ** 3 / len(v)).sum() / s**3)
    # kurtosis with unfiltered count bug: filtered 50 values of a 101 group
    filt = v[:50]
    mf = filt.sum() / 50
    sf = np.sqrt(((filt - mf) ** 2).sum() / 49)
    want = ((filt - mf) ** 4 / 101).sum() / sf**4 - 3.0
    assert S.ref_kurtosis(filt, unfiltered_count=101) == pytest.approx(want)


def test_welford_merge_matches_single_pass(v):
    parts = np.array_split(v, 7)
    acc = (0, 0.0, 0.0)
    for p in parts:
        acc = S.welford_merge(acc, S.welford_partial(p))
    n, m, m2 = acc
    assert n == len(v)
    assert m == pytest.approx(v.mean())
    assert m2 / n == pytest.approx(v.var())


def test_normalize_reference_bug():
    # mean divides by TOTAL size incl nodata; divisor is sqrt(SS) not sigma
    vals = np.array([1.0, 2.0, S.NODATA, 3.0])
    out = S.normalize_reference(vals, total_size=4)
    mean = 6.0 / 4
    sd = np.sqrt((1 - mean) ** 2 + (2 - mean) ** 2 + (3 - mean) ** 2)
    assert out[0] == pytest.approx((1 - mean) / sd)
    assert out[2] == S.NODATA


def test_gap_fractions():
    intensity = np.array([10, 20, 30, 40, 50], dtype=float)
    cls = np.array([2, 1, 2, 1, 1])
    rn = np.array([1, 1, 2, 2, 1])
    nr = np.array([1, 2, 2, 3, 1])
    # IR: canopy intensity / total
    assert S.gap_fraction_ir(intensity, cls) == pytest.approx((20 + 40 + 50) / 150)
    # BLa: 1 - sqrt(gnd / sum(cls<2))
    assert S.gap_fraction_bla(intensity, cls) == pytest.approx(
        1 - np.sqrt((10 + 30) / (20 + 40 + 50))
    )
    # RR: canopy count / total
    assert S.gap_fraction_rr(cls) == pytest.approx(3 / 5)
    # FR: first returns only
    fst = (nr > 0) & (rn == 1)
    canopy = (fst & (cls != 2)).sum()
    assert S.gap_fraction_fr(cls, rn, nr) == pytest.approx(canopy / fst.sum())
    # BLb transcription
    g = cls == 2
    sgl = nr == 1
    lst = (nr > 0) & (rn == nr)
    mid = (nr > 2) & (rn > 1) & (rn < nr)
    total = intensity.sum()
    denom = (intensity[fst].sum() + intensity[sgl].sum()) / total + np.sqrt(
        (intensity[mid].sum() + intensity[lst].sum()) / total
    )
    want = (
        intensity[g & sgl].sum() / total + np.sqrt(intensity[g & lst].sum() / total)
    ) / denom
    assert S.gap_fraction_blb(intensity, cls, rn, nr) == pytest.approx(want)


def test_empty_inputs_nodata():
    e = np.array([])
    for name, fn in S.STAT_KERNELS.items():
        if name == "count":
            assert fn(e) == 0.0
        else:
            assert fn(e) == S.NODATA
