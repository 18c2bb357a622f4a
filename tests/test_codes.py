"""PRN code generator tests.

Modeled on the reference's ``code_generation_test.cc`` plus spec property
tests (Gold-code cross-correlation levels, m-sequence autocorrelation).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.models import codes


def _octal_first10(chips):
    bits = ((1.0 - chips[:10]) / 2.0).astype(int)
    return int("".join(str(b) for b in bits), 2)


# IS-GPS-200 Table 3-Ia "first 10 chips" column (octal)
GPS_CA_FIRST10 = {1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744,
                  5: 0o1133, 6: 0o1455, 10: 0o1504, 19: 0o1633}


@pytest.mark.parametrize("prn,expected", sorted(GPS_CA_FIRST10.items()))
def test_gps_ca_first_chips(prn, expected):
    assert _octal_first10(codes.gps_l1ca_code(prn)) == expected


def test_gps_ca_gold_properties():
    c1 = codes.gps_l1ca_code(1)
    c7 = codes.gps_l1ca_code(7)
    xc = np.round(np.fft.ifft(np.fft.fft(c1) * np.conj(np.fft.fft(c7))).real)
    assert set(np.unique(xc)) <= {-65.0, -1.0, 63.0}
    ac = np.fft.ifft(np.fft.fft(c1) * np.conj(np.fft.fft(c1))).real
    assert abs(ac[0] - 1023.0) < 1e-2
    assert np.abs(ac[1:]).max() < 66.0


def test_gps_ca_all_prns_distinct():
    all_codes = np.stack([codes.gps_l1ca_code(p) for p in range(1, 33)])
    # pairwise distinct and balanced-ish
    assert len({tuple(c) for c in all_codes.astype(int)}) == 32
    assert np.all(np.abs(all_codes.sum(axis=1)) <= 1.01)


def test_glonass_msequence():
    g = codes.glonass_ca_code()
    assert len(g) == 511
    ac = np.fft.ifft(np.fft.fft(g) * np.conj(np.fft.fft(g))).real
    # ideal m-sequence: all off-peak lags exactly -1
    assert np.allclose(ac[1:], -1.0, atol=1e-3)


@pytest.mark.parametrize("fn,length", [
    (codes.gps_l2cm_code, 10230),
    (codes.gps_l5i_code, 10230),
    (codes.gps_l5q_code, 10230),
    (codes.galileo_e1b_code, 4092),
    (codes.galileo_e1c_code, 4092),
    (codes.galileo_e5ai_code, 10230),
    (codes.galileo_e5aq_code, 10230),
    (codes.beidou_b1i_code, 2046),
    (codes.beidou_b3i_code, 10230),
])
def test_code_lengths_and_autocorr(fn, length):
    c = fn(1)
    assert c.shape == (length,)
    assert c.dtype == np.float32
    assert set(np.unique(c)) == {-1.0, 1.0}
    ac = np.fft.ifft(np.fft.fft(c) * np.conj(np.fft.fft(c))).real
    assert abs(ac[0] - length) < 0.1
    # spreading codes have low off-peak autocorrelation
    assert np.abs(ac[10:-10]).max() < 0.12 * length


def test_codes_distinct_across_prns():
    for fn in (codes.gps_l2cm_code, codes.gps_l5i_code, codes.galileo_e1b_code,
               codes.galileo_e5ai_code, codes.beidou_b1i_code, codes.beidou_b3i_code):
        a, b = fn(1), fn(2)
        assert not np.array_equal(a, b)


def test_sample_code_zero_order_hold():
    chips = codes.gps_l1ca_code(1)
    fs = 4e6
    s = codes.sample_code(chips, fs, 1.023e6, 4000)
    # chip boundaries: sample n belongs to chip floor(n*1.023/4)
    n = np.arange(4000)
    expect = chips[(n * 1.023e6 / fs).astype(np.int64) % 1023]
    assert np.array_equal(s, expect)


def test_sample_code_boc11():
    chips = codes.galileo_e1b_code(1)
    fs = 8.184e6  # 8 samples per chip -> 4 per half-subcarrier
    s = codes.sample_code(chips, fs, 1.023e6, 64, boc_rate=1.023e6)
    # BOC(1,1): first half of each chip = +chip, second half = -chip
    expect = np.repeat(chips[:8], 8) * np.tile([1, 1, 1, 1, -1, -1, -1, -1], 8)
    assert np.array_equal(s, expect.astype(np.float32))


def test_secondary_codes():
    assert codes.galileo_e1c_secondary_code().shape == (25,)
    assert codes.galileo_e5aq_secondary_code(1).shape == (100,)
