"""Accuracy-statistics helper QA (position_test.cc:563-599 measures)."""

import numpy as np
import pytest

from gnss_sdr_tpu.utils import accuracy


def test_statistics_on_known_gaussian():
    """Gaussian ENU errors with known sigmas reproduce the textbook radii:
    DRMS = sqrt(se^2+sn^2), CEP ~ 0.59(se+sn), SEP ~ 0.51(se+sn+su)."""
    rng = np.random.default_rng(42)
    se, sn, su = 1.0, 1.5, 3.0
    enu = rng.standard_normal((200000, 3)) * [se, sn, su]
    st = accuracy.position_statistics(enu)
    assert st["drms"] == pytest.approx(np.hypot(se, sn), rel=0.02)
    assert st["2drms"] == pytest.approx(2 * np.hypot(se, sn), rel=0.02)
    assert st["cep"] == pytest.approx(0.5887 * (se + sn), rel=0.03)
    assert st["mrse"] == pytest.approx(np.sqrt(se**2 + sn**2 + su**2),
                                       rel=0.02)
    assert st["sep"] == pytest.approx(0.513 * (se + sn + su), rel=0.05)
    assert st["sas_90"] > st["sep"] > 0
    assert st["sas_99"] > st["sas_90"]
    assert np.all(np.abs(st["mean_enu"]) < 0.05)


def test_statistics_bias_and_formatting():
    enu = np.tile([3.0, 4.0, 0.0], (10, 1))     # pure 5 m horizontal bias
    st = accuracy.position_statistics(enu)
    assert st["drms"] == pytest.approx(5.0)
    assert st["cep"] == pytest.approx(5.0)
    assert st["sas_99"] == pytest.approx(5.0)
    txt = accuracy.format_statistics(st, "static")
    assert "DRMS 5.000" in txt and "CEP" in txt and "99% SAS" in txt
    with pytest.raises(ValueError):
        accuracy.position_statistics(np.zeros((4, 2)))
