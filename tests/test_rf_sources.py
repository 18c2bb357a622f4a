"""RF front-end driver abstraction tests (reference: the hardware
signal-source adapters, uhd_signal_source.cc:60 / osmosdr_signal_source.cc
:47): a UHD/osmosdr conf must load, configure gain/rate/freq against the
driver layer, and stream — from the mock driver in this environment."""

import numpy as np
import pytest

from gnss_sdr_tpu.config import ini, registry
from gnss_sdr_tpu.io import rf_driver


def _uhd_conf(**extra):
    conf = ini.InMemoryConfiguration()
    conf.set_property("SignalSource.implementation", "UHD_Signal_Source")
    conf.set_property("SignalSource.sampling_frequency", 4_000_000)
    conf.set_property("SignalSource.freq", 1_575_420_000)
    conf.set_property("SignalSource.gain", 50)
    conf.set_property("SignalSource.antenna", "TX/RX")
    conf.set_property("SignalSource.subdevice", "A:0")
    for k, v in extra.items():
        conf.set_property(k, v)
    return conf


def test_uhd_conf_mock_driver_configures_and_streams():
    conf = _uhd_conf(**{"SignalSource.driver": "mock"})
    src = ini.source_from_ini(conf)
    assert isinstance(src, rf_driver.RfSignalSource)
    d = src.driver
    assert d.cfg.sampling_frequency == 4_000_000
    assert d.cfg.center_freq_hz == 1_575_420_000
    assert d.cfg.gain_db == 50 and d.cfg.antenna == "TX/RX"
    assert d.cfg.subdevice == "A:0"
    x = src.read(4096)
    assert x.dtype == np.complex64 and len(x) == 4096
    # gain scales the mock noise amplitude (a front-end-like AGC check)
    hi = float(np.std(x))
    src.close()
    conf2 = _uhd_conf(**{"SignalSource.driver": "mock",
                         "SignalSource.gain": 20})
    src2 = ini.source_from_ini(conf2)
    lo = float(np.std(src2.read(4096)))
    assert hi > 10 * lo
    src2.close()
    assert not src2.driver.started


def test_osmosdr_conf_mock_driver():
    conf = ini.InMemoryConfiguration()
    conf.set_property("SignalSource.implementation", "Osmosdr_Signal_Source")
    conf.set_property("SignalSource.sampling_frequency", 2_000_000)
    conf.set_property("SignalSource.freq", 1_575_420_000)
    conf.set_property("SignalSource.rf_gain", 30)
    conf.set_property("SignalSource.if_gain", 25)
    conf.set_property("SignalSource.osmosdr_args", "rtl=0")
    conf.set_property("SignalSource.driver", "mock")
    src = ini.source_from_ini(conf)
    assert src.driver.cfg.rf_gain_db == 30
    assert src.driver.cfg.if_gain_db == 25
    assert src.driver.cfg.device_args == "rtl=0"
    assert len(src.read(100)) == 100
    src.close()


def test_hardware_source_rejected_without_driver():
    """Without driver=mock (and without the vendor python lib) the conf is
    rejected at validation with an actionable message."""
    conf = _uhd_conf()
    with pytest.raises(registry.UnknownBlockError, match="driver=mock"):
        registry.validate_conf(conf, [("1C", 4)])


def test_hardware_source_validates_with_mock_driver():
    conf = _uhd_conf(**{"SignalSource.driver": "mock",
                        "Channels_1C.count": 4})
    registry.validate_conf(conf, [("1C", 4)])   # no raise


def test_mock_driver_rejects_bad_tuning():
    d = rf_driver.MockRfDriver()
    with pytest.raises(ValueError):
        d.configure(rf_driver.RfConfig(center_freq_hz=100.0))
    with pytest.raises(RuntimeError):
        d.read(10)                              # not started


def test_uhd_conf_mock_playback_end_to_end(tmp_path):
    """A UHD conf with a mock playback capture runs the full receiver and
    acquires the scenario's satellites — the live-RF path end-to-end."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.utils import fixture_cache, scenario as scen

    fs = 2.0e6
    sc = scen.build_gps_l1_scenario(duration_s=3.0, n_sats=4,
                                    cn0_dbhz=48.0, fs=fs)
    x = fixture_cache.cached_iq(
        "rf_mock_play", dict(dur=3.0, n=4, fs=fs, seed=55),
        lambda: sc.generate(seed=55))
    cap = tmp_path / "mock_capture.cfile"
    x.astype(np.complex64).tofile(cap)

    conf = _uhd_conf(**{"SignalSource.driver": "mock",
                        "SignalSource.mock_capture": str(cap),
                        "SignalSource.sampling_frequency": int(fs)})
    src = ini.source_from_ini(conf)
    rx = Receiver(ReceiverConfig(signal="1C", fs=fs, n_channels=4,
                                 prns=tuple(sc.prns), chunk_ms=100))
    rx.run_source(src, max_chunks=28)
    src.close()
    assert sorted(rx.tracked_prns()) == sorted(sc.prns)
