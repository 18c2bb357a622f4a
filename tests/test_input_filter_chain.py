"""Config-driven input-filter chain: notch / pulse blanking / beamformer
selected purely by INI keys, exactly like the reference's
``InputFilter.implementation=`` adapters
(``src/algorithms/input_filter/adapters/``).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.config import ini
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.utils import fixture_cache, generator, scenario as scen
from gnss_sdr_tpu import constants

FS = 2.0e6


def _conf(pairs: dict) -> ini.InMemoryConfiguration:
    c = ini.InMemoryConfiguration()
    for k, v in pairs.items():
        c.set_property(k, v)
    return c


def test_pass_through_default():
    assert ini.input_filter_from_ini(_conf({})) is None
    assert ini.input_filter_from_ini(
        _conf({"InputFilter.implementation": "Pass_Through"})) is None


def test_unknown_filter_rejected():
    with pytest.raises(NotImplementedError):
        ini.input_filter_from_ini(
            _conf({"InputFilter.implementation": "Quantum_Filter"}))


def test_freq_xlating_filter_moves_if_to_baseband():
    conf = _conf({"InputFilter.implementation": "Freq_Xlating_Fir_Filter",
                  "InputFilter.IF": 250000,
                  "InputFilter.sampling_frequency": FS})
    flt = ini.input_filter_from_ini(conf)
    n = np.arange(8192)
    tone = np.exp(2j * np.pi * 250e3 * n / FS).astype(np.complex64)
    out = flt(tone)
    spec = np.abs(np.fft.fft(out))
    assert np.argmax(spec) == 0          # tone moved to DC


def test_notch_filter_conf_recovers_acquisition():
    """E2E jamming recovery driven only by conf: a CW jammer kills the
    cold-start acquisition; enabling InputFilter.implementation=Notch_Filter
    in the config restores tracking and the position fix chain."""
    sc = scen.build_gps_l1_scenario(duration_s=4.0, n_sats=5, cn0_dbhz=47.0,
                                    fs=FS)
    x = fixture_cache.cached_iq(
        "jam_e2e", dict(duration_s=4.0, n_sats=5, cn0_dbhz=47.0, fs=FS,
                        seed=3), lambda: sc.generate(seed=3))
    n = np.arange(len(x))
    jam = 30.0 * np.exp(2j * np.pi * 0.31e6 * n / FS)
    jammed = (x + jam).astype(np.complex64)

    def run(with_filter: bool):
        pairs = {"Channels_1C.count": 5,
                 "GNSS-SDR.internal_fs_sps": FS,
                 "Acquisition_1C.doppler_max": 5000,
                 "Acquisition_1C.doppler_step": 250}
        if with_filter:
            pairs["InputFilter.implementation"] = "Notch_Filter"
        conf = _conf(pairs)
        rcfg = ini.receiver_config_from_ini(conf)
        import dataclasses
        rcfg = dataclasses.replace(rcfg, prns=tuple(sc.prns))
        flt = ini.input_filter_from_ini(conf)
        rx = Receiver(rcfg)
        rx.run_source(ArraySignalSource(jammed, FS), input_filter=flt)
        return rx

    rx_clean = run(True)
    rx_jammed = run(False)
    assert len(rx_clean.tracked_prns()) >= 4, rx_clean.tracked_prns()
    assert len(rx_clean.tracked_prns()) > len(rx_jammed.tracked_prns())


def test_beamformer_conf_chain(tmp_path):
    """Raw_Array_Signal_Source + Beamformer_Filter from conf: a 4-element
    broadside beamformer recovers the array gain on a generated signal."""
    spec = constants.GPS_L1_CA
    sats = [generator.SatParams(prn=7, cn0_dbhz=42.0, doppler_hz=750.0,
                                code_delay_s=3e-4)]
    x = generator.generate(spec, sats, FS, 0.1, seed=5)
    n_el = 4
    # same signal on each element (broadside), independent element noise
    rng = np.random.default_rng(9)
    arr = np.stack([x + (rng.standard_normal(len(x))
                         + 1j * rng.standard_normal(len(x))).astype(np.complex64)
                    for _ in range(n_el)])
    path = tmp_path / "array.dat"
    arr.T.reshape(-1).astype(np.complex64).tofile(path)   # element-interleaved

    conf = _conf({"SignalSource.implementation": "Raw_Array_Signal_Source",
                  "SignalSource.filename": str(path),
                  "SignalSource.RF_channels": n_el,
                  "SignalSource.sampling_frequency": FS,
                  "InputFilter.implementation": "Beamformer_Filter",
                  "InputFilter.n_elements": n_el,
                  "InputFilter.theta_deg": 0.0})
    source = ini.source_from_ini(conf)
    flt = ini.input_filter_from_ini(conf)
    block = source.read(int(0.1 * FS))
    assert block.shape[0] == n_el
    y = flt(block)
    assert y.ndim == 1 and len(y) == block.shape[1]

    # beamformed stream: acquisition statistic must beat the single element
    from gnss_sdr_tpu.models import codes
    from gnss_sdr_tpu.ops import acquisition as acq_ops, iq
    spc = int(FS * 1e-3)
    cf = iq.split(np.conj(np.fft.fft(codes.sample_code(
        codes.gps_l1ca_code(7), FS, 1.023e6, spc))))[None]
    dop = acq_ops.make_doppler_grid(2000.0, 250.0)

    def cfar(sig):
        r = acq_ops.pcps_search(iq.split(np.ascontiguousarray(sig[: 2 * spc])),
                                cf, dop, fs=FS, samples_per_code=spc,
                                samples_per_chip=2, noncoherent=2)
        return float(np.asarray(r.test_cfar)[0])

    # element noise is unit variance per element; the combiner averages it
    # down 4x while keeping the signal: acquisition must improve
    assert cfar(y) > cfar(np.asarray(block[0]))
