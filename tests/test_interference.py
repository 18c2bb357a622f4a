"""Interference suppression tests: acquisition must survive CW and pulsed
jamming after the excision filters (reference: notch/pulse-blanking filter
tests)."""

import numpy as np
import jax.numpy as jnp

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.ops import acquisition as acq
from gnss_sdr_tpu.ops.interference import notch_excision, pulse_blanking
from gnss_sdr_tpu.utils import generator

FS = 2.5e6
SPEC = constants.GPS_L1_CA


def _acq_cfar(x, prn=7):
    spc = int(FS * 1e-3)
    rep = codes.sample_code(codes.gps_l1ca_code(prn), FS, 1.023e6, spc)
    cf = jnp.asarray(np.conj(np.fft.fft(rep))[None, :], jnp.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(5000, 250))
    r = acq.pcps_search(jnp.asarray(x[: 2 * spc]), cf, dop, fs=FS,
                        samples_per_code=spc, samples_per_chip=2, noncoherent=2)
    return float(r.test_cfar[0]), int(r.code_phase[0])


def test_notch_excision_recovers_acquisition():
    x = generator.generate(
        SPEC, [generator.SatParams(prn=7, cn0_dbhz=46, doppler_hz=1000.0,
                                   code_delay_s=3e-4)], FS, 0.005, seed=2)
    n = np.arange(len(x))
    cw = 30.0 * np.exp(2j * np.pi * 0.17e6 * n / FS)   # strong CW jammer
    jammed = (x + cw).astype(np.complex64)
    c_jam, _ = _acq_cfar(jammed)
    cleaned = np.asarray(notch_excision(jnp.asarray(jammed)))
    c_clean, delay = _acq_cfar(cleaned)
    assert c_clean > c_jam
    assert c_clean > 2.0
    assert abs(delay - 750) <= 2


def test_pulse_blanking_recovers_acquisition():
    rng = np.random.default_rng(3)
    x = generator.generate(
        SPEC, [generator.SatParams(prn=7, cn0_dbhz=46, doppler_hz=1000.0,
                                   code_delay_s=3e-4)], FS, 0.005, seed=4)
    jammed = x.copy()
    # strong pulses: 10 bursts of 200 samples at 30x noise amplitude
    for k in range(10):
        i = 300 + k * 1100
        jammed[i: i + 200] += 30.0 * np.exp(1j * rng.uniform(0, 6.28, 200))
    c_jam, _ = _acq_cfar(jammed)
    cleaned = np.asarray(pulse_blanking(jnp.asarray(jammed), threshold=8.0))
    c_clean, delay = _acq_cfar(cleaned)
    assert c_clean > c_jam
    assert c_clean > 1.9
    assert abs(delay - 750) <= 2


def test_filters_are_benign_on_clean_signal():
    x = generator.generate(
        SPEC, [generator.SatParams(prn=7, cn0_dbhz=46, doppler_hz=1000.0,
                                   code_delay_s=3e-4)], FS, 0.005, seed=5)
    c0, _ = _acq_cfar(x)
    c1, _ = _acq_cfar(np.asarray(notch_excision(jnp.asarray(x))))
    c2, _ = _acq_cfar(np.asarray(pulse_blanking(jnp.asarray(x))))
    assert c1 > 0.8 * c0
    assert c2 > 0.8 * c0


def test_beamformer_steering_gain():
    """ULA beamformer (reference Beamformer_Filter role): steering toward
    the source adds ~10*log10(N) dB of array gain over one element."""
    import numpy as np
    from gnss_sdr_tpu.ops import beamformer, iq as iq_ops
    n_el, n_t = 4, 8192
    theta = np.deg2rad(25.0)
    rng = np.random.default_rng(2)
    s = (rng.standard_normal(n_t) + 1j * rng.standard_normal(n_t)).astype(np.complex64)
    # plane wave across the array + independent element noise
    k = np.arange(n_el)
    phase = 2.0 * np.pi * 0.5 * k * np.sin(theta)
    x = (np.exp(1j * phase)[:, None] * s[None, :]
         + 2.0 * (rng.standard_normal((n_el, n_t))
                  + 1j * rng.standard_normal((n_el, n_t)))).astype(np.complex64)
    x2 = np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    w = beamformer.ula_steering_weights(n_el, theta)
    y = iq_ops.combine(np.asarray(beamformer.beamform(x2, iq_ops.split(w))))
    # SNR of combined output vs single element (correlate against s)
    def snr(v):
        a = np.vdot(s, v) / np.vdot(s, s)
        return np.abs(a) ** 2 * np.vdot(s, s).real / np.sum(np.abs(v - a * s) ** 2)
    gain_db = 10 * np.log10(snr(y) / snr(x[0]))
    assert gain_db > 4.5, gain_db       # ideal 6 dB for N=4
