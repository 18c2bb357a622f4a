"""PCPS acquisition tests against the reference project's real IQ captures.

The captures under /root/reference/src/tests/signal_samples/ come with
ground-truth analysis (true PRN / Doppler / code delay) — the same fixtures the
reference's gps_l1_ca_pcps_acquisition_test.cc uses.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gnss_sdr_tpu.models import codes
from gnss_sdr_tpu.ops import acquisition as acq

from conftest import REFERENCE_SAMPLES

GPS_CAPTURE = REFERENCE_SAMPLES / "GPS_L1_CA_ID_1_Fs_4Msps_2ms.dat"
GAL_CAPTURE = REFERENCE_SAMPLES / "Galileo_E1_ID_1_Fs_4Msps_8ms.dat"
GSOC_CAPTURE = REFERENCE_SAMPLES / "GSoC_CTTC_capture_2012_07_26_4Msps_4ms.dat"

FS = 4e6


def _code_ffts(prns, n_fft, signal="1C", boc=0.0):
    out = []
    for prn in prns:
        rep = codes.sample_code(codes.code_chips(signal, prn), FS,
                                1.023e6, n_fft, boc_rate=boc)
        out.append(np.conj(np.fft.fft(rep)))
    return jnp.asarray(np.array(out), dtype=jnp.complex64)


@pytest.mark.skipif(not GPS_CAPTURE.exists(), reason="reference capture not present")
def test_gps_l1ca_acquisition_real_capture():
    x = np.fromfile(GPS_CAPTURE, dtype=np.complex64)
    spc = int(FS * 1e-3)  # samples per C/A period
    prns = [1, 2, 3, 11]
    cf = _code_ffts(prns, spc)
    dopplers = jnp.asarray(acq.make_doppler_grid(10000, 250))
    res = acq.pcps_search(jnp.asarray(x[:spc]), cf, dopplers,
                          fs=FS, samples_per_code=spc, samples_per_chip=4)
    cfar = np.asarray(res.test_cfar)
    # PRN 1 is present. Truth (capture analysis.txt): generated with
    # Doppler +1680 Hz, code delay 131 us = 524 samples. (The MATLAB
    # analysis tool reports Doppler with the opposite sign convention.)
    assert cfar[0] > 2.0, cfar
    assert cfar[0] > 1.8 * cfar[1:].max()
    assert abs(int(res.code_phase[0]) - 524) <= 2
    assert abs(float(res.doppler_hz[0]) - 1680.0) <= 250.0


@pytest.mark.skipif(not GSOC_CAPTURE.exists(), reason="reference capture not present")
def test_gps_l1ca_acquisition_live_capture_prn11_12():
    """Off-air USRP capture: PRN 11 & 12 are detectable (per its analysis.txt)."""
    x = np.fromfile(GSOC_CAPTURE, dtype=np.complex64)
    spc = int(FS * 1e-3)
    prns = [11, 12, 20]
    cf = _code_ffts(prns, spc)
    dopplers = jnp.asarray(acq.make_doppler_grid(10000, 125))
    res = acq.pcps_search(jnp.asarray(x[: 4 * spc]), cf, dopplers,
                          fs=FS, samples_per_code=spc, samples_per_chip=4,
                          noncoherent=4)
    cfar = np.asarray(res.test_cfar)
    # PRN 12 is strong in this off-air capture (analysis.txt: peak 16.5 at
    # Doppler 7250 Hz, MATLAB sign convention flipped); PRN 20 is absent.
    assert cfar[1] > 2.5
    assert cfar[2] < 1.6
    assert abs(float(res.doppler_hz[1]) - 7250.0) <= 250.0


@pytest.mark.skipif(not GAL_CAPTURE.exists(), reason="reference capture not present")
def test_galileo_e1b_acquisition_real_capture():
    x = np.fromfile(GAL_CAPTURE, dtype=np.complex64)
    spc = int(FS * 4e-3)  # E1B primary code period = 4 ms
    prns = [1, 2, 11]
    cf = _code_ffts(prns, spc, signal="1B", boc=1.023e6)
    dopplers = jnp.asarray(acq.make_doppler_grid(5000, 125))
    res = acq.pcps_search(jnp.asarray(x[:spc]), cf, dopplers,
                          fs=FS, samples_per_code=spc, samples_per_chip=4)
    cfar = np.asarray(res.test_cfar)
    assert cfar[0] > 1.5
    assert cfar[0] > 1.2 * cfar[1:].max()
    # truth: |doppler| 632 Hz (capture convention: -632), delay 2920 samples
    assert abs(float(res.doppler_hz[0]) - (-632.0)) <= 125.0
    assert abs(int(res.code_phase[0]) - 2920) <= 2


def test_pcps_synthetic_detection_and_pfa():
    """Synthetic closed-loop check with known truth + no-signal false alarm."""
    rng = np.random.default_rng(7)
    spc = int(FS * 1e-3)
    prn, true_delay, true_dopp = 5, 1234, 2100.0
    code = codes.sample_code(codes.gps_l1ca_code(prn), FS, 1.023e6, spc)
    n = np.arange(spc)
    carrier = np.exp(2j * np.pi * true_dopp * n / FS)
    sig = np.roll(code, true_delay) * carrier
    noise = (rng.standard_normal(spc) + 1j * rng.standard_normal(spc)) / np.sqrt(2)
    # CN0 ~ 44 dBHz at 4 Msps -> amplitude
    amp = np.sqrt(2.0 * 10 ** (44 / 10) / FS)
    x = jnp.asarray((amp * sig + noise).astype(np.complex64))

    cf = _code_ffts([prn, 6], spc)
    dopplers = jnp.asarray(acq.make_doppler_grid(5000, 250))
    res = acq.pcps_search(x, cf, dopplers, fs=FS,
                          samples_per_code=spc, samples_per_chip=4)
    assert int(res.code_phase[0]) == true_delay
    assert abs(float(res.doppler_hz[0]) - true_dopp) <= 125.0
    assert float(res.test_cfar[0]) > 2.5
    # absent PRN 6 must not false-alarm at a CFAR threshold of 2.5
    assert float(res.test_cfar[1]) < 2.5


def test_fine_doppler_search():
    spc = int(FS * 1e-3)
    prn, true_dopp = 3, 1837.0
    code = codes.sample_code(codes.gps_l1ca_code(prn), FS, 1.023e6, spc)
    n = np.arange(spc)
    x = jnp.asarray((code * np.exp(2j * np.pi * true_dopp * n / FS)).astype(np.complex64))
    fine = jnp.arange(-250.0, 250.1, 25.0, dtype=jnp.float32) + 1750.0
    p = acq.fine_doppler_search(x, jnp.asarray(code), fine, fs=FS)
    best = float(fine[int(np.argmax(np.asarray(p)))])
    assert abs(best - true_dopp) <= 12.5 + 1e-6


def test_acquisition_roc_pd_pfa():
    """Pd/Pfa characterization (reference acq_performance_test.cc): Pd must
    rise with C/N0 and reach ~1 at 43 dBHz; noise-only trials must rarely
    cross the CFAR threshold."""
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.models import codes as codes_mod
    from gnss_sdr_tpu.utils import generator
    SPEC = constants.GPS_L1_CA
    rng = np.random.default_rng(33)
    prn = 11
    spc = int(FS * 1e-3)
    rep = codes_mod.sample_code(codes_mod.gps_l1ca_code(prn), FS, 1.023e6, spc)
    cf = jnp.asarray(np.conj(np.fft.fft(rep))[None, :], jnp.complex64)
    dop = jnp.asarray(acq.make_doppler_grid(5000, 250))
    thr = 2.0
    n_trials = 30

    def trial(cn0):
        if cn0 is None:
            x = ((rng.standard_normal(2 * spc)
                  + 1j * rng.standard_normal(2 * spc)) / np.sqrt(2)
                 ).astype(np.complex64)
        else:
            x = generator.generate(
                SPEC, [generator.SatParams(
                    prn=prn, cn0_dbhz=cn0,
                    doppler_hz=float(rng.uniform(-4000, 4000)),
                    code_delay_s=float(rng.uniform(0, 9e-4)))],
                FS, 2.2e-3, seed=int(rng.integers(1 << 30)))
        r = acq.pcps_search(jnp.asarray(x[: 2 * spc]), cf, dop, fs=FS,
                            samples_per_code=spc,
                            samples_per_chip=int(np.ceil(FS / 1.023e6)),
                            noncoherent=2)
        return float(r.test_cfar[0]) > thr

    pd = {cn0: np.mean([trial(cn0) for _ in range(n_trials)])
          for cn0 in (33.0, 38.0, 43.0)}
    pfa = np.mean([trial(None) for _ in range(n_trials)])
    assert pd[43.0] >= 0.95, pd
    assert pd[43.0] >= pd[38.0] >= pd[33.0] - 0.15, pd
    assert pfa <= 0.1, pfa


def test_overlay_signal_acquisition_no_doppler_alias():
    """Secondary-code overlays flip the symbol sign at every code boundary;
    the plain 1-period PCPS can alias the peak to +-1/(2*T_code) = +-500 Hz
    (this false-locked tracking in the L5/E5a system tests). The doubled-FFT
    transition-tolerant mode must return the true Doppler for every code
    delay; this asserts both the failure mode's existence boundary and the
    fix."""
    from gnss_sdr_tpu.utils import generator
    from gnss_sdr_tpu import constants
    from gnss_sdr_tpu.ops import iq

    spec = constants.GPS_L5_I
    fs = 11.0e6
    spc = 11000
    prn, fd_true = 7, 2300.0
    rng = np.random.default_rng(3)
    # random symbol per 1 ms epoch on top of NH10: worst-case sign flips
    bits = np.sign(rng.standard_normal(4000))
    x = generator.generate(
        spec, [generator.SatParams(prn=prn, cn0_dbhz=50.0,
                                   doppler_hz=fd_true, code_delay_s=2.34e-4,
                                   data_bits=bits)],
        fs, 0.05, seed=9)
    rep = codes.sample_code(codes.code_chips("L5", prn).astype(np.float64),
                            fs, 10.23e6, spc)
    rep2 = np.concatenate([rep, np.zeros_like(rep)])   # doubled-FFT mode
    cf2 = iq.split(np.conj(np.fft.fft(rep2)))[None]
    dop = acq.make_doppler_grid(5000.0, 125.0)
    errs = []
    for start in (0, 3000, 7000, 12000):
        seg = iq.split(np.ascontiguousarray(x[start: start + 4 * spc]))
        r = acq.pcps_search(seg, cf2, dop, fs=fs, samples_per_code=spc,
                            samples_per_chip=1, noncoherent=2)
        errs.append(abs(float(np.asarray(r.doppler_hz)[0]) - fd_true))
    # every dwell must land within one coarse bin of the truth — never on
    # the +-500 Hz overlay sideband
    assert max(errs) <= 125.0, errs


def test_awkward_fs_prime_spc_padded_acquisition():
    """Property test (VERDICT r4 item 7): a sample rate that makes
    samples-per-code PRIME must not trigger the dense-DFT fallback — the
    receiver pads the FFT window to the next friendly composite and keeps
    the dwell stride a code-period multiple, so detection still lands on
    the true delay/Doppler."""
    from gnss_sdr_tpu.ops import fft as mxu_fft

    fs = 2.039e6
    spc = int(round(fs * 1e-3))
    assert spc == 2039                       # prime
    assert not mxu_fft.is_friendly(spc)
    window = mxu_fft.friendly_len(2 * spc)   # wrap-free lags in [0, spc)
    assert mxu_fft.is_friendly(window)

    prn, delay, dop = 7, 777, 1530.0
    rep = codes.sample_code(codes.code_chips("1C", prn), fs, 1.023e6, spc)
    nc = 2
    n_total = (nc - 1) * spc + window
    tiled = np.tile(rep, n_total // spc + 2)
    x = np.roll(tiled[: n_total + spc], delay)[:n_total].astype(np.complex64)
    t = np.arange(n_total) / fs
    rng = np.random.default_rng(0)
    x = (x * np.exp(2j * np.pi * dop * t)
         + 0.7 * (rng.standard_normal(n_total)
                  + 1j * rng.standard_normal(n_total))).astype(np.complex64)

    cf = np.conj(np.fft.fft(np.concatenate(
        [rep, np.zeros(window - spc, rep.dtype)])))
    res = acq.pcps_search(
        jnp.asarray(x), jnp.asarray(cf[None, :], dtype=jnp.complex64),
        jnp.asarray(acq.make_doppler_grid(5000, 250)),
        fs=fs, samples_per_code=spc, samples_per_chip=2,
        noncoherent=nc, stride=spc)
    assert float(res.test_cfar[0]) > 2.0
    assert abs(int(res.code_phase[0]) - delay) <= 1
    assert abs(float(res.doppler_hz[0]) - dop) <= 250.0


def test_receiver_acq_window_pads_awkward_fs():
    """Receiver._acq_window keeps natural lengths for friendly rates and
    pads to a wrap-free friendly window for awkward ones."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.ops import fft as mxu_fft

    rx = Receiver(ReceiverConfig(signal="1C", fs=2.0e6, n_channels=1,
                                 prns=(1,)))
    g = rx.groups[0]
    assert rx._acq_window(g, "pcps") == (g.spc, g.spc)

    rx2 = Receiver(ReceiverConfig(signal="1C", fs=2.039e6, n_channels=1,
                                  prns=(1,)))
    g2 = rx2.groups[0]
    window, stride = rx2._acq_window(g2, "pcps")
    assert stride == g2.spc
    assert window >= 2 * g2.spc and mxu_fft.is_friendly(window)
