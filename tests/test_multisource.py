"""Multi-source receiver: config mapping + cross-source merge plumbing.

Reference analog: the multi-source flowgraph of ``gnss_flowgraph.cc:126-737``
(``Receiver.sources_count`` SignalSourceK sections, per-source conditioner
chains, ``ChannelN.RF_channel_ID`` channel binding), exercised by
``conf/gnss-sdr_multisource_Hybrid_ishort.conf``. The signal-level
dual-band run lives in tests/test_e2e_multisource.py; this file covers the
fast pieces: INI -> branches, rate plans, the shared clock origin, and the
merged dual-frequency PVT over observables from two branches.
"""

import dataclasses

import numpy as np
import pytest

from gnss_sdr_tpu import constants as C
from gnss_sdr_tpu.config import ini
from gnss_sdr_tpu.receiver.multisource import (MultiSourceReceiver,
                                               SourceBranchConfig)
from gnss_sdr_tpu.receiver.observables import ChannelObservable
from gnss_sdr_tpu.receiver.receiver import ReceiverConfig
from gnss_sdr_tpu.receiver.pvt import geodesy
from gnss_sdr_tpu.utils import constellation

TRUE_LLH = (np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
T0 = 345600.0


MULTISOURCE_CONF = """
GNSS-SDR.internal_fs_sps=2046000
Receiver.sources_count=2

SignalSource0.implementation=File_Signal_Source
SignalSource0.filename={f0}
SignalSource0.item_type=ishort
SignalSource0.sampling_frequency=2046000

SignalSource1.implementation=File_Signal_Source
SignalSource1.filename={f1}
SignalSource1.item_type=ishort
SignalSource1.sampling_frequency=12000000
Resampler1.sample_freq_out=12000000

Channels_1C.count=6
Channels_L5.count=4
Channel0.RF_channel_ID=0
Channel6.RF_channel_ID=1
"""


def _write_conf(tmp_path, text):
    f0 = tmp_path / "l1.ishort"
    f1 = tmp_path / "l5.ishort"
    np.zeros(1000, np.int16).tofile(f0)
    np.zeros(1000, np.int16).tofile(f1)
    p = tmp_path / "ms.conf"
    p.write_text(text.format(f0=f0, f1=f1))
    return p


def test_multisource_ini_mapping(tmp_path):
    conf = ini.FileConfiguration(_write_conf(tmp_path, MULTISOURCE_CONF))
    branches, base = ini.multisource_from_ini(conf)
    assert len(branches) == 2
    b0, b1 = branches
    assert b0.receiver.signal_plan == (("1C", 6),)
    assert b0.receiver.fs == 2046000.0
    assert b0.source.fs == 2046000.0
    assert b1.receiver.signal_plan == (("L5", 4),)
    assert b1.receiver.fs == 12000000.0          # per-source internal rate
    assert b1.source.fs == 12000000.0
    assert base.signal_plan == (("1C", 6), ("L5", 4))


def test_multisource_ini_single_source_returns_none(tmp_path):
    conf = ini.InMemoryConfiguration({"Channels_1C.count": "8"})
    assert ini.multisource_from_ini(conf) is None


def test_multisource_ini_rejects_split_group(tmp_path):
    text = MULTISOURCE_CONF + "Channel1.RF_channel_ID=1\n"
    conf = ini.FileConfiguration(_write_conf(tmp_path, text))
    with pytest.raises(ValueError, match="splits signal group"):
        ini.multisource_from_ini(conf)


@pytest.fixture(scope="module")
def world():
    ephs = constellation.almanac_constellation()
    rcv = geodesy.geodetic_to_ecef(*TRUE_LLH)
    vis = constellation.visible_sats(ephs, rcv, T0, el_mask_deg=10.0)
    prns = [p for p, _, _ in vis[:6]]
    return ephs, rcv, prns


def _branch_obs(ephs, prns, rcv, t, signal, bias):
    """Receiver-style ChannelObservables for one branch/epoch."""
    spec = C.SIGNALS[signal]
    out = []
    for prn in prns:
        o = constellation.simulate_observation(
            ephs[prn], rcv, t, rcv_clock_bias_s=bias,
            carrier_freq_hz=spec.carrier_freq_hz)
        out.append(ChannelObservable(
            prn=prn, signal=signal, t_tx_sv=o.t_tx_sv,
            pseudorange_m=o.pseudorange_m,
            carrier_phase_cycles=o.pseudorange_m
            / (C.SPEED_OF_LIGHT_M_S / spec.carrier_freq_hz),
            doppler_hz=o.doppler_hz, cn0_dbhz=47.0))
    return out


def test_merged_dual_band_pvt(world):
    """Observables arriving from TWO branches (L1 @ branch 0, L5 @ branch 1)
    merge on the common tick grid into one dual-frequency PVT: the iono-free
    combination must engage (one solver input per satellite) and the fix
    must land on the truth."""
    ephs, rcv, prns = world
    keyed = {("G", p): ephs[p] for p in prns}

    mk = lambda sig, fs: ReceiverConfig(
        signal=sig, fs=fs, n_channels=len(prns), prns=tuple(prns),
        pvt_apply_tropo=False, pvt_apply_iono=False)
    ms = MultiSourceReceiver([
        SourceBranchConfig(receiver=mk("1C", 2.046e6)),
        SourceBranchConfig(receiver=mk("L5", 12.0e6)),
    ])
    ms.ephemerides.update(keyed)

    solved = []
    ms.obs_sinks.append(lambda t, obs: solved.append((t, len(obs))))
    bias = 1.7e-4
    # five 100 ms epochs pushed through the branch collectors exactly as
    # the sub-receivers' obs_sinks would
    for k in range(5):
        t = T0 + 0.1 * (k + 1)
        rel = 0.1 * (k + 1)
        ms._collect(0, rel, _branch_obs(ephs, prns, rcv, t, "1C", bias))
        ms._collect(1, rel, _branch_obs(ephs, prns, rcv, t, "L5", bias))
        # emulate both branches having advanced past this tick
        for r in ms.receivers:
            r._sample_base = int((rel + 0.05) * r.cfg.fs)
        ms._flush([True, True])
    assert len(ms.fixes) == 5
    for f in ms.fixes:
        # ~2 cm float64 time-representation noise per simulated obs (see
        # test_pvt.py) is amplified ~2.6x by the L1/L5 iono-free combination
        assert np.linalg.norm(f.pos_ecef - rcv) < 0.3
        assert f.n_sats == len(prns)       # merged per-satellite (iono-free)
    assert solved and all(n == 2 * len(prns) for _, n in solved)


def test_clock_origin_shared_across_branches(world):
    """The first branch to anchor its receiver-clock origin propagates it:
    pseudoranges from different branches must live on ONE receiver time
    scale (the per-branch anchor would otherwise differ by ms)."""
    ms = MultiSourceReceiver([
        SourceBranchConfig(receiver=ReceiverConfig(signal="1C", fs=2.046e6)),
        SourceBranchConfig(receiver=ReceiverConfig(signal="L5", fs=12.0e6)),
    ])
    assert all(r.observables.rx_clock_tow is None for r in ms.receivers)
    ms.receivers[0].observables._rx_origin_tow = 345601.234
    ms._share_clock_origin()
    assert ms.receivers[1].observables.rx_clock_tow == 345601.234


MULTICHANNEL_CONF = """
GNSS-SDR.internal_fs_sps=2046000

SignalSource.implementation=Multichannel_File_Signal_Source
SignalSource.total_channels=2
SignalSource.filename0={f0}
SignalSource.filename1={f1}
SignalSource.item_type=ishort
SignalSource.sampling_frequency=2046000

Channels_1C.count=6
Channels_1B.count=4
Channel0.RF_channel_ID=0
Channel6.RF_channel_ID=1
"""


def test_multichannel_file_source_maps_to_branches(tmp_path):
    """Multichannel_File_Signal_Source (one section, filename0..N-1 at a
    common rate, reference multichannel_file_signal_source.cc:54-60)
    expands into per-RF-chain file-source branches."""
    conf = ini.FileConfiguration(_write_conf(tmp_path, MULTICHANNEL_CONF))
    branches, base = ini.multisource_from_ini(conf)
    assert len(branches) == 2
    b0, b1 = branches
    assert b0.receiver.signal_plan == (("1C", 6),)
    assert b1.receiver.signal_plan == (("1B", 4),)
    assert b0.source.path.name == "l1.ishort"
    assert b1.source.path.name == "l5.ishort"
    assert b0.source.fs == b1.source.fs == 2046000.0
    assert base.signal_plan == (("1C", 6), ("1B", 4))
