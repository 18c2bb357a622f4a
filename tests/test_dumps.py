"""Tracing dump tests (reference: dump readers as test oracles)."""

import numpy as np

from gnss_sdr_tpu import constants
from gnss_sdr_tpu.io import dumps
from gnss_sdr_tpu.io.sources import ArraySignalSource
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.utils import generator


def test_stage_dump_roundtrip(tmp_path):
    d = dumps.StageDump(tmp_path / "s.npz")
    d.push(a=np.arange(3), b=1.5)
    d.push(a=np.arange(2), b=2.5)
    d.close()
    z = dumps.load_dump(tmp_path / "s.npz")
    np.testing.assert_array_equal(z["a"], [0, 1, 2, 0, 1])
    np.testing.assert_array_equal(z["b"], [1.5, 2.5])


def test_receiver_tracking_dump(tmp_path):
    fs = 2.5e6
    x = generator.generate(
        constants.GPS_L1_CA,
        [generator.SatParams(prn=7, cn0_dbhz=47, doppler_hz=900.0,
                             code_delay_s=2e-4)], fs, 0.5, seed=1)
    cfg = ReceiverConfig(signal="1C", fs=fs, n_channels=1, prns=(7,),
                         chunk_ms=100, dump_dir=str(tmp_path))
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, fs))
    rx.close_dumps()
    z = dumps.load_dump(tmp_path / "tracking.npz")
    assert len(z["prompt_i"]) > 300
    assert np.all(z["prn"] == 7)
    # settled prompts should be coherent (|I| >> |Q|)
    tail_i = np.abs(z["prompt_i"][-100:]).mean()
    tail_q = np.abs(z["prompt_q"][-100:]).mean()
    assert tail_i > 3 * tail_q
    # epoch counter strictly increasing
    assert np.all(np.diff(z["epoch"]) > 0)


def test_stage_dump_mat_output(tmp_path):
    """dump_mat writes a MATLAB .mat beside the npz (reference
    save_matfile / utils/matlab readers parity)."""
    from scipy.io import loadmat
    from gnss_sdr_tpu.io.dumps import StageDump

    d = StageDump(tmp_path / "trk.npz", mat=True)
    d.push(prompt_i=np.array([1.0, 2.0]), cn0_dbhz=np.array([44.0, 45.0]))
    d.push(prompt_i=np.array([3.0]), cn0_dbhz=np.array([46.0]))
    d.close()
    m = loadmat(tmp_path / "trk.mat")
    np.testing.assert_allclose(m["prompt_i"].ravel(), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(m["cn0_dbhz"].ravel(), [44.0, 45.0, 46.0])


def test_receiver_acquisition_dump(tmp_path):
    """Acquisition attempts land in acquisition.npz (reference
    pcps_acquisition dump_results analog): PRN 7 present with a positive
    detection at ~the injected Doppler."""
    fs = 2.5e6
    x = generator.generate(
        constants.GPS_L1_CA,
        [generator.SatParams(prn=7, cn0_dbhz=47, doppler_hz=900.0,
                             code_delay_s=2e-4)], fs, 0.3, seed=2)
    cfg = ReceiverConfig(signal="1C", fs=fs, n_channels=1, prns=(7, 13),
                         chunk_ms=100, dump_dir=str(tmp_path))
    rx = Receiver(cfg)
    rx.run_source(ArraySignalSource(x, fs))
    rx.close_dumps()
    z = dumps.load_dump(tmp_path / "acquisition.npz")
    assert set(z["prn"]) >= {7}
    hits = z["positive"] & (z["prn"] == 7)
    assert hits.any()
    assert np.all(np.abs(z["doppler_hz"][hits] - 900.0) < 260.0)
    # the absent satellite never crosses the CFAR threshold
    miss = z["prn"] == 13
    assert miss.any() and not z["positive"][miss].any()


def test_dump_tools_read_and_plot(tmp_path):
    """The dump reader/plotter library (reference src/utils/matlab analog):
    reads the npz dumps back per channel and renders the standard panels."""
    import numpy as np
    from gnss_sdr_tpu.io import dumps as dumps_mod
    from gnss_sdr_tpu.utils import dump_tools

    td = dumps_mod.TrackingDump(tmp_path / "tracking.npz")
    n = 50
    for prn, ch in ((7, 0), (12, 1)):
        td.push_epochs(ch, prn, np.arange(n) * 2000, np.arange(n),
                       (np.ones(n) * (1 + prn)).astype(np.complex128),
                       45 + np.zeros(n), 1000.0 + np.zeros(n),
                       1.023e6 + np.zeros(n), np.zeros(n), np.ones(n))
    td.close()
    pd = dumps_mod.PvtDump(tmp_path / "pvt.npz")

    class Sol:
        tow_s = 1.0
        pos_ecef = np.array([4.8e6, 1.6e5, 4.1e6])
        vel_ecef = np.zeros(3)
        clock_bias_s = 1e-6
        n_sats = 6
        pdop = 2.0
        hdop = 1.2
    for k in range(5):
        s = Sol(); s.pos_ecef = Sol.pos_ecef + np.array([k * 0.1, 0, 0])
        pd.push_fix(s)
    pd.close()

    trk = dump_tools.read_tracking(tmp_path / "tracking.npz")
    assert sorted(trk) == [7, 12]
    assert len(trk[7]["cn0_dbhz"]) == n
    rc = dump_tools.main([str(tmp_path), "--out", str(tmp_path / "plots")])
    assert rc == 0
    assert (tmp_path / "plots" / "tracking.png").exists()
    assert (tmp_path / "plots" / "pvt.png").exists()
