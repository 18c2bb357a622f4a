"""IONEX TEC-map tests (reference: rtklib_ionex readtec/iontec)."""

import numpy as np

from gnss_sdr_tpu.receiver.pvt import ionex


def _synthetic_maps():
    lats = np.arange(87.5, -87.6, -2.5)
    lons = np.arange(-180.0, 180.1, 5.0)
    epochs = np.array([0.0, 7200.0, 14400.0])
    # smooth analytic field: TEC(lat, lon, t) in TECU
    tec = np.zeros((len(epochs), len(lats), len(lons)))
    for ti, t in enumerate(epochs):
        for li, la in enumerate(lats):
            tec[ti, li, :] = (10.0 + 8.0 * np.cos(np.deg2rad(la))
                              * np.cos(np.deg2rad(lons - 20.0 * ti))
                              + 0.001 * t / 3600.0)
    return ionex.IonexMaps(epochs_s=epochs, lats_deg=lats, lons_deg=lons,
                           tec=tec)


def test_ionex_roundtrip(tmp_path):
    maps = _synthetic_maps()
    p = tmp_path / "maps.inx"
    ionex.write_ionex(p, maps)
    rd = ionex.read_ionex(p)
    assert rd.tec.shape == maps.tec.shape
    np.testing.assert_allclose(rd.epochs_s, maps.epochs_s)
    # 0.1 TECU quantization from the writer's exponent -1
    np.testing.assert_allclose(rd.tec, maps.tec, atol=0.06)


def test_ionex_interpolation_and_slant():
    maps = _synthetic_maps()
    # interpolation at grid points is exact; off-grid within field curvature
    v = maps.vtec(0.0, 47.5, 15.0)
    truth = 10.0 + 8.0 * np.cos(np.deg2rad(47.5)) * np.cos(np.deg2rad(15.0))
    assert abs(v - truth) < 0.2
    # time interpolation halfway between maps
    v1 = maps.vtec(3600.0, 0.0, 0.0)
    a = maps.vtec(0.0, 0.0, 0.0)
    b = maps.vtec(7200.0, 0.0, 0.0)
    assert abs(v1 - 0.5 * (a + b)) < 1e-9

    # slant delay: zenith ~ vtec * 0.162 m/TECU at L1; low elevation larger
    lat, lon = np.deg2rad(41.275), np.deg2rad(1.9876)
    d_zen = maps.slant_delay_m(0.0, lat, lon, 0.0, np.pi / 2)
    d_low = maps.slant_delay_m(0.0, lat, lon, 1.0, np.deg2rad(15.0))
    vtec_here = maps.vtec(0.0, np.degrees(lat), np.degrees(lon))
    expect_zen = 40.3e16 * vtec_here * 1e16 / 1_575_420_000.0 ** 2 / 1e16
    assert abs(d_zen - expect_zen) < 0.3
    assert 1.5 * d_zen < d_low < 3.5 * d_zen
