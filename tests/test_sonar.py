"""Sonar model (C5) completeness tests: fire-msg decode, geometry from ping,
cubic bearing interpolation, the measured PSF table, and deconvolution
against a NumPy oracle (VERDICT r1 item 7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_slam_tpu.slam.sonar import (
    OculusFireMsg,
    SonarGeometry,
    deconvolve_ping,
    oculus_psf,
    wiener_deconvolve,
)


class TestFireMsg:
    def test_decode_full(self):
        msg = {"mode": 2, "gamma": 127, "flags": 0b010101, "range": 30.0,
               "gain": 12.5, "speed_of_sound": 1480.0, "salinity": 35.0}
        f = OculusFireMsg.decode(msg)
        assert f.mode == 2
        assert f.gamma == 127
        assert f.gamma_normalized == pytest.approx(127 / 255)
        # flag bits (`/root/reference/.../sonar.py:20-26`)
        assert f.range_in_meters          # bit 0
        assert not f.data_is_16bit        # bit 1
        assert f.sends_gain               # bit 2
        assert not f.simple_return        # bit 3
        assert f.gain_assist              # bit 4
        assert not f.low_power            # bit 5
        assert f.effective_speed_of_sound() == 1480.0

    def test_speed_of_sound_internal_calc(self):
        # SoS==0 -> "internal calc will apply using salinity" (sonar.py:28):
        # Mackenzie equation, fresh vs salt water at 10 C / 10 m
        fresh = OculusFireMsg(1, 0, 0, 0, 0, 0.0, 0.0)
        salt = OculusFireMsg(1, 0, 0, 0, 0, 0.0, 35.0)
        v_f = fresh.effective_speed_of_sound()
        v_s = salt.effective_speed_of_sound()
        assert 1440 < v_f < 1500
        assert 1480 < v_s < 1540
        assert v_s > v_f  # salinity raises sound speed


class TestGeometryFromPing:
    def _ping(self):
        # bearings in centidegrees, non-uniform like a real Oculus table
        b = np.linspace(-65, 65, 96)
        b = np.sign(b) * np.abs(b) ** 1.08 / 65.0 ** 0.08  # mild warp
        return {
            "fire_msg": {"mode": 1, "gamma": 255, "flags": 1, "range": 30.0,
                         "gain": 50.0, "speed_of_sound": 1500.0,
                         "salinity": 0.0},
            "part_number": 1032,
            "num_ranges": 256,
            "range_resolution": 30.0 / 256,
            "bearings": (b * 100).astype(np.int16),
        }

    def test_from_ping(self):
        geom, fire = SonarGeometry.from_ping(self._ping())
        assert geom.model == "M750d"
        assert geom.num_ranges == 256
        assert geom.num_bearings == 96
        assert geom.vertical_aperture == pytest.approx(np.deg2rad(20.0))
        np.testing.assert_allclose(geom.bearings[0], np.deg2rad(-65), atol=1e-3)
        assert fire.range_in_meters
        # max range follows num_ranges * resolution (`sonar.py:197-200`)
        assert geom.max_range == pytest.approx(30.0, abs=1e-4)

    def test_cubic_bearing_interpolation_roundtrip(self):
        geom, _ = SonarGeometry.from_ping(self._ping())
        cols = np.linspace(0, geom.num_bearings - 1, 37)
        b = geom.col_to_bearing(cols)
        back = geom.bearing_to_col(b)
        np.testing.assert_allclose(back, cols, atol=1e-3)

    def test_cubic_matches_scipy_reference(self):
        """Pin to scipy interp1d(kind='cubic') — the exact reference call
        (`sonar.py:213-228`)."""
        from scipy.interpolate import interp1d

        geom, _ = SonarGeometry.from_ping(self._ping())
        ref = interp1d(geom.bearings, np.arange(geom.num_bearings),
                       kind="cubic", bounds_error=False, fill_value=-1,
                       assume_sorted=True)
        q = np.linspace(geom.bearings[0], geom.bearings[-1], 51)
        np.testing.assert_allclose(geom.bearing_to_col(q), ref(q), atol=1e-4)
        # out-of-aperture -> -1 (fill value)
        assert geom.bearing_to_col(np.array([geom.bearings[-1] + 0.1])) == -1

    def test_beyond_linear(self):
        """On a non-uniform table, cubic differs measurably from linear —
        i.e. the upgrade is not a no-op."""
        geom, _ = SonarGeometry.from_ping(self._ping())
        q = (geom.bearings[:-1] + geom.bearings[1:]) / 2  # between knots
        lin = np.interp(q, geom.bearings, np.arange(geom.num_bearings))
        cub = geom.bearing_to_col(q)
        assert np.max(np.abs(lin - cub)) > 1e-4


class TestPSF:
    def test_table_shape_and_symmetry(self):
        psf = oculus_psf()
        assert psf.shape == (1, 512)
        assert psf.dtype == np.float32
        # measured main lobe: peak value 0.076, symmetric about the center
        assert psf.max() == pytest.approx(0.076, abs=1e-6)
        nz = np.nonzero(psf[0])[0]
        center = (nz[0] + nz[-1]) / 2
        row = psf[0]
        # the lobe is symmetric about 255.5 (two-sample peak plateau)
        for d in range(0, 40):
            assert row[255 - d] == pytest.approx(row[256 + d], abs=1e-6)
        assert center == pytest.approx(255.5, abs=0.5)

    def test_deconvolve_recovers_impulses_vs_numpy_oracle(self):
        """Forward-convolve impulses with the PSF (NumPy, circular), then
        deconvolve_ping must concentrate energy back at the impulse
        columns."""
        psf = oculus_psf()[0]
        R, C = 64, 512
        img = np.zeros((R, C), np.float32)
        impulses = [(10, 100), (30, 256), (50, 400)]
        # circular convolution along the bearing axis (numpy oracle)
        for r, c in impulses:
            img[r] += 200.0 * np.roll(psf / psf.max(), c - int(np.argmax(psf)))
        out = np.asarray(deconvolve_ping(jnp.asarray(img)))
        for r, c in impulses:
            pk = int(np.argmax(out[r]))
            assert abs(pk - c) <= 1, (r, c, pk)
            # energy concentration: the peak dominates its row far more than
            # in the blurred input
            blur_ratio = img[r, c] / np.sort(img[r])[-20]
            sharp_ratio = out[r, pk] / max(np.sort(out[r])[-20], 1e-9)
            assert sharp_ratio > blur_ratio

    def test_wiener_custom_psf_identity(self):
        """A delta PSF must reproduce the input (up to rescale)."""
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, size=(32, 64)).astype(np.float32)
        psf = np.zeros((1, 5), np.float32)
        psf[0, 2] = 1.0
        out = np.asarray(wiener_deconvolve(jnp.asarray(img),
                                           jnp.asarray(psf), noise=1e-6))
        np.testing.assert_allclose(out, img, rtol=0.02, atol=0.5)
