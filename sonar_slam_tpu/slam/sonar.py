"""Oculus imaging-sonar geometry + intensity model.

Rebuild of `OculusProperty` (`/root/reference/bruce_slam/src/bruce_slam/
sonar.py:68-307`) as a static geometry pytree plus pure JAX ops:

* range/bearing tables and apertures (`sonar.py:181-245`),
* polar→Cartesian rectification as a precomputed gather (replaces
  ``cv2.remap`` with INTER_NEAREST, `sonar.py:247-256`),
* gamma adjustment (`sonar.py:258-260`) and the gamma *decompression* applied
  when decoding ping images (`utils/conversions.py:217-247` r2n),
* Wiener-style PSF deconvolution via jnp.fft (`sonar.py:262-290`),
* a field-of-view membership test replacing the shapely polygon gating
  (`sonar.py:292-307`).

Model table (`sonar.py:69-70`): M750d (part 1032) / M1200d (part 1042);
vertical aperture 20° in low-frequency mode, 12° in high-frequency mode.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

OCULUS_VERTICAL_APERTURE = {1: np.deg2rad(20.0), 2: np.deg2rad(12.0)}
OCULUS_PART_NUMBER = {1042: "M1200d", 1032: "M750d"}

_PSF_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "oculus_psf.npy",
)
_psf_cache: np.ndarray | None = None


def oculus_psf() -> np.ndarray:
    """The measured 1x512 Oculus bearing point-spread function.

    Data table from the reference (`sonar.py:72-137`, itself derived from the
    public multibeam package's PSF measurement): a symmetric main lobe with
    sidelobes across the bearing axis, used to deconvolve the sonar's beam
    pattern. Stored as a binary table (data, not code) in
    ``sonar_slam_tpu/data/oculus_psf.npy``.
    """
    global _psf_cache
    if _psf_cache is None:
        _psf_cache = np.load(_PSF_PATH).astype(np.float32)
    return _psf_cache


class OculusFireMsg(NamedTuple):
    """Decoded Oculus fire message (`sonar.py:10-66`).

    ``gamma`` is the RAW byte (0/0xff = 1.0, 127 = 0.5) — the value
    ``decompress_gamma`` expects; ``gamma_normalized`` is the reference's
    ``gamma / 255`` convenience.
    """

    mode: int  # 1 = low frequency (wide), 2 = high frequency (narrow)
    gamma: int  # raw gamma-correction byte
    flags: int
    range: float  # range demand: percent or meters, per flag bit 0
    gain: float
    speed_of_sound: float  # m/s; 0 = sonar-internal calc from salinity
    salinity: float  # ppt; 0 = fresh, 35 = salt water

    # flag bits (`sonar.py:20-26`)
    @property
    def range_in_meters(self) -> bool:
        return bool(self.flags & 0x01)

    @property
    def data_is_16bit(self) -> bool:
        return bool(self.flags & 0x02)

    @property
    def sends_gain(self) -> bool:
        return bool(self.flags & 0x04)

    @property
    def simple_return(self) -> bool:
        return bool(self.flags & 0x08)

    @property
    def gain_assist(self) -> bool:
        return bool(self.flags & 0x10)

    @property
    def low_power(self) -> bool:
        return bool(self.flags & 0x20)

    @property
    def gamma_normalized(self) -> float:
        return self.gamma / 255.0

    def effective_speed_of_sound(self, temperature_c: float = 10.0,
                                 depth_m: float = 10.0) -> float:
        """Speed of sound actually in effect: the demanded value, or — when
        the fire message demands 0 — the "internal calc ... using salinity"
        (`sonar.py:28`), here Mackenzie's nine-term equation (JASA 1981)."""
        if self.speed_of_sound > 0:
            return float(self.speed_of_sound)
        t, s, d = temperature_c, self.salinity, depth_m
        return (
            1448.96 + 4.591 * t - 5.304e-2 * t**2 + 2.374e-4 * t**3
            + 1.340 * (s - 35) + 1.630e-2 * d + 1.675e-7 * d**2
            - 1.025e-2 * t * (s - 35) - 7.139e-13 * t * d**3
        )

    @staticmethod
    def decode(msg: dict) -> "OculusFireMsg":
        """Decode from a generically-parsed `sonar_oculus/OculusFire` dict
        (as produced by `io.rosbag`). Mirrors `OculusFireMsg.configure`
        (`sonar.py:43-50`) but keeps the raw gamma byte."""
        return OculusFireMsg(
            mode=int(msg.get("mode", 1)),
            gamma=int(msg.get("gamma", 0)),
            flags=int(msg.get("flags", 0)),
            range=float(msg.get("range", 0.0)),
            gain=float(msg.get("gain", 0.0)),
            speed_of_sound=float(msg.get("speed_of_sound", 0.0)),
            salinity=float(msg.get("salinity", 0.0)),
        )


@dataclass(frozen=True)
class SonarGeometry:
    """Static per-configuration sonar geometry (rebuilt when the ping header
    changes, as in `OculusProperty.configure`, `sonar.py:181-245`)."""

    num_ranges: int
    num_bearings: int
    range_resolution: float
    bearings: np.ndarray  # (C,) radians, ascending
    model: str = "M750d"
    vertical_aperture: float = float(np.deg2rad(20.0))

    @property
    def ranges(self) -> np.ndarray:
        # r[i] = (i + 1) * resolution (`sonar.py:197-200`)
        return self.range_resolution * (1 + np.arange(self.num_ranges))

    @property
    def max_range(self) -> float:
        return float(self.num_ranges * self.range_resolution)

    @property
    def horizontal_aperture(self) -> float:
        return float(abs(self.bearings[-1] - self.bearings[0]))

    @property
    def angular_resolution(self) -> float:
        return self.horizontal_aperture / self.num_bearings

    # ------------------------------------------------------------------
    # bearing <-> column interpolants (cubic, like the reference's
    # interp1d(kind="cubic") b2c/c2b at `sonar.py:213-228`; the bearing
    # table of a real Oculus ping is NOT uniformly spaced, so linear
    # interpolation biases off-axis columns)
    # ------------------------------------------------------------------
    def _interp(self, name: str, x: np.ndarray, y: np.ndarray):
        cache = self.__dict__.get("_interp_cache")
        if cache is None:
            cache = {}
            object.__setattr__(self, "_interp_cache", cache)
        if name not in cache:
            from scipy.interpolate import interp1d

            kind = "cubic" if len(x) >= 4 else "linear"
            cache[name] = interp1d(
                x, y, kind=kind, bounds_error=False, fill_value=-1,
                assume_sorted=True,
            )
        return cache[name]

    def bearing_to_col(self, bearings) -> np.ndarray:
        """Continuous column of each bearing (rad); -1 outside the aperture
        (`sonar.py:213-220` b2c)."""
        f = self._interp("b2c", np.asarray(self.bearings, np.float64),
                         np.arange(self.num_bearings, dtype=np.float64))
        return np.asarray(f(bearings), np.float32)

    def col_to_bearing(self, cols) -> np.ndarray:
        """Bearing (rad) at each continuous column; -1 outside
        (`sonar.py:221-228` c2b)."""
        f = self._interp("c2b", np.arange(self.num_bearings, dtype=np.float64),
                         np.asarray(self.bearings, np.float64))
        return np.asarray(f(cols), np.float32)

    @staticmethod
    def from_ping(ping: dict) -> "tuple[SonarGeometry, OculusFireMsg]":
        """Build geometry + fire msg from a decoded `sonar_oculus/OculusPing`
        dict (mirrors `OculusProperty.configure`, `sonar.py:181-245`):
        bearings arrive as int16 centidegrees, the model from part_number
        (absent on old bags -> M750d), the vertical aperture from the fire
        message's frequency mode."""
        fire = OculusFireMsg.decode(ping.get("fire_msg", {}))
        part = int(ping.get("part_number", 1032))
        model = OCULUS_PART_NUMBER.get(part, "M750d")
        bearings = np.deg2rad(
            np.asarray(ping["bearings"], np.float32) / 100.0
        ).astype(np.float32)
        geom = SonarGeometry(
            num_ranges=int(ping["num_ranges"]),
            num_bearings=len(bearings),
            range_resolution=float(ping["range_resolution"]),
            bearings=bearings,
            model=model,
            vertical_aperture=float(
                OCULUS_VERTICAL_APERTURE.get(fire.mode, np.deg2rad(20.0))
            ),
        )
        return geom, fire

    @staticmethod
    def make(
        num_ranges: int = 512,
        num_bearings: int = 256,
        max_range: float = 30.0,
        horizontal_aperture: float = float(np.deg2rad(130.0)),
        model: str = "M750d",
        mode: int = 1,
    ) -> "SonarGeometry":
        """Construct a typical geometry (defaults follow `sonar.py:151-162`)."""
        bearings = np.linspace(
            -horizontal_aperture / 2, horizontal_aperture / 2, num_bearings
        ).astype(np.float32)
        return SonarGeometry(
            num_ranges=num_ranges,
            num_bearings=num_bearings,
            range_resolution=max_range / num_ranges,
            bearings=bearings,
            model=model,
            vertical_aperture=float(OCULUS_VERTICAL_APERTURE[mode]),
        )

    # ------------------------------------------------------------------
    # polar cell -> body-frame Cartesian point tables
    # ------------------------------------------------------------------
    def cell_points(self) -> np.ndarray:
        """(R, C, 2) body-frame (x fwd, y lateral) point of each polar cell.

        This is the direct geometric mapping the reference approximates by
        rasterizing through the Cartesian image and reading pixel centers
        (`feature_extraction.py:231-238` + `slam_ros.py:169-170` net effect:
        a detection at range rho / bearing beta lands at (rho cos b, rho sin
        b)). We emit the exact continuous point — higher fidelity, same
        convention (documented divergence: no pixel quantization).
        """
        r = self.ranges[:, None]
        b = self.bearings[None, :]
        return np.stack([r * np.cos(b), r * np.sin(b)], axis=-1).astype(np.float32)

    # ------------------------------------------------------------------
    # Cartesian visualization remap (cv2.remap INTER_NEAREST equivalent)
    # ------------------------------------------------------------------
    def cart_image_shape(self) -> tuple[int, int]:
        height = self.max_range
        width = np.sin((self.bearings[-1] - self.bearings[0]) / 2) * height * 2
        cols = int(np.ceil(width / self.range_resolution))
        return self.num_ranges, cols

    def cart_gather_indices(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(rows, cols) index maps + validity for polar->Cartesian gather.

        Mirrors `OculusProperty.configure`'s remap tables (`sonar.py:231-243`)
        with nearest-neighbor interpolation.
        """
        rows, cols = self.cart_image_shape()
        XX, YY = np.meshgrid(np.arange(cols), np.arange(rows))
        x = self.range_resolution * (rows - YY)
        y = self.range_resolution * (-cols / 2.0 + XX + 0.5)
        b = np.arctan2(y, x)
        r = np.sqrt(x**2 + y**2)
        row_idx = np.round(r / self.range_resolution - 1).astype(np.int32)
        # cubic bearing->column mapping (`sonar.py:213-220,241`), significant
        # when the real bearing table is non-uniform
        col_idx = np.round(self.bearing_to_col(b)).astype(np.int32)
        valid = (
            (row_idx >= 0)
            & (row_idx < self.num_ranges)
            & (col_idx >= 0)
            & (col_idx < self.num_bearings)
            & (b >= self.bearings[0])
            & (b <= self.bearings[-1])
        )
        return (
            np.clip(row_idx, 0, self.num_ranges - 1),
            np.clip(col_idx, 0, self.num_bearings - 1),
            valid,
        )


def remap_polar_to_cart(img: jax.Array, row_idx, col_idx, valid) -> jax.Array:
    """Rectify a polar image to Cartesian with a precomputed gather
    (``OculusProperty.remap``, `sonar.py:247-256`)."""
    out = img[row_idx, col_idx]
    return jnp.where(valid, out, 0)


def adjust_gamma(img: jax.Array, gamma: float = 1.0) -> jax.Array:
    """(img/255)^gamma * 255 (`sonar.py:258-260`)."""
    return jnp.power(img / 255.0, gamma) * 255.0


def decompress_gamma(img: jax.Array, gamma: float) -> jax.Array:
    """Undo the sonar's on-device gamma: clip(pow(i/255, 255/gamma)*255)
    (`utils/conversions.py:239-243`). ``gamma`` is the raw fire-msg byte."""
    out = jnp.power(img / 255.0, 255.0 / gamma) * 255.0
    return jnp.clip(out, 0, 255)


def deconvolve_ping(img: jax.Array, noise: float = 0.01) -> jax.Array:
    """Default deconvolution path: Wiener inverse filtering with the measured
    Oculus bearing PSF (`sonar.py:72-137,262-290`: noise=0.01 and the 1x512
    table are the reference defaults)."""
    return wiener_deconvolve(img, jnp.asarray(oculus_psf()), noise)


def wiener_deconvolve(img: jax.Array, psf: jax.Array, noise: float = 0.01) -> jax.Array:
    """Remove the bearing impulse response by Wiener-style inverse filtering.

    Port of capability at `sonar.py:262-290` (itself derived from the public
    multibeam package): divide the image spectrum by the PSF spectrum with a
    noise-regularized inverse, recenter, clip, and rescale to the input peak.
    Implemented with jnp.fft so it runs on-device.
    """
    img = img.astype(jnp.float32)
    kh, kw = psf.shape
    psf_padded = jnp.zeros_like(img).at[:kh, :kw].set(psf)
    img_f = jnp.fft.fft2(img)
    psf_f = jnp.fft.fft2(psf_padded)
    # NOT conjugated — the reference multiplies the raw psf spectrum
    # (cv2.mulSpectrums flags=0, `sonar.py:278-280`), which pairs with its
    # roll(-k//2) recentering for the near-symmetric measured PSF; a
    # conjugated Wiener filter here would land one column off.
    ipsf_f = psf_f / (jnp.abs(psf_f) ** 2 + noise)
    result = jnp.real(jnp.fft.ifft2(img_f * ipsf_f))
    # documented divergence: the reference's `-kh // 2` floor-divides to -1
    # for its 1-row PSF (`sonar.py:283`), shifting every range up one bin;
    # we keep the intended no-op recentering -(kh//2) = 0 for kh=1
    result = jnp.roll(result, -(kh // 2), axis=0)
    result = jnp.roll(result, -(kw // 2), axis=1)
    result = jnp.maximum(result, 0.0)
    scale = jnp.max(img) / jnp.maximum(jnp.max(result), 1e-9)
    return result * scale


def points_in_fov(
    points: jax.Array,
    pose: jax.Array,
    max_range: float | jax.Array,
    half_aperture: float | jax.Array,
    range_pad: jax.Array = 0.0,
    bearing_pad: jax.Array = 0.0,
) -> jax.Array:
    """Which global-frame points fall inside the (padded) sonar FOV wedge at
    ``pose``. Replaces both the shapely polygon (`sonar.py:292-307`) and the
    5-sigma range/bearing gate of the NSSM target search (`slam.py:884-895`).
    """
    from ..geometry import se2_inverse, se2_transform_points

    local = se2_transform_points(points, se2_inverse(pose))
    ranges = jnp.linalg.norm(local, axis=-1)
    bearings = jnp.arctan2(local[..., 1], local[..., 0])
    return (ranges < max_range + range_pad) & (
        jnp.abs(bearings) < half_aperture + bearing_pad
    )
