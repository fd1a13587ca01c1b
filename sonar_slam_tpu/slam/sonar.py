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

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

OCULUS_VERTICAL_APERTURE = {1: np.deg2rad(20.0), 2: np.deg2rad(12.0)}
OCULUS_PART_NUMBER = {1042: "M1200d", 1032: "M750d"}


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
        col_idx = np.round(
            np.interp(b, self.bearings, np.arange(self.num_bearings),
                      left=-1, right=-1)
        ).astype(np.int32)
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
    ipsf_f = jnp.conj(psf_f) / (jnp.abs(psf_f) ** 2 + noise)
    result = jnp.real(jnp.fft.ifft2(img_f * ipsf_f))
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
