"""Visualization helpers smoke tests (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import matplotlib.pyplot as plt
import pytest

from sonar_slam_tpu.utils.viz import (
    plot_trajectory,
    plot_cov_ellipse,
    plot_constraints,
    plot_occupancy,
    feature_overlay,
)
from sonar_slam_tpu.mapping import MappingConfig
from sonar_slam_tpu.slam.sonar import SonarGeometry

rng = np.random.default_rng(3)


def test_trajectory_and_constraints(tmp_path):
    fig, ax = plt.subplots()
    poses = np.cumsum(rng.normal(size=(20, 3)), axis=0)
    plot_trajectory(poses, ax=ax)
    plot_trajectory(poses + 1, ax=ax, color_by_index=False, color="orange")
    plot_constraints(poses, loops_i=[2, 5], loops_j=[15, 18], ax=ax)
    plot_cov_ellipse(poses[3], np.diag([0.5, 0.2, 0.1]), ax=ax, color="blue")
    fig.savefig(tmp_path / "traj.png")
    assert (tmp_path / "traj.png").exists()


def test_occupancy_render(tmp_path):
    cfg = MappingConfig(x0=-10, y0=-10, width=20, height=20, resolution=0.5)
    grid = np.full((cfg.rows, cfg.cols), -1, np.int8)
    grid[10:20, 10:20] = 90
    grid[5:10, 5:10] = 0
    fig, ax = plt.subplots()
    plot_occupancy(grid, cfg, ax=ax)
    fig.savefig(tmp_path / "occ.png")
    assert (tmp_path / "occ.png").exists()


def test_feature_overlay(tmp_path):
    geom = SonarGeometry.make(num_ranges=64, num_bearings=32, max_range=10.0)
    img = rng.exponential(10.0, size=(64, 32)).astype(np.float32)
    det = np.zeros((64, 32), bool)
    det[30, 16] = True
    fig, ax = plt.subplots()
    feature_overlay(img, det, geom, ax=ax)
    fig.savefig(tmp_path / "overlay.png")
    assert (tmp_path / "overlay.png").exists()
