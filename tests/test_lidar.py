"""Golden parity tests: LiDARUtility codecs vs reference lidargen/utils/lidar.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lidarcrafter_tpu.utils.lidar import LiDARUtility, get_linear_ray_angles
from tests.reference_loader import load_ref_lidar

ref_lidar = load_ref_lidar()

H, W = 32, 1024
MIN_D, MAX_D = 1.45, 80.0


def _ref_utility(depth_format):
    angles = ref_lidar.get_linear_ray_angles(H=H, W=W, fov_up=10, fov_down=-30)
    return ref_lidar.LiDARUtility(
        resolution=(H, W),
        depth_format=depth_format,
        min_depth=MIN_D,
        max_depth=MAX_D,
        ray_angles=angles,
    )


def _jax_utility(depth_format):
    return LiDARUtility.create(
        resolution=(H, W),
        depth_format=depth_format,
        min_depth=MIN_D,
        max_depth=MAX_D,
    )


def test_ray_angles_match():
    ref = ref_lidar.get_linear_ray_angles(H=H, W=W, fov_up=10, fov_down=-30)
    ours = get_linear_ray_angles(H, W, fov_up=10.0, fov_down=-30.0)
    # ref: (1, 2, H, W); ours: (H, W, 2)
    np.testing.assert_allclose(
        np.asarray(ours), ref[0].permute(1, 2, 0).numpy(), rtol=0, atol=1e-6
    )


@pytest.mark.parametrize("fmt", ["log_depth", "inverse_depth", "depth"])
def test_depth_codecs_roundtrip_parity(fmt):
    rng = np.random.RandomState(0)
    metric = rng.uniform(0.0, 90.0, size=(2, 1, H, W)).astype(np.float32)
    ref_u = _ref_utility(fmt)
    jax_u = _jax_utility(fmt)

    ref_norm = ref_u.convert_depth(torch.from_numpy(metric)).numpy()
    ours_norm = np.asarray(
        jax_u.convert_depth(jnp.asarray(metric.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_norm, ref_norm, rtol=1e-4, atol=1e-4)

    ref_metric = ref_u.revert_depth(torch.from_numpy(ref_norm)).numpy()
    ours_metric = np.asarray(
        jax_u.revert_depth(jnp.asarray(ref_norm.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_metric, ref_metric, rtol=1e-4, atol=1e-3)


def test_to_xyz_parity():
    rng = np.random.RandomState(1)
    metric = rng.uniform(0.0, 90.0, size=(2, 1, H, W)).astype(np.float32)
    ref_u = _ref_utility("log_depth")
    jax_u = _jax_utility("log_depth")
    ref_xyz = ref_u.to_xyz(torch.from_numpy(metric)).numpy()
    ours = np.asarray(jax_u.to_xyz(jnp.asarray(metric.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        ours.transpose(0, 3, 1, 2), ref_xyz, rtol=1e-4, atol=1e-4
    )


def test_normalize_denormalize():
    x = jnp.linspace(0, 1, 11)
    np.testing.assert_allclose(
        np.asarray(LiDARUtility.denormalize(LiDARUtility.normalize(x))), np.asarray(x),
        atol=1e-7,
    )
