"""IMU preintegration on synthetic trajectories with known closed forms."""
import numpy as np
import jax.numpy as jnp

from keypoint_bench_tpu.tasks.imu import (preintegrate,
                                          gravity_aligned_deltas, GRAVITY)


def test_constant_rotation():
    # pure z-rotation at 0.5 rad/s for 1s at 200 Hz
    n = 200
    gyro = np.tile([0, 0, 0.5], (n, 1)).astype(np.float32)
    accel = np.zeros((n, 3), np.float32)
    dts = np.full(n, 1.0 / n, np.float32)
    pre = preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                       jnp.asarray(dts), jnp.ones(n, bool))
    ang = 0.5
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    np.testing.assert_allclose(np.asarray(pre["dR"]), R_true, atol=1e-3)
    np.testing.assert_allclose(float(pre["dt"]), 1.0, atol=1e-6)


def test_constant_acceleration():
    # body at rest orientation, accelerating 2 m/s^2 along x for 1s
    n = 400
    gyro = np.zeros((n, 3), np.float32)
    accel = np.tile([2.0, 0, 0], (n, 1)).astype(np.float32)
    dts = np.full(n, 1.0 / n, np.float32)
    pre = preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                       jnp.asarray(dts), jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(pre["dv"]), [2.0, 0, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(pre["dp"]), [1.0, 0, 0], atol=1e-2)


def test_mask_limits_interval():
    n = 100
    gyro = np.zeros((n, 3), np.float32)
    accel = np.tile([1.0, 0, 0], (n, 1)).astype(np.float32)
    dts = np.full(n, 0.01, np.float32)
    mask = np.zeros(n, bool)
    mask[:50] = True
    pre = preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                       jnp.asarray(dts), jnp.asarray(mask))
    np.testing.assert_allclose(float(pre["dt"]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre["dv"]), [0.5, 0, 0], atol=1e-3)


def test_gravity_aligned():
    # stationary IMU measuring only the specific force countering gravity:
    # world deltas must be ~zero
    n = 100
    gyro = np.zeros((n, 3), np.float32)
    accel = np.tile([0, 0, 9.81], (n, 1)).astype(np.float32)
    dts = np.full(n, 0.01, np.float32)
    pre = preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                       jnp.asarray(dts), jnp.ones(n, bool))
    dp, dv = gravity_aligned_deltas(pre, jnp.eye(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(dv), [0, 0, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(dp), [0, 0, 0], atol=1e-2)
