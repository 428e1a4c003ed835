"""IMU preintegration between camera frames.

The reference reads EuRoC IMU CSVs but its integration is a commented-out
stub (datasets/euroc.py:46-56, SURVEY.md §2.5). This is a real implementation:
discrete preintegration of gyro/accel samples on SO3 x R^3, jitted as a
`lax.scan` over samples — delta rotation / velocity / position between two
timestamps, usable as a motion prior for VO scale or pose-graph edges.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from keypoint_bench_tpu.ba.gauss_newton import _exp_so3

GRAVITY = jnp.asarray([0.0, 0.0, -9.81])


@functools.partial(jax.jit, static_argnames=())
def preintegrate(gyro: jnp.ndarray, accel: jnp.ndarray, dts: jnp.ndarray,
                 mask: jnp.ndarray):
    """Integrate IMU samples into frame-to-frame deltas.

    gyro, accel: [N, 3] (rad/s, m/s^2 in body frame); dts [N] seconds between
    consecutive samples; mask [N] selects the samples of this interval.
    Returns dict with dR [3,3] (body rotation over the interval), dv [3],
    dp [3] (velocity/position deltas in the initial body frame, gravity NOT
    removed — subtract R0^T g dt terms at use site), dt total.
    """

    def step(carry, inp):
        R, v, p = carry
        w, a, dt, m = inp
        dt = dt * m
        dR = _exp_so3(w * dt)
        a_world = R @ a
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        R = R @ dR
        return (R, v, p), None

    init = (jnp.eye(3), jnp.zeros(3), jnp.zeros(3))
    (R, v, p), _ = jax.lax.scan(step, init,
                                (gyro, accel, dts, mask.astype(jnp.float32)))
    return {"dR": R, "dv": v, "dp": p,
            "dt": jnp.sum(dts * mask.astype(jnp.float32))}


def gravity_aligned_deltas(pre: dict, R_wb0: jnp.ndarray, v0: jnp.ndarray):
    """Convert body-frame preintegrated deltas into world-frame motion given
    the initial orientation R_wb0 (world-from-body) and velocity v0:
        p1 = p0 + v0 dt + 1/2 g dt^2 + R_wb0 dp
        v1 = v0 + g dt + R_wb0 dv
    Returns (dp_world, dv_world) including gravity."""
    dt = pre["dt"]
    dp = v0 * dt + 0.5 * GRAVITY * dt * dt + R_wb0 @ pre["dp"]
    dv = GRAVITY * dt + R_wb0 @ pre["dv"]
    return dp, dv
