"""Kepler-equation solver and sky-projected separation (JAX, branch-free).

Replaces the orbit machinery inside PyTransit's QuadraticModel
(reference: triceratops/likelihoods.py:61-71 passes t0=0, p, a/R_s, i, e,
w=(90-argp)*pi/180 and PyTransit solves the eccentric orbit internally).

Conventions (matching the standard transit convention PyTransit uses):
  * t0 is the transit (inferior conjunction) epoch: true anomaly
    nu_tc = pi/2 - w at t = t0.
  * w is the argument of periastron in radians (already converted by the
    caller via w = (90 - argp) * pi/180).
  * The planet is "in front" (transits rather than is occulted) when
    sin(w + nu) > 0.

The solver uses a fixed-iteration Newton scheme (branch-free, vmappable):
starter E0 = M + e sin M + e^2 sin M cos M, then NEWTON_ITERS Newton steps.
For e <= E_MAX = 0.995 this converges to f32 round-off (f64 residual
< 1e-10; validated in tests/test_kepler.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEWTON_ITERS = 8
E_MAX = 0.995  # eccentricity clamp; draws beyond this are unphysical here


def solve_kepler(M, e):
    """Solve E - e sin E = M for E. Branch-free fixed-iteration Newton."""
    e = jnp.clip(e, 0.0, E_MAX)
    sinM = jnp.sin(M)
    cosM = jnp.cos(M)
    E = M + e * sinM + e * e * sinM * cosM
    for _ in range(NEWTON_ITERS):
        sinE = jnp.sin(E)
        cosE = jnp.cos(E)
        f = E - e * sinE - M
        fp = 1.0 - e * cosE
        E = E - f / fp
    return E


def true_anomaly_from_E(E, e):
    e = jnp.clip(e, 0.0, E_MAX)
    sq = jnp.sqrt((1.0 + e) / (1.0 - e))
    return 2.0 * jnp.arctan2(sq * jnp.sin(E / 2.0), jnp.cos(E / 2.0))


def mean_anomaly_at_transit(e, w):
    """Mean anomaly at inferior conjunction (nu = pi/2 - w)."""
    e = jnp.clip(e, 0.0, E_MAX)
    nu_tc = jnp.pi / 2.0 - w
    E_tc = 2.0 * jnp.arctan2(
        jnp.sqrt(1.0 - e) * jnp.sin(nu_tc / 2.0),
        jnp.sqrt(1.0 + e) * jnp.cos(nu_tc / 2.0),
    )
    return E_tc - e * jnp.sin(E_tc)


def projected_z(t, t0, P, a_R, inc, e, w):
    """Sky-projected star-planet separation in stellar radii, plus
    visibility sign.

    Args:
        t: times [days]; broadcastable against the orbital parameters.
        t0: transit epoch [days].
        P: orbital period [days].
        a_R: semimajor axis in stellar radii.
        inc: inclination [radians].
        e: eccentricity.
        w: argument of periastron [radians].
    Returns:
        (z, front): separation in stellar radii, and boolean mask that is
        True when the planet is on the near side (transit visible).
    """
    e = jnp.clip(e, 0.0, E_MAX)
    M_tc = mean_anomaly_at_transit(e, w)
    M = M_tc + 2.0 * jnp.pi * (t - t0) / P
    E = solve_kepler(M, e)
    nu = true_anomaly_from_E(E, e)
    r_a = 1.0 - e * jnp.cos(E)
    swnu = jnp.sin(w + nu)
    z = a_R * r_a * jnp.sqrt(
        jnp.maximum(1.0 - jnp.sin(inc) ** 2 * swnu**2, 0.0)
    )
    return z, swnu > 0.0
