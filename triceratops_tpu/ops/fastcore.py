"""Fast likelihood-core internals: per-draw Chebyshev deficit proxy +
per-exposure Kepler solves.

Two exact-to-tolerance algebraic reductions make the chunked cores
compute-light on the VPU (see ops/lightcurve.py for the cores):

1. **Chebyshev deficit proxy.** For one draw, the occultation deficit is
   a 1-D function D(z) of the sky separation at fixed (k, u1, u2),
   piecewise-smooth on two segments: z in [0, |1-k|] (occulter fully
   inside / fully covering) and z in [|1-k|, 1+k] (partial overlap),
   with (contact)^{3/2} behavior at the segment ends. Sampling each
   segment at M Chebyshev-Gauss nodes and building a Chebyshev series
   via a DCT matmul (MXU) reduces the per-time-sample cost from a full
   kernel evaluation (~32 quadrature cosines) to a 2M-flop Clenshaw
   recurrence with no transcendentals. The theta-clustering of Chebyshev
   nodes absorbs the ^{3/2} endpoint singularities (|sin|^3 in theta,
   coefficient decay ~ m^-4), giving ~1e-7 absolute deficit error at
   M = 24 (tests/test_fastcore.py).

2. **Per-exposure Kepler.** The orbit is solved only at 3 points per
   exposure (center and edges) and z^2 is interpolated quadratically
   across the supersamples: z^2(t) is smooth on the ~2-minute exposure
   scale while the flux is not (contact kinks), so supersampling stays
   on the flux as in the reference (likelihoods.py:61) but the
   transcendental-heavy Kepler solve drops ~7x.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.kepler import projected_z, z2_taylor
from .occult import occult_quad_deficit

M_CHEB = 24

# Chebyshev-Gauss nodes theta_j = (j + 1/2) pi / M; DCT-II matrix rows
# give series coefficients c_m = (2/M) sum_j f(x_j) cos(m theta_j),
# with c_0 halved (so f(x) = sum_m c_m T_m(x) directly in Clenshaw).
_theta = (np.arange(M_CHEB) + 0.5) * np.pi / M_CHEB
_CHEB_X = np.cos(_theta)                                  # node positions
_DCT = (2.0 / M_CHEB) * np.cos(np.outer(np.arange(M_CHEB), _theta))
_DCT[0] *= 0.5
_DCT_T = np.ascontiguousarray(_DCT.T, dtype=np.float32)   # (M, M)
_CHEB_X32 = _CHEB_X.astype(np.float32)


def cheb_deficit_coeffs(k, u1, u2):
    """Per-draw Chebyshev series of D(z) on the two z-segments.

    Args: k, u1, u2 with shape (chunk,).
    Returns (cA, cB, zsplit, invA, invB, midA, midB): coefficient arrays
    (chunk, M) and the segment maps x = (z - mid) * inv.
    """
    k = k[:, None]
    zsplit = jnp.abs(1.0 - k)                 # inner contact
    zmax = 1.0 + k
    midA = zsplit / 2.0
    halfA = jnp.maximum(zsplit / 2.0, 1e-6)
    midB = (zsplit + zmax) / 2.0
    halfB = jnp.maximum((zmax - zsplit) / 2.0, 1e-6)
    x = jnp.asarray(_CHEB_X32)[None, :]
    zA = midA + halfA * x
    zB = midB + halfB * x
    u1b, u2b = u1[:, None], u2[:, None]
    DA = occult_quad_deficit(k, zA, u1b, u2b)
    DB = occult_quad_deficit(k, zB, u1b, u2b)
    dct = jnp.asarray(_DCT_T)
    cA = jnp.dot(DA, dct, preferred_element_type=jnp.float32)
    cB = jnp.dot(DB, dct, preferred_element_type=jnp.float32)
    return (cA, cB, zsplit[:, 0], 1.0 / halfA[:, 0], 1.0 / halfB[:, 0],
            midA[:, 0], midB[:, 0])


def _clenshaw_select(cA, cB, in_B, x):
    """One Clenshaw pass with per-point segment selection: the recurrence
    coefficient at each step is where(in_B, cB_m, cA_m). Exactly equal to
    evaluating both series and selecting, at ~2/3 the cost."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    two_x = 2.0 * x
    for m in range(M_CHEB - 1, 0, -1):
        cm = jnp.where(in_B, cB[:, m][:, None], cA[:, m][:, None])
        b1, b2 = cm + two_x * b1 - b2, b1
    c0 = jnp.where(in_B, cB[:, 0][:, None], cA[:, 0][:, None])
    return c0 + x * b1 - b2


def cheb_deficit_eval(coeffs, z):
    """D(z) from cheb_deficit_coeffs output; z: (chunk, P)."""
    cA, cB, zsplit, invA, invB, midA, midB = coeffs
    zs = zsplit[:, None]
    xA = jnp.clip((z - midA[:, None]) * invA[:, None], -1.0, 1.0)
    xB = jnp.clip((z - midB[:, None]) * invB[:, None], -1.0, 1.0)
    in_B = z >= zs
    x = jnp.where(in_B, xB, xA)
    D = _clenshaw_select(cA, cB, in_B, x)
    return jnp.clip(D, 0.0, 1.0)


def exposure_z2_poly(t_exp, h, P, a_R, inc, e, w):
    """Quadratic (Taylor) model of z^2 over each exposure from ONE
    Kepler solve with closed-form orbital derivatives (core/kepler.py
    z2_taylor); each avoided solve is ~13 ms per 1e6-draw core on TPU.

    t_exp: (n_t,) exposure centers; h: half exposure length (unused by
    the Taylor form, kept for signature stability). Per-draw orbital
    parameters shaped (chunk,). Returns (q0, q1, q2, front) with shapes
    (chunk, n_t): z^2(t_exp + d) ~= q0 + q1 d + q2 d^2.
    """
    del h
    te = t_exp[None, :]
    args = (P[:, None], a_R[:, None], inc[:, None], e[:, None], w[:, None])
    z2, dz2, d2z2, front = z2_taylor(te, 0.0, *args)
    return z2, dz2, 0.5 * d2z2, front


def z_supersampled(q0, q1, q2, offsets):
    """z at supersample offsets from the quadratic z^2 model.

    q*: (chunk, n_t); offsets: (ns,). Returns (chunk, ns, n_t): the
    supersample axis sits second-minor so the minor (lane) dimension is
    the n_t time axis — an (..., n_t, ns) layout would pad the ~6-wide
    supersample axis to the 128-lane TPU tile (21x HBM waste on every
    materialized intermediate)."""
    d = offsets[None, :, None]
    q0e, q1e, q2e = q0[:, None, :], q1[:, None, :], q2[:, None, :]
    z2 = q0e + q1e * d + q2e * d * d
    return jnp.sqrt(jnp.maximum(z2, 0.0))
