"""Fast likelihood-core internals: per-draw Chebyshev deficit proxy +
per-exposure Kepler solves.

Two exact-to-tolerance algebraic reductions make the chunked cores
compute-light on the VPU (see ops/lightcurve.py for the cores):

1. **Chebyshev deficit proxy.** For one draw, the occultation deficit is
   a 1-D function D(z) of the sky separation at fixed (k, u1, u2),
   piecewise-smooth on three segments: A = [0, |1-k|] (occulter fully
   inside / fully covering), B1 = [|1-k|, |1-k| + c] and
   B2 = [|1-k| + c, 1+k] (partial overlap), with (contact)^{3/2}
   behavior at the contact points z = |1-k| and z = 1+k. Each segment
   is parametrized by the *symmetric square-root map*

       s = (z - z_lo) / (z_hi - z_lo) in [0, 1],
       x = sqrt(s) - sqrt(1 - s)      in [-1, 1],

   whose inverse s(x) = ((x + sqrt(2 - x^2)) / 2)^2 is analytic with
   double zeros at both endpoints, so every (contact)^{3/2} term becomes
   (double zero)^{3/2} = analytic in x and the Chebyshev series
   converges geometrically instead of ~m^-4. Sampling each segment at
   M Chebyshev-Gauss nodes (in x) and building the series via a DCT
   matmul (MXU) reduces the per-time-sample cost from a full kernel
   evaluation (~16 quadrature cosines) to two square roots plus a
   2M-flop Clenshaw recurrence. The middle break c = clip(6|1-k|, 0.02,
   half-width) keeps the k ~ 1 twin regime's mirror branch point (at
   z = -|1-k|, which pinches B1's left end as k -> 1) far from the
   segment in mapped coordinates. Measured worst-case absolute deficit
   error over k in [0.01, 1.9] x physical (u1, u2), including the twin
   band k in [0.9, 1.1]: < 8e-7 in f64 at M = 18 (tests/test_fastcore.py;
   the earlier two-segment linear-map scheme was ~1e-4 worst-case in the
   twin band, VERDICT.md round-1 item 4).

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

M_CHEB = 18

# Chebyshev-Gauss nodes theta_j = (j + 1/2) pi / M; DCT-II matrix rows
# give series coefficients c_m = (2/M) sum_j f(x_j) cos(m theta_j),
# with c_0 halved (so f(x) = sum_m c_m T_m(x) directly in Clenshaw).
_theta = (np.arange(M_CHEB) + 0.5) * np.pi / M_CHEB
_CHEB_X = np.cos(_theta)                                  # node positions
_DCT = (2.0 / M_CHEB) * np.cos(np.outer(np.arange(M_CHEB), _theta))
_DCT[0] *= 0.5
_DCT_T = np.ascontiguousarray(_DCT.T)                     # (M, M) f64 master
# node positions in the segment coordinate s in [0, 1]: the inverse of
# the symmetric sqrt map x = sqrt(s) - sqrt(1-s) at the Chebyshev nodes
_S_NODES = (((_CHEB_X + np.sqrt(2.0 - _CHEB_X**2)) / 2.0) ** 2)

# middle-segment break: c = clip(_BREAK_SLOPE * |1-k|, _BREAK_FLOOR,
# (zmax - zsplit)/2); tuned so the worst-case proxy error stays < 8e-7
# over k in [0.01, 1.9] (see module docstring).
_BREAK_SLOPE = 6.0
_BREAK_FLOOR = 0.02


def cheb_deficit_coeffs(k, u1, u2):
    """Per-draw Chebyshev series of D(z) on the three z-segments, each
    under the symmetric sqrt map.

    Args: k, u1, u2 with shape (chunk,).
    Returns (cA, cB1, cB2, zsplit, zmid, invA, invB1, invB2):
    coefficient arrays (chunk, M) and the segment maps
    s = (z - z_lo) * inv, x = sqrt(s) - sqrt(1 - s).
    """
    k = k[:, None]
    zsplit = jnp.abs(1.0 - k)                 # inner contact
    zmax = 1.0 + k
    c = jnp.clip(_BREAK_SLOPE * zsplit, _BREAK_FLOOR, (zmax - zsplit) / 2.0)
    zmid = zsplit + c
    wA = jnp.maximum(zsplit, 1e-6)
    # width floors: at k == 0, c collapses to 0 and invB1/invB2 would be
    # inf -> NaN deficits for z >= zsplit. Degenerate draws are normally
    # masked upstream, but an unmasked k = 0 lane must stay finite.
    wB1 = jnp.maximum(c, 1e-6)
    wB2 = jnp.maximum(zmax - zmid, 1e-6)
    dtype = jnp.result_type(k.dtype, jnp.float32)
    s = jnp.asarray(_S_NODES, dtype)[None, :]
    zA = wA * s
    zB1 = zsplit + wB1 * s
    zB2 = zmid + wB2 * s
    u1b, u2b = u1[:, None], u2[:, None]
    DA = occult_quad_deficit(k, zA, u1b, u2b)
    DB1 = occult_quad_deficit(k, zB1, u1b, u2b)
    DB2 = occult_quad_deficit(k, zB2, u1b, u2b)
    dct = jnp.asarray(_DCT_T, DA.dtype)
    cA = jnp.dot(DA, dct, preferred_element_type=DA.dtype)
    cB1 = jnp.dot(DB1, dct, preferred_element_type=DA.dtype)
    cB2 = jnp.dot(DB2, dct, preferred_element_type=DA.dtype)
    return (cA, cB1, cB2, zsplit[:, 0], zmid[:, 0], 1.0 / wA[:, 0],
            1.0 / wB1[:, 0], 1.0 / wB2[:, 0])


def _clenshaw_select3(cA, cB1, cB2, in_B1, in_B2, x):
    """One Clenshaw pass with per-point segment selection: the recurrence
    coefficient at each step is the active segment's. Exactly equal to
    evaluating all three series and selecting, at ~1/3 the cost."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    two_x = 2.0 * x
    for m in range(M_CHEB - 1, 0, -1):
        cm = jnp.where(in_B2, cB2[:, m][:, None],
                       jnp.where(in_B1, cB1[:, m][:, None],
                                 cA[:, m][:, None]))
        b1, b2 = cm + two_x * b1 - b2, b1
    c0 = jnp.where(in_B2, cB2[:, 0][:, None],
                   jnp.where(in_B1, cB1[:, 0][:, None], cA[:, 0][:, None]))
    return c0 + x * b1 - b2


def cheb_deficit_eval(coeffs, z):
    """D(z) from cheb_deficit_coeffs output; z: (chunk, P)."""
    cA, cB1, cB2, zsplit, zmid, invA, invB1, invB2 = coeffs
    zs = zsplit[:, None]
    zm = zmid[:, None]
    in_B2 = z >= zm
    in_B1 = (z >= zs) & ~in_B2
    s = jnp.where(in_B2, (z - zm) * invB2[:, None],
                  jnp.where(in_B1, (z - zs) * invB1[:, None],
                            z * invA[:, None]))
    s = jnp.clip(s, 0.0, 1.0)
    x = jnp.sqrt(s) - jnp.sqrt(1.0 - s)
    D = _clenshaw_select3(cA, cB1, cB2, in_B1, in_B2, x)
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
