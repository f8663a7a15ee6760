"""Pallas TPU kernel: fused supersample -> Chebyshev deficit -> chi^2.

Fuses the inner loop of the fast likelihood core (ops/fastcore.py) into
one VMEM-resident kernel over a (draw-tile x time-tile) grid: for each
tile it evaluates the supersampled separations from the per-exposure
quadratic z^2 model, runs the three-segment sqrt-map Clenshaw deficit
evaluation, applies the exposure quadrature weights, visibility gating
and dilution, and accumulates chi^2 against the observed deviations —
without materializing the (draws x time x supersample) intermediates in
HBM.

Out-of-transit skipping (the v2 schedule): chi^2 is accumulated in
*delta* form

    chi2 = sum_t obs^2  +  sum_t (2 obs g Dbar + g^2 Dbar^2),

so a (draw-tile, time-tile) whose every lane is out of transit
(z > z_max or occulter behind the star) contributes exactly zero and
the 18-step Clenshaw stream is skipped for it via ``pl.when``. With
t0 = 0 transits cluster around the window center, so edge time-tiles
skip for almost every draw — the dominant win over the XLA path, which
cannot branch per tile. The constant sum_t obs^2 is added outside the
kernel.

The XLA path (ops/lightcurve.py) remains the default reference
implementation; the Pallas path is enabled per-call (backend="pallas")
and falls back transparently off-TPU via the interpreter.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fastcore import M_CHEB

DRAW_TILE = 256
TIME_TILE = 128


def _clenshaw_tile(cA_ref, cB1_ref, cB2_ref, in_B1, in_B2, x):
    """One Clenshaw pass with per-point segment selection (see
    fastcore._clenshaw_select3)."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    two_x = 2.0 * x
    for m in range(M_CHEB - 1, 0, -1):
        cm = jnp.where(in_B2, cB2_ref[:, m][:, None],
                       jnp.where(in_B1, cB1_ref[:, m][:, None],
                                 cA_ref[:, m][:, None]))
        b1, b2 = cm + two_x * b1 - b2, b1
    c0 = jnp.where(in_B2, cB2_ref[:, 0][:, None],
                   jnp.where(in_B1, cB1_ref[:, 0][:, None],
                             cA_ref[:, 0][:, None]))
    return c0 + x * b1 - b2


def _chi2_kernel(offs, wgts, q0_ref, q1_ref, q2_ref, front_ref, cA_ref,
                 cB1_ref, cB2_ref, seg_ref, g_ref, obs_ref, chi2_ref):
    """One (draw-tile, time-tile): accumulate the chi^2 *delta* (see
    module docstring) over the exposure nodes.

    seg_ref columns: [zsplit, zmid, invA, invB1, invB2]."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        chi2_ref[:, :] = jnp.zeros((chi2_ref.shape[0], 1), jnp.float32)

    zsplit = seg_ref[:, 0][:, None]
    zmid = seg_ref[:, 1][:, None]
    invB2 = seg_ref[:, 4][:, None]
    zmax = zmid + 1.0 / invB2
    zmax2 = zmax * zmax

    q0 = q0_ref[:, :]
    q1 = q1_ref[:, :]
    q2 = q2_ref[:, :]
    front = front_ref[:, :]

    z2s = []
    vis = jnp.zeros_like(q0, dtype=jnp.bool_)
    for s in range(len(offs)):
        d = offs[s]
        z2 = q0 + q1 * d + q2 * (d * d)
        z2s.append(z2)
        vis = vis | (z2 < zmax2)
    any_active = jnp.any(vis & (front > 0.0))

    @pl.when(any_active)
    def _work():
        invA = seg_ref[:, 2][:, None]
        invB1 = seg_ref[:, 3][:, None]
        Dbar = jnp.zeros_like(q0)
        for s in range(len(offs)):
            z = jnp.sqrt(jnp.maximum(z2s[s], 0.0))
            in_B2 = z >= zmid
            in_B1 = (z >= zsplit) & ~in_B2
            sx = jnp.where(in_B2, (z - zmid) * invB2,
                           jnp.where(in_B1, (z - zsplit) * invB1,
                                     z * invA))
            sx = jnp.clip(sx, 0.0, 1.0)
            x = jnp.sqrt(sx) - jnp.sqrt(1.0 - sx)
            D = jnp.clip(_clenshaw_tile(cA_ref, cB1_ref, cB2_ref, in_B1,
                                        in_B2, x), 0.0, 1.0)
            Dbar = Dbar + wgts[s] * D
        gD = g_ref[:, 0][:, None] * (Dbar * front)
        obs = obs_ref[0, :][None, :]
        delta = jnp.sum(gD * (2.0 * obs + gD), axis=1)
        chi2_ref[:, 0] += delta


@functools.partial(jax.jit,
                   static_argnames=("offs", "wgts", "interpret"))
def chi2_supersampled(q0, q1, q2, front, cA, cB1, cB2, seg, g, obs_dev,
                      *, offs, wgts, interpret=False):
    """chi^2 (unnormalized by sigma) for one draw chunk.

    Args:
        q0,q1,q2: (C, n_t) per-exposure quadratic z^2 model.
        front: (C, n_t) visibility gate (f32 0/1).
        cA, cB1, cB2: (C, M) Chebyshev deficit coefficients per segment.
        seg: (C, 5) [zsplit, zmid, invA, invB1, invB2].
        g: (C, 1) dilution multiplier.
        obs_dev: (1, n_t) observed flux - 1.
        offs/wgts: exposure quadrature nodes/weights (static tuples).
    Returns:
        (C,) sum of squared residuals (divide by sigma^2 outside).
    """
    C, n_t = q0.shape
    if C % DRAW_TILE:
        raise ValueError(f"chunk {C} must be a multiple of {DRAW_TILE}")
    # pad the time axis to the tile lane width; padded lanes carry
    # front = 0 and obs = 0 so they contribute zero delta
    T = -(-n_t // TIME_TILE) * TIME_TILE
    if T != n_t:
        pt = ((0, 0), (0, T - n_t))
        q0 = jnp.pad(q0, pt)
        q1 = jnp.pad(q1, pt)
        q2 = jnp.pad(q2, pt)
        front = jnp.pad(front, pt)
        obs_dev = jnp.pad(obs_dev, pt)
    grid = (C // DRAW_TILE, T // TIME_TILE)
    dt = lambda shape: pl.BlockSpec(shape, lambda i, j: (i, j),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    row = lambda shape: pl.BlockSpec(shape, lambda i, j: (i, 0),  # noqa: E731
                                     memory_space=pltpu.VMEM)
    kern = functools.partial(_chi2_kernel, offs, wgts)
    delta = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            dt((DRAW_TILE, TIME_TILE)), dt((DRAW_TILE, TIME_TILE)),
            dt((DRAW_TILE, TIME_TILE)), dt((DRAW_TILE, TIME_TILE)),
            row((DRAW_TILE, M_CHEB)), row((DRAW_TILE, M_CHEB)),
            row((DRAW_TILE, M_CHEB)),
            row((DRAW_TILE, 5)), row((DRAW_TILE, 1)),
            pl.BlockSpec((1, TIME_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=row((DRAW_TILE, 1)),
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        interpret=interpret,
    )(q0, q1, q2, front, cA, cB1, cB2, seg, g, obs_dev)
    sum_obs2 = jnp.sum(obs_dev * obs_dev)
    return delta[:, 0] + sum_obs2
