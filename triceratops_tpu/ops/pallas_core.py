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


# ---------------------------------------------------------------------------
# v3 schedule: draws on lanes, time on sublanes. MEASURED SLOWER than
# v2 on the v5e at the benchmark shapes — kept as a documented negative
# result and for experimentation (TRICERATOPS_PALLAS_V=3).
#
# Motivation: with the v2 layout (draws x time) the time axis occupies
# the 128-wide lane dimension, so a ~100-point light curve is ONE time
# tile and the out-of-transit skip never fires. v3 transposes the
# tiling: draws fill the lanes and time runs over sublanes in
# TIME_SUB-row blocks, so early/late time blocks (out of transit for
# every draw; transits share t0 = 0) can skip the Clenshaw stream.
# Measured per 1e6-draw planet core: (128, 8) tiles 271 ms, (256, 32)
# 188 ms — vs v2's 171 ms and XLA's 206 ms. The per-grid-step overhead
# (1664 steps/chunk at (128, 8)) and the mixed in/out-of-transit lanes
# of the central time blocks eat the skip savings at n_t ~ 100; the
# schedule may still win for long unbinned curves (n_t >> 128) where
# v2's lane tiles are many and mostly out of transit.
# ---------------------------------------------------------------------------

import os as _os

DRAW_LANES = int(_os.environ.get("TRICERATOPS_PALLAS_DRAW_LANES", 128))
TIME_SUB = int(_os.environ.get("TRICERATOPS_PALLAS_TIME_SUB", 8))


def _chi2_kernel_v3(offs, wgts, q0_ref, q1_ref, q2_ref, front_ref, cA_ref,
                    cB1_ref, cB2_ref, seg_ref, g_ref, obs_ref, chi2_ref):
    """One (draw-tile, time-block): accumulate the chi^2 delta.

    Transposed refs: q*_ref/front_ref (TIME_SUB, DRAW_LANES), obs_ref
    (TIME_SUB, 1), seg_ref (DRAW_LANES, 5) -> rows broadcast along
    sublanes, coefficients (DRAW_LANES, M) selected per lane."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        chi2_ref[:, :] = jnp.zeros((1, chi2_ref.shape[1]), jnp.float32)

    zsplit = seg_ref[:, 0][None, :]
    zmid = seg_ref[:, 1][None, :]
    invB2 = seg_ref[:, 4][None, :]
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
        invA = seg_ref[:, 2][None, :]
        invB1 = seg_ref[:, 3][None, :]
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
            b1 = jnp.zeros_like(x)
            b2 = jnp.zeros_like(x)
            two_x = 2.0 * x
            for m in range(M_CHEB - 1, 0, -1):
                cm = jnp.where(in_B2, cB2_ref[:, m][None, :],
                               jnp.where(in_B1, cB1_ref[:, m][None, :],
                                         cA_ref[:, m][None, :]))
                b1, b2 = cm + two_x * b1 - b2, b1
            c0 = jnp.where(in_B2, cB2_ref[:, 0][None, :],
                           jnp.where(in_B1, cB1_ref[:, 0][None, :],
                                     cA_ref[:, 0][None, :]))
            D = jnp.clip(c0 + x * b1 - b2, 0.0, 1.0)
            Dbar = Dbar + wgts[s] * D
        gD = g_ref[0, :][None, :] * (Dbar * front)
        obs = obs_ref[:, 0][:, None]
        delta = jnp.sum(gD * (2.0 * obs + gD), axis=0)
        chi2_ref[0, :] += delta


@functools.partial(jax.jit,
                   static_argnames=("offs", "wgts", "interpret"))
def chi2_supersampled_v3(q0, q1, q2, front, cA, cB1, cB2, seg, g, obs_dev,
                        *, offs, wgts, interpret=False):
    """chi^2 (unnormalized by sigma) for one draw chunk, v3 schedule.

    Same contract as chi2_supersampled; inputs arrive draw-major
    ((C, n_t)) and are transposed here (XLA fuses the transpose into
    the producers)."""
    C, n_t = q0.shape
    if C % DRAW_LANES:
        raise ValueError(f"chunk {C} must be a multiple of {DRAW_LANES}")
    T = -(-n_t // TIME_SUB) * TIME_SUB
    pt = ((0, 0), (0, T - n_t))
    q0t = jnp.pad(q0, pt).T
    q1t = jnp.pad(q1, pt).T
    q2t = jnp.pad(q2, pt).T
    frontt = jnp.pad(front, pt).T
    obs_t = jnp.pad(obs_dev, ((0, 0), (0, T - n_t)))[0][:, None]
    grid = (C // DRAW_LANES, T // TIME_SUB)
    kern = functools.partial(_chi2_kernel_v3, offs, wgts)
    tblock = lambda: pl.BlockSpec((TIME_SUB, DRAW_LANES),  # noqa: E731
                                  lambda i, j: (j, i),
                                  memory_space=pltpu.VMEM)
    drow = lambda shape: pl.BlockSpec(shape, lambda i, j: (i, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    delta = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            tblock(), tblock(), tblock(), tblock(),
            drow((DRAW_LANES, M_CHEB)), drow((DRAW_LANES, M_CHEB)),
            drow((DRAW_LANES, M_CHEB)), drow((DRAW_LANES, 5)),
            pl.BlockSpec((1, DRAW_LANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TIME_SUB, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, DRAW_LANES), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        interpret=interpret,
    )(q0t, q1t, q2t, frontt, cA, cB1, cB2, seg, g.reshape(1, C), obs_t)
    sum_obs2 = jnp.sum(obs_dev * obs_dev)
    return delta[0, :] + sum_obs2
