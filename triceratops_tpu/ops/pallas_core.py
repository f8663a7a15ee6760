"""Pallas TPU kernel: fused supersample -> Chebyshev deficit -> chi^2.

Fuses the inner loop of the fast likelihood core (ops/fastcore.py) into
one VMEM-resident kernel over a draw-tile grid: for each draw tile it
evaluates the supersampled separations from the per-exposure quadratic
z^2 model, runs the two-segment Clenshaw deficit evaluation, applies the
exposure quadrature weights, visibility gating and dilution, and
accumulates chi^2 against the observed deviations — without ever
materializing the (draws x time x supersample) intermediates in HBM.

The XLA path (ops/lightcurve.py) remains the default reference
implementation; the Pallas path is enabled per-call (pallas=True) and
falls back transparently off-TPU via the interpreter.
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
    """One draw tile: accumulate the weighted-mean deficit over the
    supersample nodes, then chi^2 over the time axis.

    seg_ref columns: [zsplit, zmid, invA, invB1, invB2]."""
    zsplit = seg_ref[:, 0][:, None]
    zmid = seg_ref[:, 1][:, None]
    invA = seg_ref[:, 2][:, None]
    invB1 = seg_ref[:, 3][:, None]
    invB2 = seg_ref[:, 4][:, None]
    q0 = q0_ref[:, :]
    q1 = q1_ref[:, :]
    q2 = q2_ref[:, :]

    Dbar = jnp.zeros_like(q0)
    for s in range(len(offs)):
        d = offs[s]
        z2 = q0 + q1 * d + q2 * (d * d)
        z = jnp.sqrt(jnp.maximum(z2, 0.0))
        in_B2 = z >= zmid
        in_B1 = (z >= zsplit) & ~in_B2
        sx = jnp.where(in_B2, (z - zmid) * invB2,
                       jnp.where(in_B1, (z - zsplit) * invB1, z * invA))
        sx = jnp.clip(sx, 0.0, 1.0)
        x = jnp.sqrt(sx) - jnp.sqrt(1.0 - sx)
        D = jnp.clip(_clenshaw_tile(cA_ref, cB1_ref, cB2_ref, in_B1,
                                    in_B2, x), 0.0, 1.0)
        Dbar = Dbar + wgts[s] * D
    Dbar = Dbar * front_ref[:, :]
    resid = obs_ref[0, :][None, :] + g_ref[:, 0][:, None] * Dbar
    chi2_ref[:, 0] = jnp.sum(resid * resid, axis=1)


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
    grid = (C // DRAW_TILE,)
    row = lambda i: (i, 0)  # noqa: E731
    tile = lambda shape: pl.BlockSpec(shape, row, memory_space=pltpu.VMEM)  # noqa: E731
    kern = functools.partial(_chi2_kernel, offs, wgts)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            tile((DRAW_TILE, n_t)), tile((DRAW_TILE, n_t)),
            tile((DRAW_TILE, n_t)), tile((DRAW_TILE, n_t)),
            tile((DRAW_TILE, M_CHEB)), tile((DRAW_TILE, M_CHEB)),
            tile((DRAW_TILE, M_CHEB)),
            tile((DRAW_TILE, 5)), tile((DRAW_TILE, 1)),
            pl.BlockSpec((1, n_t), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tile((DRAW_TILE, 1)),
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        interpret=interpret,
    )(q0, q1, q2, front, cA, cB1, cB2, seg, g, obs_dev)
    return out[:, 0]
