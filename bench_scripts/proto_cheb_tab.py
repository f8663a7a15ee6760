"""Prototype: k-tabulated Chebyshev basis coefficients for the deficit
proxy (coeffs-v2).

The per-draw coefficient stage (ops/fastcore.cheb_deficit_coeffs) derives
the 3x18 Chebyshev series of D(z) from 54 exact kernel node evaluations
per draw (~29 ms of the ~115 ms 1e6-draw core). But the DCT is linear and
D = (c0*A0 + c1*A1 + c2*J)/(pi*omega) with (c0,c1,c2) functions of
(u1,u2) only — so the per-segment Chebyshev coefficients of the three
BASIS integrals A0, A1, J depend only on k. This prototype measures how
accurately those 162 scalar functions of k can themselves be represented
as piecewise Chebyshev series in a mapped k variable, so the per-draw
stage collapses to one small matmul.

Usage: python bench_scripts/proto_cheb_tab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from triceratops_tpu.ops import occult as oc  # noqa: E402
from triceratops_tpu.ops import fastcore as fc  # noqa: E402

M = fc.M_CHEB

# probe (u1,u2) pairs -> (c0,c1,c2)/omega rows; invert to get basis
_PROBES = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]


def _weights(u1, u2):
    om = 1.0 - u1 / 3.0 - u2 / 6.0
    return np.array([1.0 - u1 - 2.0 * u2, u1 + 2.0 * u2, u2]) / om


_PROBE_MAT = np.stack([_weights(*p) for p in _PROBES])      # (3 probes, 3 basis)
_PROBE_INV = np.linalg.inv(_PROBE_MAT)                       # basis <- probes


def segment_geometry(k):
    k = np.asarray(k, float)
    zsplit = np.abs(1.0 - k)
    zmax = 1.0 + k
    c = np.clip(fc._BREAK_SLOPE * zsplit, fc._BREAK_FLOOR,
                (zmax - zsplit) / 2.0)
    zmid = zsplit + c
    wA = np.maximum(zsplit, 1e-6)
    wB1 = np.maximum(c, 1e-6)
    wB2 = np.maximum(zmax - zmid, 1e-6)
    return zsplit, zmid, wA, wB1, wB2


def basis_coeffs_exact(kvec):
    """(nk, 3 seg, M, 3 basis) Chebyshev coefficients of the k^2-normalized
    basis deficits on the three z segments."""
    kvec = np.asarray(kvec, float)
    zsplit, zmid, wA, wB1, wB2 = segment_geometry(kvec)
    s = fc._S_NODES[None, :]
    zs = [wA[:, None] * s,
          zsplit[:, None] + wB1[:, None] * s,
          zmid[:, None] + wB2[:, None] * s]
    out = np.empty((kvec.size, 3, M, 3))
    for gi, z in enumerate(zs):
        probes = []
        for (u1, u2) in _PROBES:
            D = np.asarray(oc.occult_quad_deficit(
                jnp.asarray(kvec)[:, None], jnp.asarray(z),
                jnp.float64(u1), jnp.float64(u2)))
            probes.append(D @ fc._DCT_T)                      # (nk, M)
        P = np.stack(probes, axis=-1)                         # (nk, M, 3probe)
        out[:, gi] = P @ _PROBE_INV.T                         # -> basis
    return out / (kvec[:, None, None, None] ** 2)


def combine(bas, u1, u2):
    """basis (…,3) -> deficit coeffs for given (u1,u2)."""
    w = _weights(u1, u2) / np.pi
    return bas @ w


# ---------------------------------------------------------------------------
# k-segment fitting
# ---------------------------------------------------------------------------

def cheb_fit_1d(fvals):
    """fvals sampled at Chebyshev-Gauss nodes (n, ...) -> coefficients."""
    n = fvals.shape[0]
    theta = (np.arange(n) + 0.5) * np.pi / n
    Dm = (2.0 / n) * np.cos(np.outer(np.arange(n), theta))
    Dm[0] *= 0.5
    return np.tensordot(Dm, fvals, axes=(1, 0))


def cheb_eval_1d(coef, x):
    """coef (deg, ...), x (m,) in [-1,1] -> (m, ...)."""
    deg = coef.shape[0]
    T = np.polynomial.chebyshev.chebvander(x, deg - 1)        # (m, deg)
    return np.tensordot(T, coef, axes=(1, 0))


class KSeg:
    def __init__(self, klo, khi, deg, kind="affine"):
        self.klo, self.khi, self.deg, self.kind = klo, khi, deg, kind

    def to_kappa(self, k):
        if self.kind == "affine":
            t = (k - self.klo) / (self.khi - self.klo)
        elif self.kind == "sqrt_hi":   # resolve k -> khi end (k=1 side)
            t = 1.0 - np.sqrt((self.khi - k) / (self.khi - self.klo))
        elif self.kind == "sqrt_lo":   # resolve k -> klo end
            t = np.sqrt((k - self.klo) / (self.khi - self.klo))
        elif self.kind == "log":
            t = (np.log(k) - np.log(self.klo)) / (np.log(self.khi)
                                                  - np.log(self.klo))
        return 2.0 * t - 1.0

    def from_kappa(self, x):
        t = (x + 1.0) / 2.0
        if self.kind == "affine":
            return self.klo + (self.khi - self.klo) * t
        if self.kind == "sqrt_hi":
            return self.khi - (self.khi - self.klo) * (1.0 - t) ** 2
        if self.kind == "sqrt_lo":
            return self.klo + (self.khi - self.klo) * t**2
        if self.kind == "log":
            return np.exp(np.log(self.klo)
                          + (np.log(self.khi) - np.log(self.klo)) * t)

    def fit(self):
        nodes = np.cos((np.arange(self.deg) + 0.5) * np.pi / self.deg)
        kn = self.from_kappa(nodes)
        self.C = cheb_fit_1d(basis_coeffs_exact(kn))          # (deg,3,M,3)
        return self

    def eval(self, k):
        x = np.clip(self.to_kappa(np.asarray(k, float)), -1.0, 1.0)
        return cheb_eval_1d(self.C, x)                        # (nk,3,M,3)


U_TEST = [(0.2049, 0.4886), (0.0, 0.0), (0.9, 0.0), (0.1, -0.0739),
          (0.35, 0.25), (0.8721, 0.5324)]


def seg_error(seg, n_k=160, n_z=400):
    """max |D_tab - D_exact_coeff_proxy| over k in seg x z x U_TEST."""
    # dense k strictly inside
    x = np.linspace(-1 + 1e-9, 1 - 1e-9, n_k)
    kd = seg.from_kappa(x)
    bas_fit = seg.eval(kd)                                    # (nk,3,M,3)
    bas_ref = basis_coeffs_exact(kd)
    worst = 0.0
    worst_at = None
    for (u1, u2) in U_TEST:
        cf = combine(bas_fit, u1, u2) * (kd[:, None, None] ** 2)
        cr = combine(bas_ref, u1, u2) * (kd[:, None, None] ** 2)
        zsplit, zmid, wA, wB1, wB2 = segment_geometry(kd)
        # evaluate both proxies on a dense z grid per k
        s = np.linspace(0.0, 1.0, n_z)[None, :]
        for gi, (lo, w) in enumerate(((0.0, wA), (zsplit, wB1), (zmid, wB2))):
            xg = np.sqrt(s) - np.sqrt(1.0 - s)
            Tg = np.polynomial.chebyshev.chebvander(xg[0], M - 1)  # (nz,M)
            Df = cf[:, gi] @ Tg.T                              # (nk, nz)
            Dr = cr[:, gi] @ Tg.T
            err = np.abs(Df - Dr)
            i = np.unravel_index(np.argmax(err), err.shape)
            if err[i] > worst:
                worst = err[i]
                worst_at = (kd[i[0]], gi, u1, u2)
    return worst, worst_at


def main():
    segs = [
        KSeg(1e-3, 0.05, 28, "log"),
        KSeg(0.05, 0.35, 28, "affine"),
        KSeg(0.35, 6.0 / 7.0, 28, "affine"),
        KSeg(6.0 / 7.0, 299.0 / 300.0, 28, "sqrt_hi"),
        KSeg(299.0 / 300.0, 1.0, 20, "sqrt_hi"),
        KSeg(1.0, 301.0 / 300.0, 20, "sqrt_lo"),
        KSeg(301.0 / 300.0, 7.0 / 6.0, 28, "sqrt_lo"),
        KSeg(7.0 / 6.0, 2.0, 28, "affine"),
    ]
    total_worst = 0.0
    for seg in segs:
        seg.fit()
        err, at = seg_error(seg)
        total_worst = max(total_worst, err)
        print(f"k in [{seg.klo:.6f}, {seg.khi:.6f}] deg={seg.deg:3d} "
              f"map={seg.kind:8s} max|dD| = {err:.3e}  at {at}")
    print(f"WORST over all segments: {total_worst:.3e}")


if __name__ == "__main__":
    main()
