"""Roofline accounting for the Pallas v2 chi^2 core (VERDICT r2 item 2).

Times the three stages of the 1e6-draw planet core and compares the hot
kernel's achieved op rate against both v5e bounds (VPU issue rate and
HBM bandwidth):

  1. cheb_deficit_coeffs — 51 exact-kernel node evals + DCT per draw
     (runs in XLA, feeds the kernel per chunk),
  2. exposure_z2_poly — per-exposure quadratic z^2 model (XLA; Kepler
     solve dominates),
  3. chi2_supersampled — the Pallas (256 x 128)-tile kernel, timed
     DIRECTLY on pre-staged device inputs (a subtraction-based residual
     is not additive: standalone stages carry their own dispatch and
     lose producer fusion, and measured negative in an earlier attempt).

All readings subtract a measured tunnel round-trip baseline (the axon
device link costs ~27 ms per blocking scalar pull; CLAUDE.md).

Also measures the v2-vs-v3 schedule at the long-LC shape (n_t ~ 8k
in-window points of the unbinned TOI-1228 curve; VERDICT r2 item 9)
where v3's time-sublane skipping was hypothesized to win.

Usage:  python bench_scripts/roofline.py
"""

import os
import sys
import time as _time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from triceratops_tpu.scenarios import engine as eng
from triceratops_tpu.ops.lightcurve import (
    lnL_planet, draw_chunk, _gl_exposure_nodes)
from triceratops_tpu.ops.fastcore import (
    cheb_deficit_coeffs, exposure_z2_poly, M_CHEB)
from triceratops_tpu.ops.pallas_core import chi2_supersampled, DRAW_TILE

F32 = np.float32
N = 1_000_000
REPS = 5
TUNNEL = 0.0  # measured baseline, set in main()


def timeit(name, fn, reps=REPS):
    float(np.asarray(fn(0)))
    ts = []
    for r in range(1, reps + 1):
        t0 = _time.time()
        float(np.asarray(fn(r)))
        ts.append(_time.time() - t0)
    t = min(ts) - TUNNEL
    print(f"{name:48s} {t*1e3:9.1f} ms")
    return t


def main():
    global TUNNEL
    rng = np.random.default_rng(0)
    n_t, ns = 100, 20
    chunk = draw_chunk(n_t, ns)
    time_arr = np.linspace(-0.15, 0.15, n_t)
    flux = 1.0 + rng.normal(0, 5e-4, n_t)
    t_dev = jnp.asarray(time_arr, jnp.float32)
    obs_dev = jnp.asarray((flux - 1.0).astype(F32))
    sigma = F32(5e-4)
    d0 = eng.sample_planet_target(jax.random.key(1), F32(3.0), F32(3.0),
                                  F32(1.0), F32(1.0), N=N, flatpriors=False)
    u1a = jnp.full((N,), F32(0.4))
    u2a = jnp.full((N,), F32(0.2))
    ones = jnp.ones((N,), jnp.float32)
    kw = dict(exptime=0.00139, n_t=n_t, ns=ns, chunk=chunk)

    # stage 0: tunnel round-trip baseline (blocking scalar pull of a
    # trivial program); subtracted from every reading below
    triv = jax.jit(lambda r: jnp.float32(r) * 2.0)
    TUNNEL = timeit("stage 0: tunnel round-trip baseline", triv)
    TUNNEL += 0.0  # keep the printed baseline itself uncorrected

    t_total = timeit("planet core total (sample->lnL)", lambda r: jnp.sum(
        lnL_planet(
            t_dev, obs_dev, sigma, d0["k"] + F32(r) * F32(1e-9), d0["P"],
            d0["a_R"], d0["inc_rad"], d0["eccs"], d0["w_rad"], u1a, u2a,
            ones, d0["mask"], **kw).astype(jnp.float32).clip(-1e30, 1e30)))

    # stages 1/2 standalone, chunked exactly like the core. NOTE these
    # carry their own reduction/dispatch cost and lose any fusion with
    # the consumer, so they are UPPER bounds on in-pipeline stage cost;
    # the kernel is therefore timed directly, not by subtraction.
    n_fit = (N // chunk) * chunk

    @jax.jit
    def coeffs_chunked(k, u1, u2):
        ks = k[:n_fit].reshape(-1, chunk)

        def body(kc):
            cA, cB1, cB2, *_rest = cheb_deficit_coeffs(kc, u1[:chunk],
                                                       u2[:chunk])
            return jnp.sum(cA) + jnp.sum(cB1) + jnp.sum(cB2)
        return jnp.sum(jax.lax.map(body, ks))

    timeit("  stage 1: cheb_deficit_coeffs (standalone)",
           lambda r: coeffs_chunked(d0["k"] + F32(r) * F32(1e-9), u1a, u2a))

    @jax.jit
    def zpoly_chunked(P, a_R, inc, e, w):
        args = [a[:n_fit].reshape(-1, chunk)
                for a in (P, a_R, inc, e, w)]

        def body(xs):
            Pc, ac, ic, ec, wc = xs
            q0, q1, q2, front = exposure_z2_poly(t_dev, 0.00139 / 2, Pc,
                                                 ac, ic, ec, wc)
            return jnp.sum(q0) + jnp.sum(q1) + jnp.sum(q2) + jnp.sum(front)
        return jnp.sum(jax.lax.map(body, tuple(args)))

    timeit("  stage 2: exposure_z2_poly (standalone)",
           lambda r: zpoly_chunked(d0["P"] + F32(r) * F32(1e-9), d0["a_R"],
                                   d0["inc_rad"], d0["eccs"], d0["w_rad"]))

    # stage 3: the Pallas kernel DIRECT on pre-staged inputs. Pre-stage
    # kernel inputs for n_fit draws (983,040 at chunk 16,384: ~1.9 GB
    # f32 on the 16 GB chip), then map the kernel alone over chunks.
    offs, wgt = _gl_exposure_nodes(kw["exptime"], ns)
    offs_t = tuple(float(o) for o in offs)
    wgts_t = tuple(float(x) for x in wgt)

    @jax.jit
    def prep(k, P, a_R, inc, e, w, u1, u2):
        def body(xs):
            kc, Pc, ac, ic, ec, wc, u1c, u2c = xs
            cA, cB1, cB2, zsplit, zmid, invA, invB1, invB2 = \
                cheb_deficit_coeffs(kc, u1c, u2c)
            q0, q1, q2, front = exposure_z2_poly(
                t_dev, kw["exptime"] / 2, Pc, ac, ic, ec, wc)
            seg = jnp.stack([zsplit, zmid, invA, invB1, invB2], axis=1)
            return (q0, q1, q2, front.astype(q0.dtype), cA, cB1, cB2, seg)
        args = tuple(a[:n_fit].reshape(-1, chunk)
                     for a in (k, P, a_R, inc, e, w, u1, u2))
        return jax.lax.map(body, args)

    staged = jax.block_until_ready(prep(
        d0["k"], d0["P"], d0["a_R"], d0["inc_rad"], d0["eccs"], d0["w_rad"],
        u1a, u2a))

    @jax.jit
    def kernel_only(staged, g):
        gs = g[:n_fit].reshape(-1, chunk)

        def body(xs):
            q0, q1, q2, front, cA, cB1, cB2, seg, gc = xs
            return jnp.sum(chi2_supersampled(
                q0, q1, q2, front, cA, cB1, cB2, seg, gc[:, None],
                obs_dev[None, :], offs=offs_t, wgts=wgts_t))
        return jnp.sum(jax.lax.map(body, staged + (gs,)))

    t_kernel = timeit("  stage 3: Pallas chi2 kernel (direct)",
                      lambda r: kernel_only(staged,
                                            ones + F32(r) * F32(1e-9)))

    # ---- op-side accounting: per (draw, padded time point):
    #   4 GL nodes x (z^2 eval 4 + vis 2) = 24 ops outside the guard
    #   4 nodes x (sqrt 1 + masks 5 + sx 8 + clip 2 + x: 2 sqrt + 1 sub
    #              + Clenshaw (M-1) x (2 sel + 1 mul + 2 add) + tail 5
    #              + clip 2 + acc 2)  with M = M_CHEB
    per_node = 1 + 5 + 8 + 2 + 3 + (M_CHEB - 1) * 5 + 5 + 2 + 2
    ops_pt = 24 + 4 * per_node + 6
    T_pad = 128
    total_ops = n_fit * T_pad * ops_pt
    rate = total_ops / t_kernel
    print(f"kernel ops/point ~ {ops_pt}; total ~ {total_ops/1e9:.1f} Gop; "
          f"achieved ~ {rate/1e12:.2f} Top/s")
    print("v5e VPU bound ~ 3.9 Top/s f32 (8x128 lanes x 4 ALUs x 0.94 GHz)"
          f" -> {3.9e12/rate:.1f}x headroom IF every op were 1 cycle "
          "(sqrt is multi-cycle, selects pair with sublane broadcasts)")

    # ---- byte-side accounting: HBM traffic the kernel must stream
    bytes_in = (4 * n_fit * T_pad * 4          # q0,q1,q2,front tiles
                + 3 * n_fit * M_CHEB * 4       # cA,cB1,cB2
                + n_fit * 6 * 4                # seg + g
                + n_fit * 4)                   # delta out
    bw = bytes_in / t_kernel
    print(f"kernel HBM traffic ~ {bytes_in/1e9:.2f} GB -> {bw/1e9:.0f} GB/s "
          f"achieved; v5e HBM ~ 819 GB/s -> bandwidth floor "
          f"{bytes_in/819e9*1e3:.1f} ms (kernel is "
          f"{'COMPUTE' if rate/3.9e12 > bw/819e9 else 'BANDWIDTH'}-bound)")

    # ---------------- long-LC shape: v2 vs v3 (item 9) ----------------
    lc = None
    try:
        import pandas as pd
        lc = pd.read_csv(
            "/root/reference/examples/TOI1228_folded_lightcurve.csv")
    except Exception:
        print("TOI-1228 curve unavailable; skipping long-LC measurement")
    # two shapes: the 8,055-pt in-transit window and the full
    # 20,100-pt unbinned curve (VERDICT r2 item 9 asked for the
    # v2-vs-v3 check at n_t ~ 20k specifically); draw count scales
    # down to keep per-run wall manageable
    shapes = ((0.4, 262144, "8k-window"), (None, 65536, "20k-full"))
    for crop, N2, tag in (shapes if lc is not None else ()):
        t20 = lc.x_fold.values
        if crop is not None:
            t20 = t20[np.abs(t20) < crop]
        t20 = np.sort(t20).astype(np.float64)
        n_t2 = len(t20)
        obs2 = jnp.asarray(rng.normal(0, 5e-4, n_t2).astype(F32))
        t2_dev = jnp.asarray(t20, jnp.float32)
        chunk2 = draw_chunk(n_t2, ns)
        d2 = {k: v[:N2] for k, v in d0.items()}
        P2 = jnp.full((N2,), F32(29.04992))
        aR2 = d2["a_R"] * F32(9.17)  # ~29 d period scale
        kw2 = dict(exptime=0.00139, n_t=n_t2, ns=ns, chunk=chunk2)
        print(f"long-LC shape {tag}: n_t={n_t2}, chunk={chunk2}, N={N2}")

        kdraws = N2 // 1024
        for backend, label in (("xla", "XLA"), ("pallas", "pallas v2")):
            def run(r, b=backend):
                return jnp.sum(lnL_planet(
                    t2_dev, obs2, sigma, d2["k"] + F32(r) * F32(1e-9), P2,
                    aR2, d2["inc_rad"], d2["eccs"], d2["w_rad"],
                    u1a[:N2], u2a[:N2], ones[:N2], d2["mask"], **kw2,
                    backend=b).astype(jnp.float32).clip(-1e30, 1e30))
            timeit(f"long-LC {tag} planet core {label} ({kdraws}k draws)",
                   run, reps=3)
        # v3 needs the env var at import; measure via direct module flip
        from triceratops_tpu.ops import lightcurve as lcmod
        old = lcmod.PALLAS_V
        lcmod.PALLAS_V = "3"
        # a minutely different STATIC exptime forces a fresh trace so
        # the schedule switch is honored (PALLAS_V is read at trace
        # time; an identical cache key would silently reuse v2)
        kw3 = dict(kw2, exptime=0.00139 * (1 + 1e-9))
        try:
            def run3(r):
                return jnp.sum(lnL_planet(
                    t2_dev, obs2, sigma,
                    d2["k"] + F32(r) * F32(1e-9), P2,
                    aR2, d2["inc_rad"], d2["eccs"], d2["w_rad"],
                    u1a[:N2], u2a[:N2], ones[:N2], d2["mask"], **kw3,
                    backend="pallas", interpret=False
                    ).astype(jnp.float32).clip(-1e30, 1e30))
            timeit(f"long-LC {tag} planet core pallas v3 ({kdraws}k draws)",
                   run3, reps=3)
        finally:
            lcmod.PALLAS_V = old


if __name__ == "__main__":
    main()
