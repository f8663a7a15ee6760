"""Micro-benchmark: pallas-vs-XLA planet core + parity (TPU)."""
import time as T
import numpy as np, jax, jax.numpy as jnp
from triceratops_tpu.ops.lightcurve import lnL_planet

N, n_t, ns = 1_000_000, 100, 20
rng = np.random.default_rng(0)
t = jnp.asarray(np.linspace(-0.15, 0.15, n_t), jnp.float32)
obs = jnp.asarray(rng.normal(0, 5e-4, n_t), jnp.float32)
f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
k = f32(10 ** rng.uniform(-2, -0.7, N)); P = f32(np.full(N, 3.0))
aR = f32(np.full(N, 9.6)); inc = f32(np.arccos(rng.uniform(0, 1, N)*1.05/9.6))
e = f32(rng.uniform(0, 0.4, N)); w = f32(rng.uniform(-np.pi, np.pi, N))
u1 = f32(np.full(N, 0.4)); u2 = f32(np.full(N, 0.2))
g = f32(np.ones(N)); m = jnp.asarray(np.ones(N, bool))

def core(backend, r):
    k2 = k + np.float32(r)*np.float32(1e-9)
    return jnp.sum(lnL_planet(t, obs, np.float32(5e-4), k2, P, aR, inc, e,
                              w, u1, u2, g, m, exptime=0.00139, n_t=n_t,
                              ns=ns, chunk=16384,
                              backend=backend).clip(-1e30, 1e30))

for backend in ("xla", "pallas"):
    try:
        v0 = float(np.asarray(core(backend, 0)))
        ts = []
        for r in range(1, 6):
            t0 = T.time(); float(np.asarray(core(backend, r))); ts.append(T.time()-t0)
        print(f"{backend}: {min(ts)*1e3:.1f} ms (median {np.median(ts)*1e3:.1f}), sum={v0:.6g}")
    except Exception as ex:
        print(f"{backend}: FAILED {type(ex).__name__}: {ex}")

# parity check
a = np.asarray(lnL_planet(t, obs, np.float32(5e-4), k, P, aR, inc, e, w,
                          u1, u2, g, m, exptime=0.00139, n_t=n_t, ns=ns,
                          chunk=16384, backend="xla"))
b = np.asarray(lnL_planet(t, obs, np.float32(5e-4), k, P, aR, inc, e, w,
                          u1, u2, g, m, exptime=0.00139, n_t=n_t, ns=ns,
                          chunk=16384, backend="pallas"))
fin = np.isfinite(a) & np.isfinite(b)
d = np.abs(a[fin]-b[fin]); rel = d/(np.abs(a[fin])+10)
print(f"parity: p99 rel={np.quantile(rel,0.99):.2e} max rel={rel.max():.2e} finite-agree={np.mean(np.isfinite(a)==np.isfinite(b)):.6f}")
