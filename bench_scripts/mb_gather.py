"""Micro-benchmark: packed vs per-field background-table gathers (TPU)."""
import time as T
import numpy as np, jax, jax.numpy as jnp

N, NBG, F = 1_000_000, 3000, 9
rng = np.random.default_rng(0)
tables = [jnp.asarray(rng.normal(size=NBG).astype(np.float32)) for _ in range(F)]
pack_rows = jnp.stack(tables, axis=1)    # (NBG, F)
pack_cols = jnp.stack(tables, axis=0)    # (F, NBG)

def timeit(name, fn):
    ks = [jax.random.fold_in(jax.random.key(3), i) for i in range(6)]
    jfn = jax.jit(fn)
    float(np.asarray(jfn(ks[0])))
    ts = []
    for k in ks[1:]:
        t0 = T.time(); float(np.asarray(jfn(k))); ts.append(T.time()-t0)
    print(f"{name:22s} {min(ts)*1e3:7.1f} ms")

def idxs_of(k):
    return jax.random.randint(k, (N,), 0, NBG)

timeit("baseline (idx only)", lambda k: jnp.sum(idxs_of(k).astype(jnp.float32)))
def per_field(k):
    idx = idxs_of(k)
    return sum(jnp.sum(t[idx]) for t in tables)
timeit("9 per-field gathers", per_field)
def row_pack(k):
    idx = idxs_of(k)
    rows = pack_rows[idx]
    return jnp.sum(rows)
timeit("row gather (N,9)", row_pack)
def col_pack(k):
    idx = idxs_of(k)
    cols = pack_cols[:, idx]
    return jnp.sum(cols)
timeit("col gather (9,N)", col_pack)
def two_fields(k):
    idx = idxs_of(k)
    return jnp.sum(tables[0][idx]) + jnp.sum(tables[1][idx])
timeit("2 per-field gathers", two_fields)
