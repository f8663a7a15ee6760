"""Micro-benchmark: per-sampler building blocks (TPU)."""
import time as T
import numpy as np, jax, jax.numpy as jnp
from triceratops_tpu.priors.samplers import sample_rp, sample_ecc, sample_w, sample_q, sample_q_companion, sample_inc
from triceratops_tpu.priors.companion import lnprior_bound_TP
from triceratops_tpu.populations.stellar import stellar_relations, flux_relation

N = 1_000_000
F32 = jnp.float32
M_s = jnp.full((N,), 1.0, F32)

def timeit(name, make_fn):
    fn = jax.jit(make_fn)
    ks = [jax.random.fold_in(jax.random.key(7), i) for i in range(6)]
    float(np.asarray(fn(ks[0])))
    ts = []
    for k in ks[1:]:
        t0 = T.time(); float(np.asarray(fn(k))); ts.append(T.time()-t0)
    print(f"{name:24s} {min(ts)*1e3:7.1f} ms")

timeit("uniform only", lambda k: jnp.sum(jax.random.uniform(k, (N,), dtype=F32)))
timeit("sample_rp", lambda k: jnp.sum(sample_rp(jax.random.uniform(k, (N,), dtype=F32), M_s, False)))
timeit("sample_ecc planet", lambda k: jnp.sum(sample_ecc(jax.random.uniform(k, (N,), dtype=F32), True, 3.0)))
timeit("sample_ecc binary", lambda k: jnp.sum(sample_ecc(jax.random.uniform(k, (N,), dtype=F32), False, 3.0)))
timeit("sample_q", lambda k: jnp.sum(sample_q(jax.random.uniform(k, (N,), dtype=F32), 1.0)))
timeit("sample_q_comp", lambda k: jnp.sum(sample_q_companion(jax.random.uniform(k, (N,), dtype=F32), 1.0)))
timeit("sample_inc", lambda k: jnp.sum(sample_inc(jax.random.uniform(k, (N,), dtype=F32))))
timeit("stellar_relations", lambda k: jnp.sum(stellar_relations(jax.random.uniform(k, (N,), dtype=F32), jnp.ones((N,),F32), jnp.full((N,),5800.0,F32), xp=jnp)[0]))
timeit("flux_relation", lambda k: jnp.sum(flux_relation(jax.random.uniform(k, (N,), dtype=F32)+0.2, "TESS", xp=jnp)))
timeit("lnprior_bound_TP", lambda k: jnp.sum(lnprior_bound_TP(1.0, 10.0, jax.random.uniform(k, (N,), dtype=F32)*8, jnp.asarray(np.array([2.2],np.float32)), jnp.asarray(np.array([1.0],np.float32)))))
