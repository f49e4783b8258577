"""top_k cost scaling on TPU: does a two-tier top_k pay?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def timeit(label, fn, *args, iters=20):
    def reduced(*a):
        out = fn(*a)
        return jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
    _ = float(jax.device_get(reduced(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = reduced(*args)
    _ = float(jax.device_get(out))
    print(f"{label:28s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
# realistic masked score maps: mostly -inf, ~200 finite per channel
scores = np.full((8, 18, 135424), -np.inf, np.float32)
for b in range(8):
    for c in range(18):
        idx = rng.choice(135424, 200, replace=False)
        scores[b, c, idx] = rng.uniform(0.1, 1.0, 200)
s = jnp.asarray(scores)

for k in (96, 32, 8):
    timeit(f"top_k(k={k})", jax.jit(lambda x, k=k: jax.lax.top_k(x, k)), s)

# scatter-compaction: first-96 finite entries per channel, scan order
def compact(x):
    isf = jnp.isfinite(x)                                  # (8,18,N)
    ordn = jnp.cumsum(isf, axis=-1) - 1
    slot = jnp.where(isf, jnp.minimum(ordn, 96 - 1), 96)   # drop slot
    out = jnp.full((8, 18, 97), -jnp.inf)
    out = jnp.take_along_axis(
        out, jnp.zeros((8, 18, 1), jnp.int32), axis=-1)    # noop, keep jit happy
    res = jnp.full((8, 18, 97), -jnp.inf)
    res = res.at[
        jnp.arange(8)[:, None, None],
        jnp.arange(18)[None, :, None],
        slot,
    ].max(x)
    return res[..., :96]

timeit("scatter-compact (96)", jax.jit(compact), s)

# sort-based full argsort for reference
timeit("argsort full", jax.jit(lambda x: jnp.argsort(x, axis=-1)), s)
