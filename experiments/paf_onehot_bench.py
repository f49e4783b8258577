"""TPU bench: PAF midpoint sampling — gather vs one-hot MXU matmul.

Times the batched pair-scoring stage (vmapped over batch 8, as the
product decode runs it) at both two-tier capacities, for each sampler,
plus the greedy stage for context. Run on the chip:

    python experiments/paf_onehot_bench.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpupose.decode import paf as P

B, H, W = 8, 46, 46


def bench(fn, *args, iters=20):
    # device_get of a reduced scalar is the only reliable sync on the
    # axon tunnel (block_until_ready returns early) — same harness as
    # experiments/decode_profile.py.
    def reduced(*a):
        return jnp.sum(jax.tree.leaves(fn(*a))[0].astype(jnp.float32))

    red = jax.jit(reduced)
    _ = float(jax.device_get(red(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    _ = float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    paf = jnp.asarray(rng.normal(size=(B, H, W, 38)).astype(np.float32))
    results = {}
    for K in (32, 96):
        peaks = {
            "xs": jnp.asarray(rng.integers(0, W, size=(B, 19, K)).astype(np.int32)),
            "ys": jnp.asarray(rng.integers(0, H, size=(B, 19, K)).astype(np.int32)),
            "scores": jnp.asarray(rng.random(size=(B, 19, K)).astype(np.float32)),
            "valid": jnp.asarray(rng.random(size=(B, 19, K)) > 0.3),
        }
        for sampler in ("gather", "onehot"):
            os.environ["TPUPOSE_PAF_SAMPLER"] = sampler

            @jax.jit
            def scores_b(paf, peaks):
                return jax.vmap(lambda p, pk: P.pair_scores(p, pk))(paf, peaks)

            ms = bench(scores_b, paf, peaks)
            results[f"pair_scores K={K} {sampler}"] = ms
            print(f"pair_scores K={K:3d} {sampler:7s}: {ms:7.2f} ms/batch-{B}")

        prior, ok, na, nb = scores_b(paf, peaks)

        @jax.jit
        def greedy_b(prior, ok, na, nb):
            return jax.vmap(
                lambda p, o, a, b: P.greedy_all(p, o, a, b, K, min(128, K * K))
            )(prior, ok, na, nb)

        ms = bench(greedy_b, prior, ok, na, nb)
        print(f"greedy cap128 K={K:3d}        : {ms:7.2f} ms/batch-{B}")


if __name__ == "__main__":
    main()
