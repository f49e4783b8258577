"""Probe: fuse the two stage branches (L1/L2) into grouped convs.

Each refinement stage runs two INDEPENDENT 5x(7x7, 128ch) towers over
the same 185-ch input. A conv with ``feature_group_count=2`` over the
concatenated 256-ch feature computes both towers in ONE XLA op with
identical math (block-diagonal == grouped). If XLA/Mosaic schedules the
grouped form faster (fewer kernel launches, better pipelining), an
inference-mode graph fusion is worth building; if not, this log is the
negative evidence.

Measures one full refinement-stage tower (the hot 80% of stage FLOPs)
both ways at the product batch sizes, on the real maps geometry (46x46
single-scale .. 92x92 for the 2x pyramid scale).

Run (chip): PYTHONPATH=. python experiments/grouped_branch_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

KEY = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def main():
    print("backend:", jax.default_backend(), flush=True)
    results = {}
    for hw in (46, 92):
        for batch in (8, 16):
            x = jax.random.normal(KEY, (batch, hw, hw, 185), jnp.bfloat16)

            # separate towers: 2 x [185->128, 4 x 128->128] 7x7
            ws_in = [jax.random.normal(KEY, (7, 7, 185, 128), jnp.bfloat16)
                     for _ in range(2)]
            ws_mid = [[jax.random.normal(KEY, (7, 7, 128, 128), jnp.bfloat16)
                       for _ in range(4)] for _ in range(2)]

            @jax.jit
            def separate(x, ws_in=ws_in, ws_mid=ws_mid):
                outs = []
                for b in range(2):
                    h = jax.nn.relu(conv(x, ws_in[b]).astype(jnp.bfloat16))
                    for w in ws_mid[b]:
                        h = jax.nn.relu(conv(h, w).astype(jnp.bfloat16))
                    outs.append(h)
                return jnp.concatenate(outs, -1)

            # grouped: 185->256 (dense, exact: both towers share input),
            # then 4 x grouped 256->256 (feature_group_count=2)
            w_in = jnp.concatenate(ws_in, -1)
            w_mid = [jnp.concatenate([ws_mid[0][i], ws_mid[1][i]], -1)
                     for i in range(4)]

            @jax.jit
            def grouped(x, w_in=w_in, w_mid=w_mid):
                h = jax.nn.relu(conv(x, w_in).astype(jnp.bfloat16))
                for w in w_mid:
                    h = jax.nn.relu(conv(h, w, groups=2).astype(jnp.bfloat16))
                return h

            a = timeit(separate, x)
            b = timeit(grouped, x)
            # numerics: identical math up to f32 accumulation order
            da = np.asarray(separate(x), np.float32)
            db = np.asarray(grouped(x), np.float32)
            err = float(np.max(np.abs(da - db)))
            results[f"hw{hw}_b{batch}"] = {
                "separate_ms": round(a, 2), "grouped_ms": round(b, 2),
                "speedup": round(a / b, 3), "max_abs_err": err,
            }
            print(f"hw={hw} batch={batch}: separate {a:.2f} ms, "
                  f"grouped {b:.2f} ms ({a/b:.2f}x), err {err:.2e}",
                  flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
