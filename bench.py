"""Benchmark: conditional-independence test throughput per chip.

Measures the framework's hottest path -- the fused mi_nz all-pairs univariate
pipeline (one-hot contingency tables via bf16 Pallas matmuls on the MXU +
vectorized signed G-test statistics + chi2 p-values, fully on device) on
synthetic data sized like a production OTU table slice.

Timing methodology: the kernel is iterated inside a jitted lax.fori_loop with
a data dependency between iterations and a single scalar pulled to host, so
the measurement is robust against async dispatch (the axon tunnel's
block_until_ready is unreliable).

The reference (FlashWeave.jl) publishes no quantitative numbers
(BASELINE.md); `vs_baseline` is reported against the documented working
assumption of 1e6 univariate CI tests/sec for the reference's optimized
single-core sparse kernels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

ASSUMED_REFERENCE_TESTS_PER_SEC = 1.0e6


def device_loop_time(fn, x, iters=10):
    """Mean per-iteration wall time of fn(x) with iteration-chained
    dependencies executed in one jitted loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = leaf.ravel()[0].astype(jnp.float32)
            return (x + (0.0 * s).astype(x.dtype), acc + s)

        _, acc = lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    float(loop(x))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fw_tpu_jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from flashweave_tpu.ops import statfuns as sf
    from flashweave_tpu.ops.contingency import pair_ctab_block
    from flashweave_tpu.ops.univariate import (
        mi_block_stats, mi_planes_stats, _y_slabs,
    )
    from flashweave_tpu.ops import pallas_kernels as pk

    n, p, L = 8192, 2048, 3
    tile = 512
    rng = np.random.default_rng(0)
    # zero-inflated 3-level data like a binned OTU table
    data = rng.integers(0, L, (n, p)).astype(np.float32)
    data[rng.random((n, p)) < 0.4] = 0.0
    levels = jnp.full(p, 3, jnp.int32)
    maxv = jnp.full(p, 2, jnp.int32)
    on_tpu = jax.default_backend() == "tpu"
    slab = _y_slabs(p, tile, triangle=True)

    d = jax.device_put(
        jnp.asarray(data).astype(jnp.int8 if on_tpu else jnp.float32)
    )
    # the driver materializes these once per sweep (cheap eager ops)
    dT = jax.device_put(jnp.asarray(data.T).astype(jnp.int8))
    marg = pk.level_marginals(d, L) if on_tpu else None

    def univar_pipeline(d):
        # the driver's triangle sweep (each X<Y pair computed exactly once),
        # all blocks inside one jitted program
        outs = []
        for s in range(0, p, tile):
            y_start, y_len = slab(s)
            lvl_y, mv_y = levels[y_start:y_start + y_len], maxv[y_start:y_start + y_len]
            if on_tpu:
                stat, df, n_obs, suff = pk.mi_univar_stats_pallas(
                    dT, d, marg, levels, maxv, s, tile, L, y_start, y_len,
                    True, 5.0, 20.0,
                )
                # closed-form small-df chi2 tail: df <= (L-1)^2 univariate
                pval = sf.mi_pval_smalldf(stat, df, n_obs, (L - 1) ** 2, xp=jnp)
            else:
                ctab = pair_ctab_block(d, s, tile, L, y_start, y_len)
                stat, df, n_obs, suff = mi_block_stats(
                    ctab, levels[s:s + tile], lvl_y, maxv[s:s + tile],
                    mv_y, 5.0, 20.0, True, L,
                )
                pval = sf.mi_pval(stat, df, n_obs, xp=jnp)
            outs.append(stat.sum() + pval.sum() + suff.sum())
        return jnp.stack(outs)

    dt = device_loop_time(univar_pipeline, d, iters=10)

    n_tests = p * (p - 1) // 2  # unique X<Y pairs per sweep
    tests_per_sec = n_tests / dt

    result = {
        "metric": "univariate CI tests/sec/chip (mi_nz G-test, n=8192 samples)",
        "value": round(tests_per_sec, 1),
        "unit": "tests/s",
        "vs_baseline": round(tests_per_sec / ASSUMED_REFERENCE_TESTS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
