"""Benchmark: CI-test throughput per chip + end-to-end edges/sec.

Covers both BASELINE.json metrics:

1. (headline) univariate conditional-independence test throughput of the
   fused mi_nz Pallas pipeline (one-hot int8 contingency matmuls on the MXU
   + in-VMEM signed G-test epilogue + closed-form chi2 tails) at
   representative scale (n=8192 samples, p=8192 variables -- at small p the
   measurement is dominated by fixed dispatch overhead, see PERF.md).
2. edges/sec of the full LGL inference (univariate pass + HITON conditional
   search through the round scheduler at max_k=3) on a synthetic 10k-OTU
   table, plus the conditional-stage CI-test throughput.

Timing: the univariate kernels are iterated inside a jitted lax.fori_loop
with iteration-chained data dependencies (robust against async dispatch; the
axon tunnel's block_until_ready is unreliable).  The LGL run is wall-clock:
it is an end-to-end host+device measurement by design.

The reference (FlashWeave.jl) publishes no quantitative numbers
(BASELINE.md); `vs_baseline` is reported against the documented working
assumption of 1e6 univariate CI tests/sec for the reference's optimized
single-core sparse kernels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
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
            # consume EVERY output element in the chained scalar -- reducing
            # only out[0] lets XLA dead-code-eliminate all other blocks and
            # silently benchmarks a fraction of the sweep
            s = sum(
                leaf.sum().astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out)
            )
            return (x + (0.0 * s).astype(x.dtype), acc + s)

        _, acc = lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    float(loop(x))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / iters


def univar_bench(n=8192, p=8192, L=3):
    """Fused mi_nz univariate sweep throughput (tests/s)."""
    import jax
    import jax.numpy as jnp

    from flashweave_tpu.ops import statfuns as sf
    from flashweave_tpu.ops.contingency import pair_ctab_block
    from flashweave_tpu.ops.univariate import mi_block_stats, _y_slabs
    from flashweave_tpu.ops import pallas_kernels as pk

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
    dT = jax.device_put(jnp.asarray(data.T).astype(jnp.int8))
    marg = pk.level_marginals(d, L) if on_tpu else None

    def mi_pipeline(d):
        outs = []
        for s in range(0, p, tile):
            y_start, y_len = slab(s)
            if on_tpu:
                stat, df, n_obs, suff = pk.mi_univar_stats_pallas(
                    dT, d, marg, levels, maxv, s, tile, L, y_start, y_len,
                    True, 5.0, 20.0,
                )
                pval = sf.mi_pval_smalldf(stat, df, n_obs, (L - 1) ** 2, xp=jnp)
            else:
                ctab = pair_ctab_block(d, s, tile, L, y_start, y_len)
                stat, df, n_obs, suff = mi_block_stats(
                    ctab, levels[s:s + tile], levels[y_start:y_start + y_len],
                    maxv[s:s + tile], maxv[y_start:y_start + y_len],
                    5.0, 20.0, True, L,
                )
                pval = sf.mi_pval(stat, df, n_obs, xp=jnp)
            outs.append(stat.sum() + pval.sum() + suff.sum())
        return jnp.stack(outs)

    dt = device_loop_time(mi_pipeline, d, iters=10)
    n_tests = p * (p - 1) // 2
    mi_tps = n_tests / dt

    # fz_nz: fused masked-moment kernel sweep (ops/pallas_kernels.py:41-123)
    cont = np.where(data > 0, np.log1p(data), 0.0).astype(np.float32)
    dc = jax.device_put(jnp.asarray(cont))

    def fz_pipeline(dc):
        from flashweave_tpu.ops.univariate import fz_nz_block

        outs = []
        for s in range(0, p, tile):
            y_start, y_len = slab(s)
            if on_tpu:
                r, N = pk.fz_nz_block_pallas(dc, s, tile, y_start, y_len)
            else:
                r, N = fz_nz_block(dc, s, tile, y_start, y_len)
            lp = sf.fz_logpval(r, N, 0, xp=jnp)
            outs.append(r.sum() + lp.sum())
        return jnp.stack(outs)

    dt_fz = device_loop_time(fz_pipeline, dc, iters=10)
    fz_tps = n_tests / dt_fz
    return mi_tps, fz_tps


def lgl_bench(n=2048, p=10000, group=5, max_k=3):
    """End-to-end LGL on a synthetic 10k-OTU table: edges/sec + conditional
    CI tests/sec (BASELINE.json metric #2)."""
    from flashweave_tpu.learning.lgl import LGL
    from flashweave_tpu.utils.timing import StageTimer

    rng = np.random.default_rng(1)
    n_groups = p // group
    # block-correlated groups: members are noisy copies of a group pattern
    base = rng.integers(0, 3, (n, n_groups)).astype(np.int8)
    data = np.repeat(base, group, axis=1)
    flip = rng.random((n, p)) < 0.35
    data = np.where(flip, rng.integers(0, 3, (n, p), dtype=np.int8), data)
    data = data.astype(np.float32)

    timer = StageTimer()
    t0 = time.perf_counter()
    res = LGL(data, test_name="mi_nz", max_k=max_k, parallel="multi_il",
              time_limit=0.0, convergence_threshold=0.0, verbose=False,
              n_obs_min=20, stage_timer=timer)
    total = time.perf_counter() - t0
    n_edges = res.graph.n_edges()
    cond_s = timer.stages.get("conditional", float("nan"))
    univar_s = timer.stages.get("univariate", float("nan"))
    from flashweave_tpu.ops import condtests as ct

    n_cond_tests = ct.N_TESTS_DISPATCHED
    return dict(
        edges_per_sec_10k_otus=round(n_edges / total, 1),
        n_edges_10k=n_edges,
        lgl_total_sec=round(total, 2),
        univar_stage_sec=round(univar_s, 2),
        cond_stage_sec=round(cond_s, 2),
        cond_tests_per_sec=(
            round(n_cond_tests / cond_s, 1) if cond_s > 0 else None
        ),
        n_cond_tests=int(n_cond_tests),
    )


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fw_tpu_jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    on_tpu = jax.default_backend() == "tpu"

    # off-TPU (driver sanity runs): shrink so the XLA-CPU path stays fast
    if on_tpu:
        mi_tps, fz_tps = univar_bench(8192, 8192)
        extra = lgl_bench(2048, 10000)
    else:
        mi_tps, fz_tps = univar_bench(1024, 512)
        extra = lgl_bench(256, 500)
    extra["fz_nz_univar_tests_per_sec"] = round(fz_tps, 1)

    result = {
        "metric": "univariate CI tests/sec/chip (mi_nz G-test, n=8192, p=8192)"
                  if on_tpu else
                  "univariate CI tests/sec/chip (mi_nz, CPU sanity shape)",
        "value": round(mi_tps, 1),
        "unit": "tests/s",
        "vs_baseline": round(mi_tps / ASSUMED_REFERENCE_TESTS_PER_SEC, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
