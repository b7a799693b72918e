"""Batched all-pairs univariate association tests.

TPU-native replacement for the reference's pairwise pass (reference:
src/tests.jl:370-532 ``pw_univar_neighbors`` + per-pair kernels).  Instead of
n*(n-1)/2 scalar tests distributed over worker processes, the whole pass is a
handful of (vars x samples) @ (samples x vars) matmuls:

- fz        : one standardized Gram matrix (the correlation matrix)
- fz_nz     : four masked-moment matmuls (n, sum x, sum x^2, sum xy over rows
              where BOTH variables are nonzero) -- replaces the sparse
              merge-join streaming correlation (reference src/statfuns.jl:91-123)
- mi / mi_nz: L^2 one-hot matmuls producing all-pairs contingency tables
              (replaces reference src/contingency.jl:80-123)

Work is processed in X-variable blocks so device memory stays bounded and the
block axis / output columns can be sharded over a device mesh.  p-values are
computed on host in float64 (the reference keeps all stats in Float64;
float32 p-values would collapse the BH-FDR ranking of highly significant
pairs) from tiny per-pair aggregates pulled off-device.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from . import statfuns as sf
from .contingency import pair_ctab_block
from ..utils.misc import is_zero_adjusted, isdiscrete


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

@jax.jit
def cor_matrix(data):
    """Full correlation matrix as one Gram matmul (reference equivalent:
    Statistics.cor used at src/learning.jl:44)."""
    n = data.shape[0]
    mu = data.mean(axis=0, keepdims=True)
    xc = data - mu
    cov = xc.T @ xc
    d = jnp.sqrt(jnp.diag(cov))
    denom = d[:, None] * d[None, :]
    return jnp.where(denom > 0, cov / jnp.where(denom > 0, denom, 1.0), jnp.nan)


@partial(jax.jit, static_argnames=("tile", "y_len"))
def fz_nz_block(data, start, tile, y_start=0, y_len=None):
    """Masked pairwise correlation of an X-block against a Y-slab (default:
    all variables) over rows where both are nonzero (reference:
    src/statfuns.jl:91-123 with nz=true).  Returns (stat, n_obs) of shape
    (tile, y_len)."""
    n = data.shape[0]
    if y_len is None:
        y_len = data.shape[1]
    yslab = lax.dynamic_slice(data, (0, y_start), (n, y_len))
    nzmask = (yslab != 0).astype(data.dtype)
    xslab = lax.dynamic_slice(data, (0, start), (n, tile))
    mb = (xslab != 0).astype(data.dtype)
    db = xslab * mb
    dm = yslab * nzmask
    N = mb.T @ nzmask                                 # joint nonzero counts
    Sx = db.T @ nzmask                                # sum x over joint rows
    Sy = mb.T @ dm
    Sxx = (db * db).T @ nzmask
    Syy = mb.T @ (dm * dm)
    Sxy = db.T @ dm
    safe_n = jnp.where(N > 0, N, 1.0)
    cov = Sxy - Sx * Sy / safe_n
    varx = Sxx - Sx * Sx / safe_n
    vary = Syy - Sy * Sy / safe_n
    denom = jnp.sqrt(varx * vary)
    r = cov / denom                                   # 0/0 -> NaN, x/0 -> inf
    # sparse-path clamp semantics (reference src/statfuns.jl:116-120):
    # inf -> 1, -inf -> -1, NaN propagates
    r = jnp.where(r > 1.0, 1.0, r)
    r = jnp.where(r < -1.0, -1.0, r)
    r = jnp.where(N > 0, r, 0.0)                      # n_obs == 0 -> stat 0
    return r, N


def _mi_block_stats_impl(ctab, levels_x, levels_y, maxv_x, maxv_y, hps,
                         n_obs_min, nz, L):
    t, p = ctab.shape[:2]
    lx = levels_x[:, None].astype(ctab.dtype)
    ly = levels_y[None, :].astype(ctab.dtype)
    if nz:
        ox = (maxv_x > 1).astype(jnp.int32)[:, None] * jnp.ones((1, p), jnp.int32)
        oy = (maxv_y > 1).astype(jnp.int32)[None, :] * jnp.ones((t, 1), jnp.int32)
        a = jnp.arange(L)
        keep = (a[:, None] >= ox[..., None, None]) & (a[None, :] >= oy[..., None, None])
        sub = ctab * keep.astype(ctab.dtype)
        lx_eff = (L - ox).astype(ctab.dtype)          # size of sliced table
        ly_eff = (L - oy).astype(ctab.dtype)
        # rows of the X-trimmed view (pre-check n_obs): all rows with x >= ox
        rowkeep = (a[:, None] >= ox[..., None, None]) & jnp.ones(
            (1, L), bool
        )
        n_view = (ctab * rowkeep.astype(ctab.dtype)).sum(axis=(-2, -1))
    else:
        ox = jnp.zeros((t, p), jnp.int32)
        oy = jnp.zeros((t, p), jnp.int32)
        sub = ctab
        lx_eff = lx * jnp.ones((t, p), ctab.dtype)
        ly_eff = ly * jnp.ones((t, p), ctab.dtype)
        n_view = ctab.sum(axis=(-2, -1))

    stat, df, n_obs = sf.mi_stats(sub[..., None], ox, oy, xp=jnp)

    # pre-check (reference src/tests.jl:9-20): offsets from LEVELS (>1 -> 2),
    # zero denominators pass (Julia n/0 == Inf)
    plx = lx - jnp.where(lx > 1, 2.0, 1.0)
    ply = ly - jnp.where(ly > 1, 2.0, 1.0)
    cells_pre = plx * ply
    pre_ok = (n_view >= n_obs_min) & jnp.where(
        cells_pre > 0, n_view / jnp.where(cells_pre > 0, cells_pre, 1.0) > hps, True
    )
    # post-check (reference src/tests.jl:56-62)
    cells_post = lx_eff * ly_eff
    post_ok = (n_obs >= n_obs_min) & jnp.where(
        cells_post > 0, n_obs / jnp.where(cells_post > 0, cells_post, 1.0) > hps, True
    )
    # X variables with < 2 levels never test (reference src/tests.jl:86-92)
    row_ok = lx >= 2
    suff = pre_ok & post_ok & row_ok
    stat = jnp.where(suff, stat, 0.0)
    df = jnp.where(suff, df, 0)
    return stat, df, n_obs, suff


@partial(jax.jit, static_argnames=("nz", "L"))
def mi_block_stats(ctab, levels_x, levels_y, maxv_x, maxv_y, hps, n_obs_min,
                   nz, L):
    """Univariate MI G-test statistics from a block of pair tables.

    Implements the reference's dense univariate test logic (reference:
    src/tests.jl:28-77): nz slicing, power pre/post checks, signed MI, df
    adjustment.  Shapes: ctab (t, p, L, L); levels_x/maxv_x (t,);
    levels_y/maxv_y (p,).  Returns (stat, df, n_obs, suff_power).
    """
    return _mi_block_stats_impl(ctab, levels_x, levels_y, maxv_x, maxv_y,
                                hps, n_obs_min, nz, L)


@partial(jax.jit, static_argnames=("nz", "L"))
def mi_planes_stats(planes, levels_x, levels_y, maxv_x, maxv_y, hps,
                    n_obs_min, nz, L):
    """mi_block_stats on (L*L, t, q) int32 contingency planes (the Pallas
    kernel's native layout): the transpose + float cast fuse into the stats
    elementwise pass instead of materializing a (t, q, L, L) copy in HBM."""
    t, q = planes.shape[1:]
    ctab = jnp.transpose(
        planes.reshape(L, L, t, q), (2, 3, 0, 1)
    ).astype(jnp.float32)
    return _mi_block_stats_impl(ctab, levels_x, levels_y, maxv_x, maxv_y,
                                hps, n_obs_min, nz, L)


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

# test hook: exercise the TPU fast path (Pallas kernels in interpret mode +
# device-side FDR extraction) on the CPU mesh
FORCE_PALLAS = False


def _choose_tile(p: int, requested: Optional[int]) -> int:
    if requested is not None:
        return min(requested, p)
    return min(p, 512)


def condensed_index(p: int):
    """Upper-triangle (X < Y) index pairs, row-major like the reference's
    condensed layout (reference: src/tests.jl:377-388)."""
    iu = np.triu_indices(p, k=1)
    return iu


def condensed_pos(X, Y, p):
    """Row-major condensed position of pair (X < Y) in the n_pairs vector."""
    X = np.asarray(X, dtype=np.int64)
    Y = np.asarray(Y, dtype=np.int64)
    return X * (2 * p - X - 1) // 2 + (Y - X - 1)


def condensed_to_pair(idx, p):
    """Inverse of condensed_pos (vectorized), avoiding O(p^2) index tables."""
    idx = np.asarray(idx, dtype=np.int64)
    # solve X(2p - X - 1)/2 <= idx: X = floor((2p-1 - sqrt((2p-1)^2-8idx))/2)
    disc = (2 * p - 1) ** 2 - 8 * idx.astype(np.float64)
    X = ((2 * p - 1 - np.sqrt(disc)) / 2).astype(np.int64)
    # fp-correct the boundary
    for _ in range(2):
        base = X * (2 * p - X - 1) // 2
        X = np.where(base > idx, X - 1, X)
        base = X * (2 * p - X - 1) // 2
        too_low = idx - base >= (p - 1 - X)
        X = np.where(too_low, X + 1, X)
    base = X * (2 * p - X - 1) // 2
    Y = idx - base + X + 1
    return X, Y


def _condense_block(s, t, p, blocks, outs, y_start=0):
    """Scatter a (tile, y_len) block slab's X<Y entries (Y < p) into the
    condensed output vectors.  Column q of the slab is variable y_start+q."""
    y_len = blocks[0].shape[1]
    ys = np.arange(y_start, min(y_start + y_len, p))
    rows, cols = np.nonzero(np.arange(s, s + t)[:, None] < ys[None, :])
    pos = condensed_pos(rows + s, ys[cols], p)
    for blk, out in zip(blocks, outs):
        out[pos] = blk[rows, cols]


def _y_slabs(p_int: int, tile_sz: int, triangle: bool):
    """Per-X-block Y-slab choices [y_start, p_int) for the pair sweep.

    With triangle=True each slab covers only Y >= x_start (every X<Y pair is
    still produced exactly once), bucketed to at most ~8 distinct slab
    lengths so the number of compiled kernel shapes stays bounded.  Cuts
    device work ~1.8x versus the full rectangle.
    """
    if not triangle:
        return lambda s: (0, p_int)
    step = max(tile_sz, -(-p_int // (8 * tile_sz)) * tile_sz)

    def slab(s):
        y_len = min(p_int, -(-(p_int - s) // step) * step)
        return p_int - y_len, y_len

    return slab


# ---------------------------------------------------------------------------
# device-side FDR + significant-pair extraction (TPU fast path)
#
# Over the tunneled chip, pulling the full condensed statistics to host is
# the bottleneck at scale (~16 MB/s; 10k variables = ~1 GB), and host-side
# gammaincc over 5e7 pairs costs another minute.  Instead p-values are
# computed on device in LOG space (no underflow, total order preserved),
# BH-FDR runs as one device sort + reverse-cummin, and only the significant
# pairs (plus one count scalar) ever cross to the host.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_df", "reliable_only"))
def _flatten_block_mi(stat, df, nobs, suff, s, start, y_start, p, max_df,
                      reliable_only):
    t, ylen = stat.shape
    X = s + lax.broadcasted_iota(jnp.int32, (t, ylen), 0)
    Y = y_start + lax.broadcasted_iota(jnp.int32, (t, ylen), 1)
    # X >= start dedupes the overlap of the re-aligned final block
    valid = (X < Y) & (X >= start) & (Y < p)
    logp = sf.mi_logpval_smalldf(stat, df, nobs, max_df, xp=jnp)
    fill = jnp.inf if reliable_only else 0.0
    logp = jnp.where(suff, logp, fill)
    logp = jnp.where(valid, logp, jnp.inf)
    unrel = (valid & ~suff).sum()
    return logp.ravel(), stat.ravel(), unrel


@partial(jax.jit, static_argnames=("reliable_only",))
def _flatten_block_fz_nz(r, N, s, start, y_start, p, n_obs_min,
                         reliable_only):
    t, ylen = r.shape
    X = s + lax.broadcasted_iota(jnp.int32, (t, ylen), 0)
    Y = y_start + lax.broadcasted_iota(jnp.int32, (t, ylen), 1)
    valid = (X < Y) & (X >= start) & (Y < p)
    suff = N >= n_obs_min
    stat = jnp.where(suff, r, 0.0)
    logp = sf.fz_logpval(stat, N, 0, xp=jnp)
    fill = jnp.inf if reliable_only else 0.0
    logp = jnp.where(suff, logp, fill)
    logp = jnp.where(valid, logp, jnp.inf)
    unrel = (valid & ~suff).sum()
    return logp.ravel(), stat.ravel(), unrel


@partial(jax.jit, static_argnames=("suff", "reliable_only"))
def _flatten_fz_full(C, n, p, suff, reliable_only):
    """Flatten the device correlation matrix's X<Y triangle into log
    p-values (fz mode; the power check n >= n_obs_min is a run-level
    scalar).  NaN correlations (zero-variance variables) count as
    unreliable like the host path's NaN p-values."""
    P = C.shape[0]
    X = lax.broadcasted_iota(jnp.int32, (P, P), 0)
    Y = lax.broadcasted_iota(jnp.int32, (P, P), 1)
    valid = (X < Y) & (Y < p)
    if suff:
        logp = sf.fz_logpval(C, n, 0, xp=jnp)
        bad = jnp.isnan(logp)
        fill = jnp.inf if reliable_only else 0.0
        logp = jnp.where(bad, fill, logp)
    else:
        bad = jnp.ones_like(C, dtype=bool)
        logp = jnp.full_like(C, jnp.inf if reliable_only else 0.0)
    logp = jnp.where(valid, logp, jnp.inf)
    unrel = (valid & bad).sum()
    stat = jnp.where(jnp.isnan(C), jnp.nan, C) if suff else jnp.zeros_like(C)
    return logp.ravel(), stat.ravel(), unrel


@partial(jax.jit, static_argnames=("suff", "reliable_only"))
def _flatten_fz_slab(C, n, y0, p, suff, reliable_only):
    """_flatten_fz_full for a (p_int, ploc) correlation slab whose columns
    are global variables [y0, y0+ploc) -- the per-device piece of the
    mesh-sharded fz pass."""
    Pr, ploc = C.shape
    X = lax.broadcasted_iota(jnp.int32, (Pr, ploc), 0)
    Y = y0.astype(jnp.int32) + lax.broadcasted_iota(jnp.int32, (Pr, ploc), 1)
    valid = (X < Y) & (Y < p) & (X < p)
    if suff:
        logp = sf.fz_logpval(C, n, 0, xp=jnp)
        bad = jnp.isnan(logp)
        fill = jnp.inf if reliable_only else 0.0
        logp = jnp.where(bad, fill, logp)
    else:
        bad = jnp.ones_like(C, dtype=bool)
        logp = jnp.full_like(C, jnp.inf if reliable_only else 0.0)
    logp = jnp.where(valid, logp, jnp.inf)
    unrel = (valid & bad).sum()
    stat = jnp.where(jnp.isnan(C), jnp.nan, C) if suff else jnp.zeros_like(C)
    return logp.ravel(), stat.ravel(), unrel


# ---------------------------------------------------------------------------
# explicit SPMD expression over a device mesh (shard_map)
#
# Each X-block call shards its Y-slab over the mesh's 'd' axis: device d
# computes the (tile, y_len/ndev) stats slab for Y variables
# [y_start + d*ylen_loc, y_start + (d+1)*ylen_loc) from REPLICATED data (an
# OTU table is small relative to HBM: 50k x 100k int8 is 5 GB/device).
# Replication keeps every matmul device-local, so the only collectives in
# the whole univariate pass are a psum of the unreliable-test count and the
# all-gather inside the global BH argsort -- O(n_pairs) scalars once per
# run, a layout that is equally valid over ICI and DCN.  This is the
# TPU-native expression of the reference's distributed univariate pass
# (reference: src/tests.jl:474-519 pmap over row-blocks + gather).
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _mesh_mi_block_fn(mesh, use_pallas, extract, tile, L, ylen_loc, p,
                      nz, hps, n_obs_min, reliable_only, max_df):
    """jit(shard_map) computing one X-block's stats with the Y-slab sharded
    over the mesh.  extract=True returns the flattened (logp, stat, unrel)
    fast-path triple; otherwise the raw (stat, df, n_obs, suff) slabs."""
    n_data = 5 if use_pallas else 3

    def body(*args):
        s, start, y_start = args[n_data:]
        di = lax.axis_index("d").astype(s.dtype)
        y0 = y_start + di * ylen_loc
        if use_pallas:
            from .pallas_kernels import mi_univar_stats_pallas

            dataT, data, marg, levels, maxv = args[:n_data]
            stat, df, nobs, sp = mi_univar_stats_pallas(
                dataT, data, marg, levels, maxv, s, tile, L, y0, ylen_loc,
                nz, hps, n_obs_min,
            )
        else:
            data, levels, maxv = args[:n_data]
            ctab = pair_ctab_block(data, s, tile, L, y0, ylen_loc)
            lx = lax.dynamic_slice(levels, (s,), (tile,))
            ly = lax.dynamic_slice(levels, (y0,), (ylen_loc,))
            mx = lax.dynamic_slice(maxv, (s,), (tile,))
            my = lax.dynamic_slice(maxv, (y0,), (ylen_loc,))
            stat, df, nobs, sp = _mi_block_stats_impl(
                ctab, lx, ly, mx, my, hps, n_obs_min, nz, L
            )
        if extract:
            lp, stf, unrel = _flatten_block_mi(
                stat, df, nobs, sp, s, start, y0, p, max_df, reliable_only
            )
            return lp, stf, lax.psum(unrel, "d")
        return stat, df, nobs, sp

    in_specs = (P(),) * (n_data + 3)
    out_specs = (P("d"), P("d"), P()) if extract else (P(None, "d"),) * 4
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))


@lru_cache(maxsize=None)
def _mesh_fznz_block_fn(mesh, use_pallas, extract, tile, ylen_loc, p,
                        n_obs_min, reliable_only):
    def body(data, s, start, y_start):
        di = lax.axis_index("d").astype(s.dtype)
        y0 = y_start + di * ylen_loc
        if use_pallas:
            from .pallas_kernels import fz_nz_block_pallas

            r, N = fz_nz_block_pallas(data, s, tile, y0, ylen_loc)
        else:
            r, N = fz_nz_block(data, s, tile, y0, ylen_loc)
        if extract:
            lp, stf, unrel = _flatten_block_fz_nz(
                r, N, s, start, y0, p, n_obs_min, reliable_only
            )
            return lp, stf, lax.psum(unrel, "d")
        return r, N

    out_specs = (P("d"), P("d"), P()) if extract else (P(None, "d"),) * 2
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(),) * 4,
                                 out_specs=out_specs, check_vma=False))


@lru_cache(maxsize=None)
def _mesh_fz_fn(mesh, extract, ploc, p, suff_run, reliable_only):
    """Sharded full correlation pass: device d computes the (p_int, ploc)
    correlation slab against its own column range via one local matmul."""
    def body(data):
        n = data.shape[0]
        di = lax.axis_index("d")
        y0 = (di * ploc).astype(
            jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        )
        mu = data.mean(axis=0, keepdims=True)
        xc = data - mu
        ss = (xc * xc).sum(axis=0)
        yslab = lax.dynamic_slice(xc, (0, y0), (n, ploc))
        cov = xc.T @ yslab
        d_all = jnp.sqrt(ss)
        d_y = lax.dynamic_slice(d_all, (y0,), (ploc,))
        denom = d_all[:, None] * d_y[None, :]
        C = jnp.where(denom > 0, cov / jnp.where(denom > 0, denom, 1.0),
                      jnp.nan)
        if extract:
            lp, stf, unrel = _flatten_fz_slab(C, n, y0, p, suff_run,
                                              reliable_only)
            return lp, stf, lax.psum(unrel, "d")
        return C

    out_specs = (P("d"), P("d"), P()) if extract else P(None, "d")
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(),),
                                 out_specs=out_specs, check_vma=False))


# ---------------------------------------------------------------------------
# single-dispatch sweeps: over the tunneled chip every XLA execution costs
# ~100 ms of round-trip latency, so the device-extract paths fold ALL X-block
# kernel calls + flattens of a sweep into ONE jitted function (the block
# geometry is static), leaving exactly one dispatch for the whole univariate
# pass plus one for the BH extraction.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _sweep_mi_pallas_fn(geom, tile_sz, L, p, nz, hps, n_obs_min, reliable,
                        max_df):
    from .pallas_kernels import mi_univar_stats_pallas

    def sweep(dataT, data, marg, levels, maxv):
        lps, stfs, unrels = [], [], []
        for (s, start, y_start, y_len) in geom:
            stat, df, nobs, sp = mi_univar_stats_pallas(
                dataT, data, marg, levels, maxv, s, tile_sz, L, y_start,
                y_len, nz, hps, n_obs_min,
            )
            lp, stf, unrel = _flatten_block_mi(
                stat, df, nobs, sp, s, start, y_start, p, max_df, reliable
            )
            lps.append(lp)
            stfs.append(stf)
            unrels.append(unrel)
        return (jnp.concatenate(lps), jnp.concatenate(stfs),
                jnp.stack(unrels).sum())

    return jax.jit(sweep)


@lru_cache(maxsize=None)
def _mesh_mi_sweep_fn(mesh, use_pallas, geom, tile_sz, L, p, nz, hps,
                      n_obs_min, reliable, max_df):
    """shard_map sweep: every X-block's Y-slab is sharded over 'd'; each
    device emits its concatenated (logp, stat) slabs for the WHOLE sweep in
    one execution.  geom entries are (s, start, y_start, ylen_loc)."""
    n_data = 5 if use_pallas else 3

    def body(*args):
        di = lax.axis_index("d")
        idt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        lps, stfs, unrels = [], [], []
        for (s, start, y_start, ylen_loc) in geom:
            y0 = (y_start + di * ylen_loc).astype(idt)
            if use_pallas:
                from .pallas_kernels import mi_univar_stats_pallas

                dataT, data, marg, levels, maxv = args[:n_data]
                stat, df, nobs, sp = mi_univar_stats_pallas(
                    dataT, data, marg, levels, maxv, s, tile_sz, L, y0,
                    ylen_loc, nz, hps, n_obs_min,
                )
            else:
                data, levels, maxv = args[:n_data]
                ctab = pair_ctab_block(data, s, tile_sz, L, y0, ylen_loc)
                lx = lax.dynamic_slice(levels, (s,), (tile_sz,))
                ly = lax.dynamic_slice(levels, (y0,), (ylen_loc,))
                mx = lax.dynamic_slice(maxv, (s,), (tile_sz,))
                my = lax.dynamic_slice(maxv, (y0,), (ylen_loc,))
                stat, df, nobs, sp = _mi_block_stats_impl(
                    ctab, lx, ly, mx, my, hps, n_obs_min, nz, L
                )
            lp, stf, unrel = _flatten_block_mi(
                stat, df, nobs, sp, s, start, y0, p, max_df, reliable
            )
            lps.append(lp)
            stfs.append(stf)
            unrels.append(unrel)
        return (jnp.concatenate(lps), jnp.concatenate(stfs),
                lax.psum(jnp.stack(unrels).sum(), "d"))

    in_specs = (P(),) * n_data
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=(P("d"), P("d"), P()),
                                 check_vma=False))


@lru_cache(maxsize=None)
def _sweep_fznz_fn(geom, tile_sz, p, n_obs_min, reliable, use_pallas):
    def sweep(data):
        lps, stfs, unrels = [], [], []
        for (s, start, y_start, y_len) in geom:
            if use_pallas:
                from .pallas_kernels import fz_nz_block_pallas

                r, N = fz_nz_block_pallas(data, s, tile_sz, y_start, y_len)
            else:
                r, N = fz_nz_block(data, s, tile_sz, y_start, y_len)
            lp, stf, unrel = _flatten_block_fz_nz(
                r, N, s, start, y_start, p, n_obs_min, reliable
            )
            lps.append(lp)
            stfs.append(stf)
            unrels.append(unrel)
        return (jnp.concatenate(lps), jnp.concatenate(stfs),
                jnp.stack(unrels).sum())

    return jax.jit(sweep)


@lru_cache(maxsize=None)
def _mesh_fznz_sweep_fn(mesh, use_pallas, geom, tile_sz, p, n_obs_min,
                        reliable):
    def body(data):
        di = lax.axis_index("d")
        idt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        lps, stfs, unrels = [], [], []
        for (s, start, y_start, ylen_loc) in geom:
            y0 = (y_start + di * ylen_loc).astype(idt)
            if use_pallas:
                from .pallas_kernels import fz_nz_block_pallas

                r, N = fz_nz_block_pallas(data, s, tile_sz, y0, ylen_loc)
            else:
                r, N = fz_nz_block(data, s, tile_sz, y0, ylen_loc)
            lp, stf, unrel = _flatten_block_fz_nz(
                r, N, s, start, y0, p, n_obs_min, reliable
            )
            lps.append(lp)
            stfs.append(stf)
            unrels.append(unrel)
        return (jnp.concatenate(lps), jnp.concatenate(stfs),
                lax.psum(jnp.stack(unrels).sum(), "d"))

    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(),),
                                 out_specs=(P("d"), P("d"), P()),
                                 check_vma=False))


def _sweep_geom(p_int, tile_sz, slab, ndev=1):
    """Static block geometry [(s, start, y_start, y_len_or_loc)] plus the
    blk_meta slab map consumed by _extract_significant.  With ndev > 1 the
    geometry carries per-device slab lengths and the meta enumerates the
    device-major output layout of the shard_map sweep."""
    geom, prefixes = [], []
    per_dev = 0
    for start in range(0, p_int, tile_sz):
        t = min(tile_sz, p_int - start)
        s = start if t == tile_sz else max(0, p_int - tile_sz)
        y_start, y_len = slab(s)
        ylen_loc = y_len // ndev
        geom.append((s, start, y_start, ylen_loc))
        prefixes.append(per_dev)
        per_dev += tile_sz * ylen_loc
    blk_meta = []
    for dd in range(ndev):
        for (s, start, y_start, ylen_loc), pref in zip(geom, prefixes):
            blk_meta.append((dd * per_dev + pref, s,
                             y_start + dd * ylen_loc, ylen_loc))
    return tuple(geom), blk_meta


@partial(jax.jit, static_argnames=("fdr",))
def _bh_prefix_device(logp, m, alpha, fdr):
    """Log-space BH on device (semantics of statfuns.benjamini_hochberg).

    Returns (order, ladj_sorted, n_sig): the significant set is always a
    PREFIX of the sorted order because the adjusted value is a suffix-cummin
    (monotone along the sort)."""
    N = logp.shape[0]
    order = jnp.argsort(logp)
    slog = jnp.take(logp, order)
    la = jnp.log(alpha)
    if fdr:
        ranks = jnp.arange(1, N + 1, dtype=slog.dtype)
        terms = jnp.where(slog < la, slog + jnp.log(m) - jnp.log(ranks),
                          jnp.inf)
        ladj = jnp.minimum(lax.cummin(terms, reverse=True), 0.0)
    else:
        ladj = slog
    n_sig = (ladj < la).sum()
    return order, ladj, n_sig


@partial(jax.jit, static_argnames=("K", "fdr", "reliable"))
def _bh_extract_device(logp, stat, unrel, n_pairs, alpha, K, fdr, reliable):
    """One-shot device BH + significant-candidate extraction.

    BH is restricted to the p < alpha candidate set, compacted to K slots.
    Exact: the BH threshold never exceeds alpha (k*alpha/m <= alpha), so
    entries with p >= alpha can never be significant, and because every
    excluded entry sorts after every candidate, candidate ranks in the
    compacted sort equal their global ranks.  This is the device analogue of
    the reference's accelerated pre-filtering BH (src/statfuns.jl:326-334);
    it replaces an O(n_pairs) argsort with an O(n_pairs) compaction plus an
    O(K log K) sort (n_pairs ~ 6e7, K ~ 1e6 at alpha=0.01).

    Everything the host needs ships as TWO arrays -- over the tunneled chip
    each fetch costs ~100 ms of latency, so m (from the unreliable-test
    counts), the candidate count, and the (index, log-padj, stat) triple are
    all computed here and packed:
      packed  (3, K) int: [flat index, bitcast log-padj, bitcast stat] sorted
      scalars (2,)   int: [n_sig, k_cand]  (k_cand > K -> host retries)"""
    N = logp.shape[0]
    dtype = logp.dtype
    it = jnp.int64 if dtype == jnp.float64 else jnp.int32
    m = jnp.asarray(n_pairs, dtype)
    if reliable:
        m = m - unrel.sum().astype(dtype)
    la = jnp.log(alpha)
    mask = logp < la
    k_cand = mask.sum().astype(it)
    idx = jnp.nonzero(mask, size=K, fill_value=N)[0]
    valid = idx < N
    safe = jnp.where(valid, idx, 0)
    vals = jnp.where(valid, jnp.take(logp, safe), jnp.inf)
    order, ladj, n_sig = _bh_prefix_device(vals, m, alpha, fdr)
    flat = jnp.take(idx, order).astype(it)
    stat_sorted = jnp.take(stat, jnp.where(flat < N, flat, 0))
    packed = jnp.stack([
        flat,
        lax.bitcast_convert_type(ladj.astype(dtype), it),
        lax.bitcast_convert_type(stat_sorted.astype(dtype), it),
    ])
    return packed, jnp.stack([n_sig.astype(it), k_cand])


def _cand_bucket(k: int, N: int) -> int:
    """Pad the candidate count to a power of two to bound the jit cache."""
    K = 1 << max(int(k).bit_length(), 14)
    return min(K, N)


def _extract_significant(logp_parts, stat_parts, blocks, p, n_pairs, alpha,
                         FDR, unrel_parts=None, reliable=False):
    """Run device BH over the concatenated block slabs and pull only the
    significant pairs.  blocks: list of (offset, s, y_start, ylen)."""
    logp = jnp.concatenate(logp_parts)
    stat = jnp.concatenate(stat_parts)
    dtype = logp.dtype
    N = logp.shape[0]
    if N >= 2 ** 31:
        raise NotImplementedError(
            "univariate extraction beyond 2^31 covered pairs needs a "
            "partitioned BH pass"
        )
    unrel = (jnp.stack([jnp.asarray(u) for u in unrel_parts])
             if reliable and unrel_parts else jnp.zeros(1, dtype))
    K = min(1 << 20, N)
    while True:
        packed, scalars = _bh_extract_device(
            logp, stat, unrel, float(n_pairs), jnp.asarray(alpha, dtype),
            K, FDR, bool(reliable and unrel_parts is not None),
        )
        sc = np.asarray(scalars)
        n_sig, k_cand = int(sc[0]), int(sc[1])
        if k_cand <= K or K >= N:
            break
        K = _cand_bucket(k_cand, N)  # rare: >1M sub-alpha pairs, retry bigger
    # fetch a pow2-padded prefix: ONE transfer, bounded compiled slice shapes
    ns_pad = min(max(1 << max(int(n_sig).bit_length(), 10), n_sig), K)
    buf = np.asarray(packed[:, :ns_pad])[:, :n_sig]
    ft = np.float64 if buf.dtype == np.int64 else np.float32
    flat_idx = buf[0].astype(np.int64)
    pvals_sig = np.exp(buf[1].view(ft).astype(np.float64))
    stats_sig = buf[2].view(ft).astype(np.float64)
    # flat position -> (X, Y) via the per-block slab geometry
    offsets = np.array([b[0] for b in blocks], dtype=np.int64)
    bi = np.searchsorted(offsets, flat_idx, side="right") - 1
    local = flat_idx - offsets[bi]
    s_arr = np.array([b[1] for b in blocks], dtype=np.int64)
    ys_arr = np.array([b[2] for b in blocks], dtype=np.int64)
    ylen_arr = np.array([b[3] for b in blocks], dtype=np.int64)
    X = s_arr[bi] + local // ylen_arr[bi]
    Y = ys_arr[bi] + local % ylen_arr[bi]
    nbr = {i: {} for i in range(p)}
    for x, y, st, pv in zip(X, Y, stats_sig, pvals_sig):
        entry = (float(st), float(pv))
        nbr[int(x)][int(y)] = entry
        nbr[int(y)][int(x)] = entry
    return nbr


class UnivarResult:
    """All-pairs statistics in condensed (X < Y) layout."""

    def __init__(self, p, stats, pvals, suff_power):
        self.p = p
        self.stats = stats          # (n_pairs,) float64, raw stats
        self.pvals = pvals          # (n_pairs,) float64 (NaN = unreliable)
        self.suff_power = suff_power

    def neighbor_dicts(self, alpha: float) -> Dict[int, "OrderedDictType"]:
        """Per-variable neighbor dicts of significant pairs sorted later by
        the caller (reference: src/tests.jl:372-388)."""
        p = self.p
        nbr = {X: {} for X in range(p)}
        with np.errstate(invalid="ignore"):
            sig = self.pvals < alpha        # NaN -> False
        sig_idx = np.nonzero(sig)[0]
        Xs, Ys = condensed_to_pair(sig_idx, p)
        for idx, X, Y in zip(sig_idx, Xs, Ys):
            entry = (float(self.stats[idx]), float(self.pvals[idx]))
            nbr[int(X)][int(Y)] = entry
            nbr[int(Y)][int(X)] = entry
        return nbr


def pw_univar_neighbors(
    data: np.ndarray,
    test_name: str = "mi",
    alpha: float = 0.01,
    hps: int = 5,
    n_obs_min: int = 0,
    FDR: bool = True,
    levels: Optional[np.ndarray] = None,
    max_vals: Optional[np.ndarray] = None,
    cor_mat: Optional[np.ndarray] = None,
    correct_reliable_only: bool = True,
    tile: Optional[int] = None,
    return_result: bool = False,
    mesh=None,
):
    """All-pairs univariate pass (reference: src/tests.jl:436-532).

    Returns per-variable neighbor dicts {X: {Y: (stat, pval)}} (0-based) of
    FDR-significant pairs; with return_result=True also the condensed
    UnivarResult.  With a mesh, the variable axis is sharded across devices
    so each matmul (and its output slab) is computed SPMD.
    """
    from ..utils.misc import get_levels, get_max_vals

    n, p = data.shape
    nz = is_zero_adjusted(test_name)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    n_pairs = p * (p - 1) // 2
    idx_dt = np.int64 if jax.config.jax_enable_x64 else np.int32

    # pad the variable axis so Y-slabs shard evenly over the mesh; padded
    # columns are all-zero (levels=1) and their pair results are discarded
    ndev = 1
    p_int = p
    tile_sz = _choose_tile(p, tile)
    if mesh is not None:
        from ..parallel.mesh import pad_to_multiple

        ndev = mesh.devices.size
        p0 = p + (-p) % ndev
        tile_sz = min(_choose_tile(p0, tile) + (-_choose_tile(p0, tile)) % ndev,
                      p0)
        data = pad_to_multiple(np.asarray(data), tile_sz, axis=1)
        p_int = data.shape[1]
        if levels is not None:
            levels = np.concatenate(
                [np.asarray(levels), np.ones(p_int - p, np.int32)]
            )
            max_vals = np.concatenate(
                [np.asarray(max_vals), np.zeros(p_int - p, np.int32)]
            )

    def _put(arr, put_dtype=None):
        x = jnp.asarray(arr, dtype=put_dtype or dtype)
        if mesh is not None:
            from ..parallel.mesh import replicated

            x = jax.device_put(x, replicated(mesh))
        return x

    if isdiscrete(test_name):
        if levels is None:
            levels = get_levels(data)
            max_vals = get_max_vals(data)
        L = int(np.max(max_vals)) + 1
        stats = np.empty(n_pairs)
        df_c = np.empty(n_pairs, dtype=np.int64)
        nobs_c = np.empty(n_pairs, dtype=np.int64)
        suff = np.empty(n_pairs, dtype=bool)
        levels_np = np.asarray(levels, dtype=np.int32)
        maxv_np = np.asarray(max_vals, dtype=np.int32)
        use_pallas = ((jax.default_backend() == "tpu" or FORCE_PALLAS)
                      and L < 128)
        device_extract = (use_pallas or mesh is not None) and not return_result
        slab = _y_slabs(p_int, tile_sz, triangle=True)
        if use_pallas:
            from .pallas_kernels import (
                level_marginals, mi_univar_stats_pallas,
            )

            # host-side int8 cast: 4x less tunnel upload + kernel read traffic
            data_j = _put(np.asarray(data, dtype=np.int8), jnp.int8)
            data_jT = jnp.asarray(data_j.T)   # native-layout MXU X operand
            marg = level_marginals(data_j, L)
        else:
            data_j = _put(data)
        if mesh is not None:
            from ..parallel.mesh import replicated

            lvl_j, mv_j = (
                jax.device_put(jnp.asarray(a), replicated(mesh))
                for a in (levels_np, maxv_np)
            )
            mesh_args = ((data_jT, data_j, marg, lvl_j, mv_j) if use_pallas
                         else (data_j, lvl_j, mv_j))
        if device_extract:
            # single-dispatch sweep: all block kernels + flattens in ONE
            # device execution, then one BH-extraction call
            if mesh is not None:
                geom, blk_meta = _sweep_geom(p_int, tile_sz, slab, ndev)
                fn = _mesh_mi_sweep_fn(
                    mesh, use_pallas, geom, tile_sz, L, p, nz, float(hps),
                    float(n_obs_min), correct_reliable_only, (L - 1) ** 2,
                )
                lp, stf, unrel = fn(*mesh_args)
            else:
                geom, blk_meta = _sweep_geom(p_int, tile_sz, slab)
                fn = _sweep_mi_pallas_fn(
                    geom, tile_sz, L, p, nz, float(hps), float(n_obs_min),
                    correct_reliable_only, (L - 1) ** 2,
                )
                lp, stf, unrel = fn(data_jT, data_j, marg,
                                    jnp.asarray(levels_np),
                                    jnp.asarray(maxv_np))
            return _extract_significant(
                [lp], [stf], blk_meta, p, n_pairs, alpha, FDR,
                unrel_parts=[unrel], reliable=correct_reliable_only,
            )
        for start in range(0, p_int, tile_sz):
            t = min(tile_sz, p_int - start)
            # fixed tile size for jit cache: pad the final block
            s = start if t == tile_sz else max(0, p_int - tile_sz)
            y_start, y_len = slab(s)
            lvl_y = levels_np[y_start : y_start + y_len]
            mv_y = maxv_np[y_start : y_start + y_len]
            if mesh is not None:
                ylen_loc = y_len // ndev
                fn = _mesh_mi_block_fn(
                    mesh, use_pallas, False, tile_sz, L, ylen_loc,
                    p, nz, float(hps), float(n_obs_min),
                    correct_reliable_only, (L - 1) ** 2,
                )
                stat, df, n_obs, sp = fn(*mesh_args, idx_dt(s), idx_dt(start),
                                         idx_dt(y_start))
            elif use_pallas:
                stat, df, n_obs, sp = mi_univar_stats_pallas(
                    data_jT, data_j, marg, levels_np, maxv_np, s, tile_sz,
                    L, y_start, y_len, nz, float(hps), float(n_obs_min),
                )
            else:
                ctab = pair_ctab_block(data_j, s, tile_sz, L, y_start, y_len)
                stat, df, n_obs, sp = mi_block_stats(
                    ctab, levels_np[s : s + tile_sz], lvl_y,
                    maxv_np[s : s + tile_sz], mv_y, float(hps),
                    float(n_obs_min), nz, L,
                )
            _condense_block(
                s, tile_sz, p,
                [np.asarray(stat, np.float64), np.asarray(df),
                 np.asarray(n_obs), np.asarray(sp)],
                [stats, df_c, nobs_c, suff],
                y_start=y_start,
            )
        pvals = sf.mi_pval(stats, df_c, nobs_c)
        pvals = np.where(df_c > 0, pvals, 1.0)
        pvals = np.where(suff, pvals, 1.0)
        stats = np.where(suff, stats, 0.0)
    elif test_name == "fz":
        have_cor = cor_mat is not None and cor_mat.size
        device_extract = ((jax.default_backend() == "tpu" or FORCE_PALLAS
                           or mesh is not None)
                          and not return_result and not have_cor)
        suff_run = bool(n >= n_obs_min)
        if device_extract and mesh is not None:
            ploc = p_int // ndev
            fn = _mesh_fz_fn(mesh, True, ploc, p, suff_run,
                             correct_reliable_only)
            lp, stf, unrel = fn(_put(data))
            blocks = [(dd * p_int * ploc, 0, dd * ploc, ploc)
                      for dd in range(ndev)]
            return _extract_significant(
                [lp], [stf], blocks, p, n_pairs, alpha, FDR,
                unrel_parts=[unrel], reliable=correct_reliable_only,
            )
        if device_extract:
            Cd = cor_matrix(_put(data))
            lp, stf, unrel = _flatten_fz_full(
                Cd, n, p, suff_run, correct_reliable_only
            )
            return _extract_significant(
                [lp], [stf], [(0, 0, 0, p)], p, n_pairs, alpha, FDR,
                unrel_parts=[unrel], reliable=correct_reliable_only,
            )
        if have_cor:
            C = np.asarray(cor_mat, dtype=np.float64)[:p, :p]
        elif mesh is not None:
            ploc = p_int // ndev
            fn = _mesh_fz_fn(mesh, False, ploc, p, suff_run,
                             correct_reliable_only)
            C = np.asarray(fn(_put(data)), dtype=np.float64)[:p, :p]
        else:
            C = np.asarray(cor_matrix(_put(data)), dtype=np.float64)[:p, :p]
        stats = C[np.triu_indices(p, 1)]
        n_obs = np.full(n_pairs, n)
        suff = n_obs >= n_obs_min
        pvals = sf.fz_pval(stats, n_obs, 0)
        stats = np.where(suff, stats, 0.0)
        pvals = np.where(suff, pvals, 1.0)
    elif test_name == "fz_nz":
        data_j = _put(data)
        stats = np.empty(n_pairs)
        n_obs = np.empty(n_pairs, dtype=np.int64)
        use_pallas = (jax.default_backend() == "tpu" or FORCE_PALLAS)
        device_extract = (use_pallas or mesh is not None) and not return_result
        slab = _y_slabs(p_int, tile_sz, triangle=True)
        if device_extract:
            # single-dispatch sweep (see the mi branch above)
            if mesh is not None:
                geom, blk_meta = _sweep_geom(p_int, tile_sz, slab, ndev)
                fn = _mesh_fznz_sweep_fn(
                    mesh, use_pallas, geom, tile_sz, p, float(n_obs_min),
                    correct_reliable_only,
                )
            else:
                geom, blk_meta = _sweep_geom(p_int, tile_sz, slab)
                fn = _sweep_fznz_fn(
                    geom, tile_sz, p, float(n_obs_min),
                    correct_reliable_only, use_pallas,
                )
            lp, stf, unrel = fn(data_j)
            return _extract_significant(
                [lp], [stf], blk_meta, p, n_pairs, alpha, FDR,
                unrel_parts=[unrel], reliable=correct_reliable_only,
            )
        for start in range(0, p_int, tile_sz):
            t = min(tile_sz, p_int - start)
            s = start if t == tile_sz else max(0, p_int - tile_sz)
            y_start, y_len = slab(s)
            if mesh is not None:
                ylen_loc = y_len // ndev
                fn = _mesh_fznz_block_fn(
                    mesh, use_pallas, False, tile_sz, ylen_loc, p,
                    float(n_obs_min), correct_reliable_only,
                )
                r, N = fn(data_j, idx_dt(s), idx_dt(start), idx_dt(y_start))
            elif use_pallas:
                from .pallas_kernels import fz_nz_block_pallas

                r, N = fz_nz_block_pallas(data_j, s, tile_sz, y_start, y_len)
            else:
                r, N = fz_nz_block(data_j, s, tile_sz, y_start, y_len)
            _condense_block(
                s, tile_sz, p,
                [np.asarray(r, np.float64), np.asarray(N, np.int64)],
                [stats, n_obs],
                y_start=y_start,
            )
        # n_obs < n_obs_min -> stat forced to 0 (reference src/tests.jl:121-125)
        stats = np.where(n_obs >= n_obs_min, stats, 0.0)
        suff = n_obs >= n_obs_min
        pvals = sf.fz_pval(stats, n_obs, 0)
    else:
        raise ValueError(f"{test_name} is not a valid test name")

    if correct_reliable_only:
        stats = np.where(suff, stats, np.nan)
        pvals = np.where(suff, pvals, np.nan)

    if FDR:
        m = n_pairs
        if correct_reliable_only:
            m -= int(np.isnan(pvals).sum())
        pvals = sf.benjamini_hochberg(pvals, alpha=alpha, m=m)

    result = UnivarResult(p, stats, pvals, suff)
    nbrs = result.neighbor_dicts(alpha)
    if return_result:
        return nbrs, result
    return nbrs
