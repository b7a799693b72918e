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

import math
import warnings
from functools import lru_cache, partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from . import statfuns as sf
from .contingency import pair_ctab_block
from ..types import PSortedNbrs
from ..utils.misc import is_zero_adjusted, isdiscrete


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

@jax.jit
def cor_matrix(data):
    """Full correlation matrix as one Gram matmul (reference equivalent:
    Statistics.cor used at src/learning.jl:44).

    HIGHEST matmul precision: TPU f32 matmuls default to bf16 passes with
    ~1e-3 relative error -- enough to flip near-threshold fz decisions
    (measured: r drifted 4.5e-4 and dropped a golden edge at prec=32)."""
    n = data.shape[0]
    mu = data.mean(axis=0, keepdims=True)
    xc = data - mu
    cov = jnp.matmul(xc.T, xc, precision=lax.Precision.HIGHEST)
    d = jnp.sqrt(jnp.diag(cov))
    denom = d[:, None] * d[None, :]
    r = jnp.where(denom > 0, cov / jnp.where(denom > 0, denom, 1.0), jnp.nan)
    # Julia's Statistics.cor clamps to [-1, 1] (clampcor); without it an
    # exact-copy column pair can round to 1+eps -> NaN Fisher-z p-value
    return jnp.clip(r, -1.0, 1.0)


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

# test hook: exercise the float16 continuous-table upload path off-TPU
FORCE_F16_UPLOAD = False

# continuous tables at least this many elements ship as float16 (the
# host->device transfer dominates at scale: 537 MB f32 ~ 16 s over the
# tunnel at p=65536, n=2048)
F16_UPLOAD_MIN_ELEMS = 1 << 24


@jax.jit
def _widen_f32(x):
    return x.astype(jnp.float32)


def put_continuous(data, mesh=None):
    """Device placement for continuous (fz / fz_nz) tables.

    Large single-chip tables ship as float16 and widen to float32 ON DEVICE
    -- half the transfer bytes; statistics then differ from the f32-upload
    path only by the f16 rounding of the input values (~5e-4 relative),
    well inside the reference's network tolerance model (reference:
    test/learning.jl:46-103).  Falls back to full precision when values
    exceed the f16 range, under x64 (parity runs), or on a mesh."""
    use_f16 = ((jax.default_backend() == "tpu" or FORCE_F16_UPLOAD)
               and mesh is None
               and (FORCE_F16_UPLOAD
                    or (not jax.config.jax_enable_x64
                        and data.size >= F16_UPLOAD_MIN_ELEMS)))
    if use_f16:
        with np.errstate(invalid="ignore"):
            ad = np.abs(data)
            amax = float(np.max(ad)) if data.size else 0.0
            # the fz_nz nonzero-row masks are DISCRETE decisions: a nonzero
            # flushed to f16 zero (or denormal) would change n_obs, so tiny
            # nonzero magnitudes force the full-precision path
            amin_nz = float(np.min(np.where(ad > 0, ad, np.inf)))
        if amax < 60000.0 and amin_nz > 6.2e-5:   # NaN max falls back
            return _widen_f32(jnp.asarray(np.asarray(data, np.float16)))
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x = jnp.asarray(data, dtype)
    if mesh is not None:
        from ..parallel.mesh import put_replicated

        x = put_replicated(x, mesh)
    return x


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
# gammaincc over 5e7 pairs costs another minute.  p-values are computed on
# device in LOG space (no underflow, total order preserved) and only the
# significant pairs (plus tiny count tables) ever cross to the host.
#
# The extraction is TWO sweep passes so device memory stays O(significant)
# instead of O(covered pairs) -- the reference's univariate pass works at any
# p (reference: src/tests.jl:474-519), and at its headline ~100k-variable
# scale O(pairs) buffers (~10^10 entries) cannot exist on one chip:
#
#   pass A: run the sweep kernels, reduce each block to CUMULATIVE counts of
#           log p-values below ~48 host-chosen edges (a tiny count table per
#           block) plus unreliable-test counts.  No per-pair output.
#   host:   pick the BH-safe extraction edge e* from the count table -- the
#           smallest edge provably above every BH-significant p-value (the
#           argument: a significant p in bin b needs p <= alpha*rank/m and
#           rank <= C[b], so bins with lower_edge > alpha*C[b]/m cannot hold
#           one) -- and per-block candidate counts at e* (exact, the same
#           comparison pass B performs).
#   pass B: re-run the sweep; each block compacts its p < e* candidates into
#           an exactly-sized buffer (chunk-count + sort selection: measured
#           on v5e, sort is ~2.5 ns/el where jnp.nonzero costs ~9 ns/el),
#           then one global sort + log-space BH over all candidates finishes
#           in the same dispatch.  Candidate ranks in the global sort equal
#           their ranks over all pairs because every excluded pair has
#           p >= e* > every candidate -- the same argument as the
#           reference's accelerated pre-filtering BH (src/statfuns.jl:326).
#
# Re-running the kernels costs 2x FLOPs but the sweep is MXU-bound and
# cheap relative to materializing O(pairs) HBM traffic; both passes emit
# only O(counts) / O(candidates) bytes.
# ---------------------------------------------------------------------------

N_EXTRACT_BINS = 48
EXTRACT_BUDGET = 1 << 26  # max candidates held on device (x ~16 B each)


@jax.jit
def _fz_center(data):
    """Per-variable centering + sum-of-squares sqrt for the blocked fz sweep
    (one pass; the blocked correlation r = xc_X.T @ xc_Y / (ssd_X ssd_Y) then
    matches cor_matrix exactly)."""
    mu = data.mean(axis=0, keepdims=True)
    xc = data - mu
    ssd = jnp.sqrt((xc * xc).sum(axis=0))
    return xc, ssd


def _block_scores(kind, use_pallas, data_args, s, start, y0, tile_sz, ylen,
                  L, p, nz, hps, n_obs_min, reliable, max_df):
    """One X-block x Y-slab of the sweep reduced to extraction scores.

    Returns (logp, stat, X, Y, unrel): logp is the log p-value with +inf in
    non-pair/invalid slots and the reliable-only fill for unreliable tests;
    X/Y are global variable indices.  ``X >= start`` dedupes the overlap of
    the re-aligned final block.
    """
    if kind == "mi":
        if use_pallas:
            from .pallas_kernels import mi_univar_stats_pallas

            dataT, data, marg, levels, maxv = data_args
            stat, df, nobs, suff = mi_univar_stats_pallas(
                dataT, data, marg, levels, maxv, s, tile_sz, L, y0, ylen,
                nz, hps, n_obs_min,
            )
        else:
            data, levels, maxv = data_args
            ctab = pair_ctab_block(data, s, tile_sz, L, y0, ylen)
            lx = lax.dynamic_slice(levels, (s,), (tile_sz,))
            ly = lax.dynamic_slice(levels, (y0,), (ylen,))
            mx = lax.dynamic_slice(maxv, (s,), (tile_sz,))
            my = lax.dynamic_slice(maxv, (y0,), (ylen,))
            stat, df, nobs, suff = _mi_block_stats_impl(
                ctab, lx, ly, mx, my, hps, n_obs_min, nz, L
            )
        logp = sf.mi_logpval_smalldf(stat, df, nobs, max_df, xp=jnp)
    elif kind == "fznz":
        (data,) = data_args
        if use_pallas:
            from .pallas_kernels import fz_nz_block_pallas

            r, N = fz_nz_block_pallas(data, s, tile_sz, y0, ylen)
        else:
            r, N = fz_nz_block(data, s, tile_sz, y0, ylen)
        suff = N >= n_obs_min
        stat = jnp.where(suff, r, 0.0)
        logp = sf.fz_logpval(stat, N, 0, xp=jnp)
    else:  # "fz": blocked correlation sweep over centered data
        xc, ssd = data_args
        n = xc.shape[0]
        xslab = lax.dynamic_slice(xc, (0, s), (n, tile_sz))
        yslab = lax.dynamic_slice(xc, (0, y0), (n, ylen))
        # decision-grade precision (see cor_matrix)
        cov = jnp.matmul(xslab.T, yslab, precision=lax.Precision.HIGHEST)
        dx = lax.dynamic_slice(ssd, (s,), (tile_sz,))
        dy = lax.dynamic_slice(ssd, (y0,), (ylen,))
        denom = dx[:, None] * dy[None, :]
        stat = jnp.where(denom > 0, cov / jnp.where(denom > 0, denom, 1.0),
                         jnp.nan)
        stat = jnp.clip(stat, -1.0, 1.0)     # Julia cor clampcor parity
        if n >= n_obs_min:
            # NaN correlations (zero variance) are unreliable like the host
            # path's NaN p-values
            logp = sf.fz_logpval(stat, n, 0, xp=jnp)
            suff = ~jnp.isnan(logp)
        else:
            stat = jnp.zeros_like(stat)
            logp = jnp.zeros_like(stat)
            suff = jnp.zeros(stat.shape, bool)
    t, q = stat.shape
    X = s + lax.broadcasted_iota(jnp.int32, (t, q), 0)
    Y = y0 + lax.broadcasted_iota(jnp.int32, (t, q), 1)
    valid = (X < Y) & (X >= start) & (Y < p)
    fill = jnp.inf if reliable else 0.0
    logp = jnp.where(suff, logp, fill)
    logp = jnp.where(valid, logp, jnp.inf)
    unrel = (valid & ~suff).sum()
    return logp, stat, X, Y, unrel


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

@lru_cache(maxsize=8)
def _mesh_mi_block_fn(mesh, use_pallas, tile, L, ylen_loc, nz, hps,
                      n_obs_min):
    """jit(shard_map) computing one X-block's raw (stat, df, n_obs, suff)
    slabs with the Y-slab sharded over the mesh (the condensed host path;
    the fast path goes through _extract_scan)."""
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
        return stat, df, nobs, sp

    in_specs = (P(),) * (n_data + 3)
    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=(P(None, "d"),) * 4,
                                 check_vma=False))


@lru_cache(maxsize=8)
def _mesh_fznz_block_fn(mesh, use_pallas, tile, ylen_loc):
    def body(data, s, start, y_start):
        di = lax.axis_index("d").astype(s.dtype)
        y0 = y_start + di * ylen_loc
        if use_pallas:
            from .pallas_kernels import fz_nz_block_pallas

            return fz_nz_block_pallas(data, s, tile, y0, ylen_loc)
        return fz_nz_block(data, s, tile, y0, ylen_loc)

    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(),) * 4,
                                 out_specs=(P(None, "d"),) * 2,
                                 check_vma=False))


@lru_cache(maxsize=8)
def _mesh_fz_fn(mesh, ploc):
    """Sharded full correlation matrix: device d computes the (p_int, ploc)
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
        cov = jnp.matmul(xc.T, yslab, precision=lax.Precision.HIGHEST)
        d_all = jnp.sqrt(ss)
        d_y = lax.dynamic_slice(d_all, (y0,), (ploc,))
        denom = d_all[:, None] * d_y[None, :]
        r = jnp.where(denom > 0, cov / jnp.where(denom > 0, denom, 1.0),
                      jnp.nan)
        return jnp.clip(r, -1.0, 1.0)        # Julia cor clampcor parity

    return jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(),),
                                 out_specs=P(None, "d"), check_vma=False))


# ---------------------------------------------------------------------------
# two-pass scan extraction (see the design comment above _block_scores)
# ---------------------------------------------------------------------------

def _extract_edges(alpha: float, n_pairs: int) -> np.ndarray:
    """Decreasing log p-value edges e_0 = log(alpha) .. log(alpha/(4m)).

    Everything below the last edge is automatically BH-significant
    (p < alpha/m implies p <= alpha*rank/m for any rank >= 1), so the edge
    grid only needs to resolve the region where the BH cutoff can fall; the
    geometric spacing bounds extraction overshoot to ~45% of the pair count
    in the cutoff's own bin."""
    la = math.log(alpha)
    return np.linspace(la, la - math.log(4.0 * max(float(n_pairs), 2.0)),
                       N_EXTRACT_BINS)


def _select_bin(counts: np.ndarray, m: float, alpha: float,
                edges: np.ndarray) -> int:
    """Smallest bin index b such that the extraction edge e_b provably
    exceeds every BH-significant p-value.

    A significant p in bin b (edges[b+1] <= log p < edges[b]) satisfies
    p <= alpha * rank(p) / m with rank(p) <= counts[b], so a bin with
    edges[b+1] > log(alpha * counts[b] / m) cannot contain one; the first
    bin violating that bound is the safe (and tight, to one bin) choice.
    Falls through to the auto-significant last bin."""
    la = math.log(alpha)
    lm = math.log(max(m, 1.0))
    for b in range(len(edges) - 1):
        if counts[b] > 0 and edges[b + 1] <= la + math.log(counts[b]) - lm:
            return b
    return len(edges) - 1


def _scan_groups(p_int, tile_sz, slab, ndev=1):
    """Sweep blocks grouped by per-device Y-slab length for lax.scan.

    Returns a static tuple of (ylen_loc, ((s, start, y_start), ...)) groups;
    the triangle slab bucketing keeps this to <= ~8 groups, so the compiled
    sweep program is O(groups), not O(blocks)."""
    by_len: Dict[int, list] = {}
    order = []
    for start in range(0, p_int, tile_sz):
        t = min(tile_sz, p_int - start)
        s = start if t == tile_sz else max(0, p_int - tile_sz)
        y_start, y_len = slab(s)
        ylen_loc = y_len // ndev
        if ylen_loc not in by_len:
            by_len[ylen_loc] = []
            order.append(ylen_loc)
        by_len[ylen_loc].append((s, start, y_start))
    return tuple((yl, tuple(by_len[yl])) for yl in order)


@lru_cache(maxsize=8)
def _passA_fn(mesh, kind, use_pallas, groups, tile_sz, L, p, nz, hps,
              n_obs_min, reliable, max_df, n_data):
    """Counting sweep: per block, cumulative counts of log p below each edge
    (plus the unreliable count), packed as one (nsteps, nbins+1) i32 table.
    Under a mesh each device counts its own Y-slab shard (device-major rows,
    no collectives)."""
    nbins = N_EXTRACT_BINS

    def body(*args):
        data_args = args[:n_data]
        edges = args[n_data]
        di = lax.axis_index("d") if mesh is not None else 0
        rows = []
        for ylen_loc, steps in groups:
            s_a = jnp.asarray([st[0] for st in steps], jnp.int32)
            st_a = jnp.asarray([st[1] for st in steps], jnp.int32)
            ys_a = jnp.asarray([st[2] for st in steps], jnp.int32)

            def step_fn(carry, xs, ylen_loc=ylen_loc):
                s, start, y_start = xs
                idt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
                s = s.astype(idt)
                y0 = (y_start + di * ylen_loc).astype(idt)
                logp, _, _, _, unrel = _block_scores(
                    kind, use_pallas, data_args, s, start, y0, tile_sz,
                    ylen_loc, L, p, nz, hps, n_obs_min, reliable, max_df)
                # materialize logp ONCE: without the barrier XLA fuses (and
                # so re-evaluates) the whole transcendental logp chain into
                # every per-edge reduction -- ~50x the epilogue cost and a
                # compile-time blowup
                logp = lax.optimization_barrier(logp)
                cnt = (logp.ravel()[:, None] < edges[None, :]).sum(axis=0)
                cnt = jnp.concatenate([cnt.astype(jnp.int32),
                                       unrel.astype(jnp.int32)[None]])
                return carry, cnt

            _, c_g = lax.scan(step_fn, 0, (s_a, st_a, ys_a))
            rows.append(c_g)
        out = jnp.concatenate(rows)
        if mesh is not None:
            # device-major gather -> replicated: every process (multi-host)
            # reads the full count table locally
            out = lax.all_gather(out, "d", tiled=True)
        return out

    if mesh is None:
        return jax.jit(body)
    return jax.jit(jax.shard_map(body, mesh=mesh,
                                 in_specs=(P(),) * (n_data + 1),
                                 out_specs=P(), check_vma=False))


@lru_cache(maxsize=8)
def _passB_fn(mesh, kind, use_pallas, groups, caps, tile_sz, L, p, nz, hps,
              n_obs_min, reliable, max_df, fdr, n_data):
    """Extraction sweep + in-program global BH.

    Each block compacts its logp < e* candidates into an exactly-sized
    buffer (cap per group, from pass A's counts): chunk-occupancy sort
    selects the candidate-bearing 128-wide chunks, a second sort over the
    gathered chunks orders the candidates by p.  All blocks' candidates are
    then globally sorted and log-space BH runs over them -- candidate ranks
    equal all-pairs ranks because every excluded pair has p >= e*.  Returns
      packed  (4, M) int: [X, Y, bitcast log-padj, bitcast stat], p-sorted
      scalars (2,)   int: [n_sig, overflow]  (overflow: a block recounted
              more candidates than pass A -- impossible unless XLA rounds
              the two passes differently; host retries with larger caps)
      recount (nsteps,) i32 per-block candidate recounts (diagnostics)
    """
    CH = 128

    def body(*args):
        data_args = args[:n_data]
        thresh, la, m = args[n_data:]
        dtype = thresh.dtype
        it = jnp.int64 if dtype == jnp.float64 else jnp.int32
        di = lax.axis_index("d") if mesh is not None else 0
        Xs, Ys, lps, sts, recounts = [], [], [], [], []
        for (ylen_loc, steps), cap in zip(groups, caps):
            s_a = jnp.asarray([st[0] for st in steps], jnp.int32)
            st_a = jnp.asarray([st[1] for st in steps], jnp.int32)
            ys_a = jnp.asarray([st[2] for st in steps], jnp.int32)
            E = tile_sz * ylen_loc
            nchunk = -(-E // CH)
            ncap = min(cap, nchunk)          # chunk-selection slots
            ocap = min(cap, nchunk * CH)     # candidate output slots

            def step_fn(carry, xs, ylen_loc=ylen_loc, nchunk=nchunk,
                        ncap=ncap, ocap=ocap, E=E):
                s, start, y_start = xs
                idt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
                s = s.astype(idt)
                y0 = (y_start + di * ylen_loc).astype(idt)
                logp, stat, X, Y, _ = _block_scores(
                    kind, use_pallas, data_args, s, start, y0, tile_sz,
                    ylen_loc, L, p, nz, hps, n_obs_min, reliable, max_df)
                logp, stat = lax.optimization_barrier((logp, stat))
                lp = logp.ravel()
                stf = stat.ravel().astype(dtype)
                Xf = X.ravel()
                Yf = Y.ravel()
                pad = nchunk * CH - E
                if pad:
                    lp = jnp.concatenate(
                        [lp, jnp.full((pad,), jnp.inf, lp.dtype)])
                    stf = jnp.concatenate([stf, jnp.zeros((pad,), dtype)])
                    Xf = jnp.concatenate([Xf, jnp.zeros((pad,), Xf.dtype)])
                    Yf = jnp.concatenate([Yf, jnp.zeros((pad,), Yf.dtype)])
                mask = lp < thresh
                recount = mask.sum().astype(jnp.int32)
                if ocap == 0:
                    return carry, recount
                # two-level compaction via sized nonzero: candidates arrive
                # UNSORTED (only the final global argsort orders them) --
                # jnp.sort/argsort here would cost ~26 s of XLA compile EACH
                # on the tunneled toolchain, nonzero compiles in ~1 s and
                # runs over only (nchunk,) + (ncap*CH,) elements
                cc = mask.reshape(nchunk, CH).sum(axis=1)
                chunk_sel = jnp.nonzero(cc > 0, size=ncap,
                                        fill_value=nchunk)[0]
                csafe = jnp.where(chunk_sel < nchunk, chunk_sel, 0)
                live = (chunk_sel < nchunk)[:, None]
                glp = jnp.where(live, lp.reshape(nchunk, CH)[csafe], jnp.inf)
                gmask = glp < thresh
                sel = jnp.nonzero(gmask.ravel(), size=ocap,
                                  fill_value=ncap * CH)[0]
                ssafe = jnp.where(sel < ncap * CH, sel, 0)
                cl = jnp.where(sel < ncap * CH,
                               jnp.take(glp.ravel(), ssafe), jnp.inf)
                flat = csafe[ssafe // CH] * CH + (ssafe % CH).astype(jnp.int32)
                return carry, (recount, jnp.take(Xf, flat),
                               jnp.take(Yf, flat), cl, jnp.take(stf, flat))

            if min(cap, nchunk * CH) == 0:
                _, rc_g = lax.scan(step_fn, 0, (s_a, st_a, ys_a))
            else:
                _, (rc_g, cx_g, cy_g, cl_g, cs_g) = lax.scan(
                    step_fn, 0, (s_a, st_a, ys_a))
                Xs.append(cx_g.ravel())
                Ys.append(cy_g.ravel())
                lps.append(cl_g.ravel())
                sts.append(cs_g.ravel())
            recounts.append(rc_g)
        recount = jnp.concatenate(recounts)
        # per-group capacity check against the recount (deterministic
        # recompute; a mismatch can only come from cross-program rounding).
        # Compare LOCALLY (recount and caps_by_step are both (nsteps,) here)
        # before the device-major all_gather widens recount to (ndev*nsteps,).
        caps_by_step = jnp.concatenate([
            jnp.full(len(steps), min(cap, -(-tile_sz * yl // CH) * CH),
                     jnp.int32)
            for (yl, steps), cap in zip(groups, caps)
        ])
        overflow = (recount > caps_by_step).any()
        if mesh is not None:
            recount = lax.all_gather(recount, "d", tiled=True)
            overflow = lax.psum(overflow.astype(jnp.int32), "d") > 0
        X_all = jnp.concatenate(Xs)
        Y_all = jnp.concatenate(Ys)
        lp_all = jnp.concatenate(lps)
        st_all = jnp.concatenate(sts)
        if mesh is not None:
            X_all = lax.all_gather(X_all, "d", tiled=True)
            Y_all = lax.all_gather(Y_all, "d", tiled=True)
            lp_all = lax.all_gather(lp_all, "d", tiled=True)
            st_all = lax.all_gather(st_all, "d", tiled=True)
        order = jnp.argsort(lp_all)
        slog = jnp.take(lp_all, order)
        Xs_ = jnp.take(X_all, order)
        Ys_ = jnp.take(Y_all, order)
        sts_ = jnp.take(st_all, order)
        if fdr:
            M = slog.shape[0]
            ranks = jnp.arange(1, M + 1, dtype=slog.dtype)
            terms = jnp.where(slog < la, slog + jnp.log(m) - jnp.log(ranks),
                              jnp.inf)
            ladj = jnp.minimum(lax.cummin(terms, reverse=True), 0.0)
        else:
            ladj = slog
        n_sig = (ladj < la).sum()
        packed = jnp.stack([
            Xs_.astype(it), Ys_.astype(it),
            lax.bitcast_convert_type(ladj.astype(dtype), it),
            lax.bitcast_convert_type(sts_.astype(dtype), it),
        ])
        scal = jnp.stack([n_sig.astype(it), overflow.astype(it)])
        return packed, scal, recount

    if mesh is None:
        return jax.jit(body)
    return jax.jit(jax.shard_map(body, mesh=mesh,
                                 in_specs=(P(),) * (n_data + 3),
                                 out_specs=(P(), P(), P()),
                                 check_vma=False))


def _extract_scan(kind, data_args, mesh, use_pallas, p_int, tile_sz, slab, p,
                  n_pairs, alpha, FDR, reliable, L=0, nz=False, hps=0.0,
                  n_obs_min=0.0, max_df=0):
    """Host driver of the two-pass extraction; returns the neighbor dicts of
    BH-significant pairs (the fast-path result of pw_univar_neighbors)."""
    ndev = 1 if mesh is None else mesh.devices.size
    groups = _scan_groups(p_int, tile_sz, slab, ndev)
    group_sizes = [len(g[1]) for g in groups]
    nsteps = sum(group_sizes)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    edges = _extract_edges(alpha, n_pairs)
    kw = dict(L=L, nz=nz, hps=float(hps), n_obs_min=float(n_obs_min))
    fA = _passA_fn(mesh, kind, use_pallas, groups, tile_sz, kw["L"], p,
                   kw["nz"], kw["hps"], kw["n_obs_min"], bool(reliable),
                   max_df, len(data_args))
    tbl = np.asarray(fA(*data_args, jnp.asarray(edges, dtype))).astype(
        np.int64)                                   # (ndev*nsteps, nbins+1)
    cnts = tbl[:, :N_EXTRACT_BINS]
    unrel_tot = int(tbl[:, N_EXTRACT_BINS].sum())
    m = n_pairs - (unrel_tot if reliable else 0)
    tot = cnts.sum(axis=0)
    b_hat = _select_bin(tot, m, alpha, edges) if FDR else 0
    K = int(tot[b_hat])
    if K == 0:
        return {i: PSortedNbrs() for i in range(p)}
    if K > EXTRACT_BUDGET:
        raise RuntimeError(
            f"{K} sub-threshold univariate pairs exceed the device "
            f"extraction budget ({EXTRACT_BUDGET}); the network is "
            "pathologically dense at this scale -- raise alpha and/or keep "
            "FDR enabled to shrink the significant set (the host condensed "
            "path is NOT an option here: it allocates O(p^2) float64)"
        )
    # per-group caps: exact per-(device, block) candidate counts at e*
    step_counts = cnts[:, b_hat].reshape(ndev, nsteps)
    offs = np.cumsum([0] + group_sizes)
    caps = []
    for gi in range(len(groups)):
        c = int(step_counts[:, offs[gi]:offs[gi + 1]].max(initial=0))
        caps.append(0 if c == 0 else max(64, 1 << (c - 1).bit_length()))
    overflowed = True
    for _ in range(3):
        fB = _passB_fn(mesh, kind, use_pallas, groups, tuple(caps), tile_sz,
                       kw["L"], p, kw["nz"], kw["hps"], kw["n_obs_min"],
                       bool(reliable), max_df, bool(FDR), len(data_args))
        packed, scal, recount = fB(
            *data_args, jnp.asarray(edges[b_hat], dtype),
            jnp.asarray(math.log(alpha), dtype), jnp.asarray(float(m), dtype))
        sc = np.asarray(scal)
        n_sig = int(sc[0])
        if not int(sc[1]):
            overflowed = False
            break
        rc = np.asarray(recount).reshape(ndev, nsteps)
        warnings.warn(
            "univariate extraction recount exceeded pass-A capacity "
            "(cross-program rounding divergence?); retrying with larger caps"
        )
        caps = []
        for gi in range(len(groups)):
            c = int(rc[:, offs[gi]:offs[gi + 1]].max(initial=0))
            caps.append(0 if c == 0 else max(64, 1 << c.bit_length()))
    if overflowed:
        # never silently return a truncated candidate set: dropped
        # candidates could be BH-significant pairs
        raise RuntimeError(
            "univariate extraction recount still exceeds capacity after 3 "
            "cap-doubling retries; refusing to return a truncated candidate "
            "set (raise alpha, or report this as a compiler rounding bug)"
        )
    # fetch a pow2-padded prefix: ONE transfer, bounded compiled slice shapes
    M_tot = int(packed.shape[1])
    ns_pad = min(max(1 << max(int(n_sig).bit_length(), 10), n_sig), M_tot)
    buf = np.asarray(packed[:, :ns_pad])[:, :n_sig]
    ft = np.float64 if buf.dtype == np.int64 else np.float32
    pvals_sig = np.exp(buf[2].view(ft).astype(np.float64))
    stats_sig = buf[3].view(ft).astype(np.float64)
    Xs_sig = buf[0]
    Ys_sig = buf[1]
    if kind == "fz" and ft == np.float32 and n_sig > 0:
        # refine in float64 on host: the f32 device log-p ordering can swap
        # near-tied candidates, and candidate ORDER feeds the HITON search
        # (a swapped order changes which conditioning subset is recorded as
        # the weakest -- observed as a 6% golden weight drift at prec=32).
        # The extracted stats are HIGHEST-precision matmul outputs
        # (~1e-7), so f64 p-values from them restore the f64 order;
        # BH-adjustment over the extracted prefix is exact because the
        # extraction threshold guarantees these are the top-ranked pairs.
        n_rows = data_args[0].shape[0]
        praw = np.asarray(sf.fz_pval(stats_sig, n_rows, 0), np.float64)
        order = np.argsort(praw, kind="stable")
        praw_s = praw[order]
        if FDR:
            ranks = np.arange(1, n_sig + 1, dtype=np.float64)
            terms = praw_s * (float(m) / ranks)
            adj = np.minimum.accumulate(terms[::-1])[::-1]
            np.minimum(adj, 1.0, out=adj)
        else:
            adj = praw_s
        keep = adj < alpha
        stats_sig = stats_sig[order][keep]
        pvals_sig = adj[keep]
        Xs_sig = Xs_sig[order][keep]
        Ys_sig = Ys_sig[order][keep]
    if n_sig > 0:
        # BH plateaus produce EXACT adjusted-p ties; the host path's
        # candidate order breaks those ties by condensed pair index (its
        # dicts insert in condensed order, then stable-sort by adjusted p),
        # so the dict insertion order here must too -- a swapped tie
        # changes HITON's candidate order and thereby which conditioning
        # subset gets recorded as an edge weight
        cpos = condensed_pos(np.minimum(Xs_sig, Ys_sig),
                             np.maximum(Xs_sig, Ys_sig), p)
        tie_order = np.lexsort((cpos, pvals_sig))
        stats_sig = stats_sig[tie_order]
        pvals_sig = pvals_sig[tie_order]
        Xs_sig = Xs_sig[tie_order]
        Ys_sig = Ys_sig[tie_order]
    nbr = {i: PSortedNbrs() for i in range(p)}
    for x, y, st, pv in zip(Xs_sig, Ys_sig, stats_sig, pvals_sig):
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
    data_dev=None,
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
            from ..parallel.mesh import put_replicated

            x = put_replicated(x, mesh)
        return x

    if isdiscrete(test_name):
        if levels is None:
            levels = get_levels(data)
            max_vals = get_max_vals(data)
        L = int(np.max(max_vals)) + 1
        if nz and L == 3 and (np.asarray(max_vals) > 1).all():
            # 3-state nz flag: 2 = nz-UNIFORM (every variable 3-level), which
            # lets the Pallas epilogue fold all slicing masks statically;
            # truthiness is unchanged for the XLA paths
            nz = 2
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

            if data_dev is not None and mesh is None:
                data_j = data_dev     # caller's upload (levels rode it too)
            else:
                # host-side int8 cast: 4x less tunnel upload + kernel read
                data_j = _put(np.asarray(data, dtype=np.int8), jnp.int8)
            data_jT = jnp.asarray(data_j.T)   # native-layout MXU X operand
            marg = level_marginals(data_j, L)
        else:
            data_j = _put(data)
        if mesh is not None:
            from ..parallel.mesh import put_replicated

            lvl_j, mv_j = (
                put_replicated(a, mesh) for a in (levels_np, maxv_np)
            )
            mesh_args = ((data_jT, data_j, marg, lvl_j, mv_j) if use_pallas
                         else (data_j, lvl_j, mv_j))
        if device_extract:
            if mesh is not None:
                data_args = mesh_args
            else:
                data_args = (data_jT, data_j, marg, jnp.asarray(levels_np),
                             jnp.asarray(maxv_np))
            return _extract_scan(
                "mi", data_args, mesh, use_pallas, p_int, tile_sz, slab, p,
                n_pairs, alpha, FDR, correct_reliable_only, L=L, nz=nz,
                hps=float(hps), n_obs_min=float(n_obs_min),
                max_df=(L - 1) ** 2,
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
                    mesh, use_pallas, tile_sz, L, ylen_loc, nz, float(hps),
                    float(n_obs_min),
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
        if device_extract:
            # blocked correlation sweep: never materializes the p x p matrix
            if data_dev is not None and mesh is None:
                xc, ssd = _fz_center(data_dev)
            else:
                xc, ssd = _fz_center(put_continuous(data, mesh))
            slab = _y_slabs(p_int, tile_sz, triangle=True)
            return _extract_scan(
                "fz", (xc, ssd), mesh, False, p_int, tile_sz, slab, p,
                n_pairs, alpha, FDR, correct_reliable_only,
                n_obs_min=float(n_obs_min),
            )
        if have_cor:
            C = np.asarray(cor_mat, dtype=np.float64)[:p, :p]
        elif mesh is not None:
            ploc = p_int // ndev
            fn = _mesh_fz_fn(mesh, ploc)
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
        if data_dev is not None and mesh is None:
            data_j = data_dev
        else:
            data_j = put_continuous(data, mesh)
        stats = np.empty(n_pairs)
        n_obs = np.empty(n_pairs, dtype=np.int64)
        use_pallas = (jax.default_backend() == "tpu" or FORCE_PALLAS)
        device_extract = (use_pallas or mesh is not None) and not return_result
        slab = _y_slabs(p_int, tile_sz, triangle=True)
        if device_extract:
            return _extract_scan(
                "fznz", (data_j,), mesh, use_pallas, p_int, tile_sz, slab,
                p, n_pairs, alpha, FDR, correct_reliable_only,
                n_obs_min=float(n_obs_min),
            )
        for start in range(0, p_int, tile_sz):
            t = min(tile_sz, p_int - start)
            s = start if t == tile_sz else max(0, p_int - tile_sz)
            y_start, y_len = slab(s)
            if mesh is not None:
                ylen_loc = y_len // ndev
                fn = _mesh_fznz_block_fn(mesh, use_pallas, tile_sz, ylen_loc)
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
