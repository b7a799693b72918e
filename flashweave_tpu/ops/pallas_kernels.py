"""Pallas TPU kernels for the hot univariate paths.

The XLA formulation (ops/univariate.py) materializes derived operands in HBM:
the fz_nz pass reads `data` and its nonzero mask through four separate
matmuls, and the mi pass materializes the (n, p, L) one-hot encoding.  On TPU
the univariate pass is HBM-bandwidth bound, so these kernels fuse the
derivations into the matmul pipeline:

- fz_nz_moments: one sweep over (n-chunk, x-tile, y-tile) computes ALL SIX
  moment accumulators (N, Sx, Sy, Sxx, Syy, Sxy) from a single load of each
  data tile -- the masks and squares are formed in VMEM registers.
- mi_pair_ctabs: forms one-hot level indicators in VMEM on the fly and
  accumulates all L^2 contingency planes per tile pair from one load.

Both kernels run in interpret mode off-TPU so the test suite validates them
on the CPU mesh; the univariate driver picks them automatically on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend only exists with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# fz_nz fused masked moments
# ---------------------------------------------------------------------------

def _moments_kernel(a_ref, b_ref, n_ref, sx_ref, sy_ref, sxx_ref, syy_ref,
                    sxy_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        for ref in (n_ref, sx_ref, sy_ref, sxx_ref, syy_ref, sxy_ref):
            ref[:] = jnp.zeros_like(ref)

    a = a_ref[:]                      # (tn, tx) data chunk, zeros structural
    b = b_ref[:]                      # (tn, ty)
    ma = (a != 0).astype(a.dtype)
    mb = (b != 0).astype(b.dtype)
    dot = lambda x, y: jax.lax.dot_general(
        x, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    n_ref[:] += dot(ma, mb)
    sx_ref[:] += dot(a, mb)
    sy_ref[:] += dot(ma, b)
    sxx_ref[:] += dot(a * a, mb)
    syy_ref[:] += dot(ma, b * b)
    sxy_ref[:] += dot(a, b)


def _pad_rows(x, tn, fill):
    n = x.shape[0]
    pad = (-n) % tn
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
    return x


def _pad_cols(x, t, fill):
    p = x.shape[1]
    pad = (-p) % t
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
    return x


@partial(jax.jit, static_argnames=("tx", "ty", "tn"))
def fz_nz_moments(a, b, tx=256, ty=256, tn=512):
    """Masked moments of an X-set against a Y-set: returns
    (N, Sx, Sy, Sxx, Syy, Sxy), each (pa, pb), over rows where both are
    nonzero.  Inputs are padded internally (pad rows are all-zero, hence
    masked out)."""
    pa0, pb0 = a.shape[1], b.shape[1]
    a = _pad_cols(_pad_rows(a, tn, 0.0), tx, 0.0)
    b = _pad_cols(_pad_rows(b, tn, 0.0), ty, 0.0)
    n, pa = a.shape
    pb = b.shape[1]
    grid = (pa // tx, pb // ty, n // tn)
    out_shape = [jax.ShapeDtypeStruct((pa, pb), jnp.float32)] * 6
    in_spec_a = pl.BlockSpec((tn, tx), lambda i, j, k: (k, i))
    in_spec_b = pl.BlockSpec((tn, ty), lambda i, j, k: (k, j))
    out_spec = pl.BlockSpec((tx, ty), lambda i, j, k: (i, j))
    outs = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[in_spec_a, in_spec_b],
        out_specs=[out_spec] * 6,
        out_shape=out_shape,
        interpret=_interpret(),
    )(a, b)
    return tuple(o[:pa0, :pb0] for o in outs)


@partial(jax.jit, static_argnames=("tx", "ty", "tn"))
def fz_nz_stats_pallas(a, b=None, tx=256, ty=256, tn=512):
    """Masked pairwise correlations + joint counts via the fused moment
    kernel; semantics identical to ops.univariate.fz_nz_block."""
    if b is None:
        b = a
    N, Sx, Sy, Sxx, Syy, Sxy = fz_nz_moments(a, b, tx=tx, ty=ty, tn=tn)
    safe_n = jnp.where(N > 0, N, 1.0)
    cov = Sxy - Sx * Sy / safe_n
    varx = Sxx - Sx * Sx / safe_n
    vary = Syy - Sy * Sy / safe_n
    r = cov / jnp.sqrt(varx * vary)
    r = jnp.where(r > 1.0, 1.0, r)
    r = jnp.where(r < -1.0, -1.0, r)
    r = jnp.where(N > 0, r, 0.0)
    return r, N


# ---------------------------------------------------------------------------
# mi / mi_nz fused one-hot contingency tables
# ---------------------------------------------------------------------------

def _make_ctab_kernel(L):
    def kernel(a_ref, b_ref, out_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # operands arrive as int8 (4x less HBM traffic than f32); the vector
        # units can't compare int8 lanes directly, so upcast in VMEM --
        # indicator formation is f32 on the VPU, the dots are int8 on the
        # MXU (2x bf16 rate) with exact int32 count accumulation
        a = a_ref[:].astype(jnp.float32)  # (tn, tx)
        b = b_ref[:].astype(jnp.float32)  # (tn, ty)
        ebs = [(b == lv).astype(jnp.int8) for lv in range(L)]
        for lv_a in range(L):
            ea = (a == lv_a).astype(jnp.int8)
            for lv_b in range(L):
                out_ref[lv_a * L + lv_b, :, :] += jax.lax.dot_general(
                    ea, ebs[lv_b], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

    return kernel


def _default_tn(n: int) -> int:
    # deep row chunks amortize output-block revisits; cap padding for small n
    return min(2048, -(-n // 256) * 256)


@partial(jax.jit, static_argnames=("L", "tx", "ty", "tn"))
def mi_pair_ctabs(a, b=None, L=3, tx=256, ty=256, tn=None):
    """Contingency planes of an X-set against a Y-set: returns
    (L*L, pa, pb) int32 where plane a*L+b holds #rows with X==a and Y==b.
    Inputs are padded internally; pad cells hold value -1 and match no level.
    Levels must fit int8 (L < 128; discrete data is 2-3 levels)."""
    if b is None:
        b = a
    if tn is None:
        tn = _default_tn(a.shape[0])
    pa0, pb0 = a.shape[1], b.shape[1]
    a = _pad_cols(_pad_rows(a.astype(jnp.int8), tn, -1), tx, -1)
    b = _pad_cols(_pad_rows(b.astype(jnp.int8), tn, -1), ty, -1)
    n, pa = a.shape
    pb = b.shape[1]
    grid = (pa // tx, pb // ty, n // tn)
    out = pl.pallas_call(
        _make_ctab_kernel(L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, tx), lambda i, j, k: (k, i)),
            pl.BlockSpec((tn, ty), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((L * L, tx, ty), lambda i, j, k: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((L * L, pa, pb), jnp.int32),
        interpret=_interpret(),
    )(a, b)
    return out[:, :pa0, :pb0]


@partial(jax.jit, static_argnames=("tile", "L", "y_len"))
def pair_ctab_planes_pallas(data, start, tile, L, y_start=0, y_len=None):
    """(L*L, tile, y_len) int32 contingency planes of an X-block against the
    Y-slab [y_start, y_start+y_len) via the fused kernel.  Plane layout lets
    the stats jit fuse the transpose into its elementwise pass."""
    n, p = data.shape
    if y_len is None:
        y_len = p
    block = jax.lax.dynamic_slice(data, (0, start), (n, tile))
    yslab = jax.lax.dynamic_slice(data, (0, y_start), (n, y_len))
    return mi_pair_ctabs(block, yslab, L=L)


def _make_mi_stats_kernel_dbuf(L, nz, hps, n_obs_min, n_rows):
    """Double-buffered variant of :func:`_make_mi_stats_kernel`: consecutive
    output blocks alternate between two VMEM accumulator banks, removing
    the read-after-write dependency between block t's epilogue and block
    t+1's first dot so Mosaic may overlap the VPU epilogue with the next
    block's MXU work (round-5 attempt at the 84% -> 88%-of-dot-only gap).

    Measured on v5e (chained timer, n=p=8192, interleaved warm repeats):
    14.19-14.30 ms/sweep vs the single-bank kernel's 14.30-14.40 -- a
    consistent but marginal ~0.7% win (2.35e9 vs 2.34e9 tests/s), exact to
    the bit.  The epilogue was already mostly hidden by Mosaic's grid
    pipelining; the residual ~16% gap to dot-only is revisit/bubble
    overhead, not epilogue serialization (see PERF.md round-5 ablation).
    Default-on since it never loses."""
    K = L - 1

    def kernel(at_ref, b_ref, mx_ref, my_ref, lx_ref, ly_ref, mvx_ref,
               mvy_ref, stat_ref, df_ref, nobs_ref, suff_ref, acc_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        k = pl.program_id(2)
        buf = (i * pl.num_programs(1) + j) % 2

        @pl.when(k == 0)
        def _():
            acc_ref[buf] = jnp.zeros_like(acc_ref[buf])

        at = at_ref[:].astype(jnp.float32)  # (tx, tn)
        b = b_ref[:].astype(jnp.float32)    # (tn, ty)
        ebs = [(b == lv).astype(jnp.int8) for lv in range(1, L)]
        for ia in range(K):
            ea = (at == ia + 1).astype(jnp.int8)
            for ib in range(K):
                acc_ref[buf, ia * K + ib, :, :] += jax.lax.dot_general(
                    ea, ebs[ib], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            _mi_epilogue(
                lambda ia, ib: acc_ref[buf, (ia - 1) * K + (ib - 1), :, :],
                mx_ref, my_ref, lx_ref, ly_ref, mvx_ref, mvy_ref,
                stat_ref, df_ref, nobs_ref, suff_ref,
                L, nz, hps, n_obs_min, n_rows,
            )

    return kernel


def _make_mi_stats_kernel(L, nz, hps, n_obs_min, n_rows):
    """Fused univariate kernel: int8 one-hot contingency matmuls accumulate
    in a VMEM scratch; at the final row-chunk the full G-test statistic
    pipeline (nz table slicing, signed MI, df adjustment, power checks --
    semantics of ops.univariate.mi_block_stats / ops.statfuns.mi_stats,
    reference src/statfuns.jl:163-323 + src/tests.jl:28-103) runs in-register
    and only the four (tx, ty) result planes are written to HBM.  The count
    planes never leave VMEM.

    Two MXU savings vs the naive L^2-matmul formulation:
    - only the (L-1)^2 joint counts for levels >= 1 are computed with dots;
      the level-0 row/column/corner counts follow exactly from the
      per-variable level marginals (mx/my inputs) and the row total, since
      contingency tables have fixed margins.
    - the X operand arrives pre-transposed (tx, tn) so every dot is a native
      (M, K) @ (K, N) MXU contraction with no in-VMEM transpose.
    """
    K = L - 1

    def kernel(at_ref, b_ref, mx_ref, my_ref, lx_ref, ly_ref, mvx_ref,
               mvy_ref, stat_ref, df_ref, nobs_ref, suff_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        at = at_ref[:].astype(jnp.float32)  # (tx, tn)
        b = b_ref[:].astype(jnp.float32)    # (tn, ty)
        ebs = [(b == lv).astype(jnp.int8) for lv in range(1, L)]
        for ia in range(K):
            ea = (at == ia + 1).astype(jnp.int8)
            for ib in range(K):
                acc_ref[ia * K + ib, :, :] += jax.lax.dot_general(
                    ea, ebs[ib], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            _mi_epilogue(
                lambda ia, ib: acc_ref[(ia - 1) * K + (ib - 1), :, :],
                mx_ref, my_ref, lx_ref, ly_ref, mvx_ref, mvy_ref,
                stat_ref, df_ref, nobs_ref, suff_ref,
                L, nz, hps, n_obs_min, n_rows,
            )

    return kernel


def _mi_epilogue(joint, mx_ref, my_ref, lx_ref, ly_ref, mvx_ref, mvy_ref,
                 stat_ref, df_ref, nobs_ref, suff_ref,
                 L, nz, hps, n_obs_min, n_rows):
    """Shared in-VMEM G-test epilogue: full-table reconstruction from the
    (L-1)^2 joint counts + fixed margins, nz slicing, signed MI, df
    adjustment, power checks (semantics of ops.univariate.mi_block_stats,
    reference src/statfuns.jl:163-323 + src/tests.jl:28-103).

    ``joint(ia, ib)`` returns the int32 (tx, ty) count plane of level pair
    (ia, ib) for 1 <= ia, ib < L.
    """
    # nz semantics are a 3-state static flag: 0 plain, 1 per-variable nz
    # offsets, 2 nz-UNIFORM (every variable 3-level, so ox = oy = 1 are
    # compile-time constants): the level-0 planes are statically sliced
    # away and all masks fold, cutting the epilogue's VPU passes ~3x.
    uniform = (nz == 2)
    # Boolean logic is expressed as float 0/1 masks with arithmetic
    # and/or (Mosaic can't truncate i8 vectors to i1, so vector `&`
    # chains fail to compile); every comparison stays a single f32
    # cmp + cast, which lowers cleanly to the VPU.
    f32 = jnp.float32
    lx = lx_ref[:].reshape(-1, 1).astype(f32)   # (tx, 1)
    ly = ly_ref[:].reshape(1, -1).astype(f32)   # (1, ty)
    mx = [mx_ref[l, :].reshape(-1, 1) for l in range(L)]  # (tx, 1)
    my = [my_ref[l, :].reshape(1, -1) for l in range(L)]  # (1, ty)
    lo = 1 if uniform else 0
    cnt = {}
    for ia in range(1, L):
        for ib in range(1, L):
            cnt[(ia, ib)] = joint(ia, ib)
    if not uniform:
        # reconstruct the full L x L table from the (L-1)^2 joint counts
        # and the fixed margins, exactly, in int32
        for ia in range(1, L):
            cnt[(ia, 0)] = mx[ia] - sum(
                cnt[(ia, ib)] for ib in range(1, L)
            )
        for ib in range(1, L):
            cnt[(0, ib)] = my[ib] - sum(
                cnt[(ia, ib)] for ia in range(1, L)
            )
        cnt[(0, 0)] = (
            n_rows - sum(mx[1:]) - sum(my[1:])
            + sum(cnt[(ia, ib)] for ia in range(1, L)
                  for ib in range(1, L))
        )
    if uniform:
        def subplane(av, bv):
            return cnt[(av, bv)].astype(f32)

        def diagf(av, bv):
            return 1.0 if av == bv else 0.0
    else:
        if nz:
            ox = (mvx_ref[:].reshape(-1, 1) > 1).astype(f32)
            oy = (mvy_ref[:].reshape(1, -1) > 1).astype(f32)
        else:
            ox = jnp.zeros_like(lx)
            oy = jnp.zeros_like(ly)

        xmask = [(av >= ox).astype(f32) for av in range(L)]
        ymask = [(bv >= oy).astype(f32) for bv in range(L)]
        _spc = {}

        def subplane(av, bv):
            if (av, bv) not in _spc:
                _spc[(av, bv)] = (cnt[(av, bv)].astype(f32)
                                  * xmask[av] * ymask[bv])
            return _spc[(av, bv)]

        def diagf(av, bv):
            return ((av - ox) == (bv - oy)).astype(f32)

    row = {av: sum(subplane(av, bv) for bv in range(lo, L))
           for av in range(lo, L)}
    col = {bv: sum(subplane(av, bv) for av in range(lo, L))
           for bv in range(lo, L)}
    n_obs = sum(row.values())
    # MI terms with diag/offdiag split (sign semantics of
    # reference src/statfuns.jl:209-254)
    mi_pos = jnp.zeros_like(n_obs)
    mi_neg = jnp.zeros_like(n_obs)
    n_pos = jnp.zeros_like(n_obs)
    for av in range(lo, L):
        for bv in range(lo, L):
            s_ab = subplane(av, bv)
            # s_ab > 0 implies row/col marginals > 0
            validf = (s_ab > 0).astype(f32)
            inv = 1.0 - validf
            ratio = (n_obs * s_ab + inv) / (row[av] * col[bv] + inv)
            term = jnp.log(ratio) * s_ab
            d = diagf(av, bv)
            if isinstance(d, float):
                if d:
                    mi_pos += term
                    n_pos += s_ab
                else:
                    mi_neg += term
            else:
                mi_pos += d * term
                mi_neg += (1.0 - d) * term
                n_pos += d * s_ab
    n_neg = n_obs - n_pos
    safe_n = jnp.maximum(n_obs, 1.0)
    mi = (mi_pos + mi_neg) / safe_n
    flipf = (mi_neg * n_neg > mi_pos * n_pos).astype(f32)
    mi = mi * (1.0 - 2.0 * flipf)
    # adjusted df (reference src/statfuns.jl:281-305)
    alx = sum((r != 0).astype(f32) for r in row.values())
    aly = sum((c != 0).astype(f32) for c in col.values())
    df = (jnp.maximum(alx, 1.0) - 1.0) * (jnp.maximum(aly, 1.0) - 1.0)
    # pre-check on the X-trimmed view (reference src/tests.jl:9-20):
    # the X-trimmed view total follows from the fixed margins alone
    if uniform:
        n_view = sum(mx[av].astype(f32) for av in range(1, L))
    else:
        n_view = sum(
            cnt[(av, bv)].astype(f32) * xmask[av]
            for av in range(L) for bv in range(L)
        )
    plx = lx - 1.0 - (lx > 1.0).astype(f32)
    ply = ly - 1.0 - (ly > 1.0).astype(f32)
    cells_pre = plx * ply
    # ok iff cells <= 0 OR n/cells > hps (Julia n/0 == Inf > hps)
    pre_ratio_ok = jnp.maximum(
        (n_view > hps * cells_pre).astype(f32),
        (cells_pre <= 0).astype(f32),
    )
    pre_ok = (n_view >= n_obs_min).astype(f32) * pre_ratio_ok
    if uniform:
        cells_post = float((L - 1) * (L - 1))
        post_ok = ((n_obs >= n_obs_min).astype(f32)
                   * (n_obs > hps * cells_post).astype(f32))
    else:
        if nz:
            lx_eff = L - ox
            ly_eff = L - oy
        else:
            lx_eff = lx * jnp.ones_like(oy)
            ly_eff = ly * jnp.ones_like(ox)
        cells_post = lx_eff * ly_eff
        post_ratio_ok = jnp.maximum(
            (n_obs > hps * cells_post).astype(f32),
            (cells_post <= 0).astype(f32),
        )
        post_ok = (n_obs >= n_obs_min).astype(f32) * post_ratio_ok
    sufff = pre_ok * post_ok * (lx >= 2.0).astype(f32)
    stat_ref[:] = mi * sufff
    df_ref[:] = (df * sufff).astype(jnp.int32)
    nobs_ref[:] = n_obs.astype(jnp.int32)
    suff_ref[:] = sufff.astype(jnp.int32)


def _pad_vec(v, t, fill):
    pad = (-v.shape[0]) % t
    if pad:
        v = jnp.pad(v, (0, pad), constant_values=fill)
    return v.reshape(1, -1)


@partial(jax.jit, static_argnames=("L",))
def level_marginals(data, L):
    """(L, p) int32 per-variable level counts (the fixed contingency-table
    margins; one cheap column reduction replaces L*L - (L-1)^2 matmuls)."""
    lv = jnp.arange(L, dtype=jnp.int32).reshape(-1, 1, 1)
    return (data[None, :, :].astype(jnp.int32) == lv).sum(axis=1).astype(
        jnp.int32
    )


@partial(jax.jit,
         static_argnames=("tile", "L", "y_len", "nz", "hps", "n_obs_min",
                          "tx", "ty", "tn", "dbuf"))
def mi_univar_stats_pallas(dataT, data, marg, levels, max_vals, start, tile,
                           L, y_start=0, y_len=None, nz=True, hps=5.0,
                           n_obs_min=0.0, tx=None, ty=128, tn=None,
                           dbuf=True):
    """Fully fused univariate MI stats of an X-block against a Y-slab:
    returns (stat f32, df i32, n_obs i32, suff_power bool), each
    (tile, y_len), without materializing contingency tables in HBM.

    Args:
      dataT: (p, n) transposed data (int8-castable) -- X operand tiles.
      data:  (n, p) data -- Y operand tiles.
      marg:  (L, p) int32 level marginals from :func:`level_marginals`.
    """
    p, n = dataT.shape
    if y_len is None:
        y_len = p
    if tn is None:
        tn = _default_tn(n)
    if tx is None:
        # deep X-tiles amortize the in-VMEM epilogue over more MXU work
        # (512x128 measured 2.07e9 vs 256x128's 1.90e9 on v5e; wider tiles
        # fail to compile on this toolchain)
        tx = max(128, min(512, -(-tile // 128) * 128))
    at = jax.lax.dynamic_slice(dataT, (start, 0), (tile, n)).astype(jnp.int8)
    b = jax.lax.dynamic_slice(data, (0, y_start), (n, y_len)).astype(jnp.int8)
    # pad the sample axis of both operands to the same tn multiple
    at = _pad_cols(at, tn, -1)
    at = jnp.pad(at, ((0, (-tile) % tx), (0, 0)), constant_values=-1)
    b = _pad_cols(_pad_rows(b, tn, -1), ty, -1)
    levels = jnp.asarray(levels, jnp.int32)
    max_vals = jnp.asarray(max_vals, jnp.int32)
    mx = jax.lax.dynamic_slice(marg, (0, start), (L, tile))
    my = jax.lax.dynamic_slice(marg, (0, y_start), (L, y_len))
    mx = jnp.pad(mx, ((0, 0), (0, (-tile) % tx)))
    my = jnp.pad(my, ((0, 0), (0, (-y_len) % ty)))
    lx = _pad_vec(jax.lax.dynamic_slice(levels, (start,), (tile,)), tx, 1)
    ly = _pad_vec(jax.lax.dynamic_slice(levels, (y_start,), (y_len,)), ty, 1)
    mvx = _pad_vec(jax.lax.dynamic_slice(max_vals, (start,), (tile,)), tx, 0)
    mvy = _pad_vec(jax.lax.dynamic_slice(max_vals, (y_start,), (y_len,)), ty, 0)
    pa, nr = at.shape
    pb = b.shape[1]
    grid = (pa // tx, pb // ty, nr // tn)
    Ksq = max(1, (L - 1) * (L - 1))
    if dbuf:
        scratch = [pltpu.VMEM((2, Ksq, tx, ty), jnp.int32)]
        kernel = _make_mi_stats_kernel_dbuf(L, nz, float(hps),
                                            float(n_obs_min), n)
    else:
        scratch = [pltpu.VMEM((Ksq, tx, ty), jnp.int32)]
        kernel = _make_mi_stats_kernel(L, nz, float(hps), float(n_obs_min), n)
    res_spec = pl.BlockSpec((tx, ty), lambda i, j, k: (i, j))
    stat, df, nobs, suff = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tx, tn), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, ty), lambda i, j, k: (k, j)),
            pl.BlockSpec((L, tx), lambda i, j, k: (0, i)),
            pl.BlockSpec((L, ty), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, tx), lambda i, j, k: (0, i)),
            pl.BlockSpec((1, ty), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, tx), lambda i, j, k: (0, i)),
            pl.BlockSpec((1, ty), lambda i, j, k: (0, j)),
        ],
        out_specs=[res_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((pa, pb), jnp.float32),
            jax.ShapeDtypeStruct((pa, pb), jnp.int32),
            jax.ShapeDtypeStruct((pa, pb), jnp.int32),
            jax.ShapeDtypeStruct((pa, pb), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(at, b, mx, my, lx, ly, mvx, mvy)
    return (stat[:tile, :y_len], df[:tile, :y_len], nobs[:tile, :y_len],
            suff[:tile, :y_len].astype(bool))


# ---------------------------------------------------------------------------
# packed indicator-plane univariate kernel (pure-MXU variant)
#
# The fused kernel above forms one-hot indicators on the VPU inside every
# (i, j, k) grid cell, costing ~K*(tx+ty)*tn f32 compares/casts per cell on
# top of the K^2 int8 dots.  This variant precomputes the int8 level
# indicators ONCE per sweep as HBM planes packed in tile layout -- X as
# (p/tx, K*tx, n) and Y as (n, p/ty * K*ty) -- so the kernel body is a single
# (K*tx, tn) @ (tn, K*ty) int8 MXU contraction per grid cell producing all
# K^2 joint-count blocks at once, with zero elementwise work until the
# epilogue.  HBM read traffic grows K-fold.
#
# ABLATION VARIANT, not on the driver path: measured on v5e it ties the fused
# kernel at equal tiles (the fused kernel's VPU work is already hidden behind
# the MXU) -- see PERF.md.  Kept tested for future toolchains where larger
# tiles compile.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("L", "tx", "tn"))
def x_indicator_planes(dataT, L, tx, tn):
    """(p/tx, K*tx, n_pad) int8 packed X indicator planes from (p, n) data.

    Tile i, row ia*tx + t, column r holds 1 iff data[r, i*tx + t] == ia + 1.
    Pad variables/rows (value -1) match no level, so their counts are 0.
    """
    K = L - 1
    d = _pad_cols(dataT.astype(jnp.int8).T, tx, -1).T   # pad variables
    d = _pad_cols(d, tn, -1)                            # pad samples
    p_pad, n_pad = d.shape
    lv = jnp.arange(1, L, dtype=jnp.int8)
    d4 = d.reshape(p_pad // tx, 1, tx, n_pad)
    planes = (d4 == lv[:, None, None]).astype(jnp.int8)  # (PT, K, tx, n)
    return planes.reshape(p_pad // tx, K * tx, n_pad)


@partial(jax.jit, static_argnames=("L", "ty", "tn"))
def y_indicator_planes(data, L, ty, tn):
    """(n_pad, p/ty * K*ty) int8 packed Y indicator planes from (n, p) data.

    Column block j*K*ty + ib*ty + c holds 1 iff data[r, j*ty + c] == ib + 1.
    """
    K = L - 1
    d = _pad_cols(_pad_rows(data.astype(jnp.int8), tn, -1), ty, -1)
    n_pad, p_pad = d.shape
    lv = jnp.arange(1, L, dtype=jnp.int8)
    d4 = d.reshape(n_pad, p_pad // ty, 1, ty)
    planes = (d4 == lv[:, None]).astype(jnp.int8)        # (n, PT, K, ty)
    return planes.reshape(n_pad, (p_pad // ty) * K * ty)


def _make_mi_planes_kernel(L, nz, hps, n_obs_min, n_rows, tx, ty):
    K = L - 1

    def kernel(xt_ref, yp_ref, mx_ref, my_ref, lx_ref, ly_ref, mvx_ref,
               mvy_ref, stat_ref, df_ref, nobs_ref, suff_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # ONE packed int8 MXU contraction = all K^2 joint-count blocks
        acc_ref[:, :] += jax.lax.dot_general(
            xt_ref[:], yp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            _mi_epilogue(
                lambda ia, ib: acc_ref[(ia - 1) * tx:ia * tx,
                                       (ib - 1) * ty:ib * ty],
                mx_ref, my_ref, lx_ref, ly_ref, mvx_ref, mvy_ref,
                stat_ref, df_ref, nobs_ref, suff_ref,
                L, nz, hps, n_obs_min, n_rows,
            )

    return kernel


@partial(jax.jit,
         static_argnames=("L", "y_start", "y_len", "nz", "hps", "n_obs_min",
                          "n_rows", "tx", "ty", "tn"))
def mi_univar_stats_planes(xplanes, yplanes, margX, margY, levelsX, levelsY,
                           maxvX, maxvY, bi, L, y_start, y_len, nz, hps,
                           n_obs_min, n_rows, tx=512, ty=512, tn=2048):
    """Univariate MI stats of X-tile ``bi`` (variables [bi*tx, (bi+1)*tx))
    against the Y-slab [y_start, y_start+y_len) from precomputed packed
    indicator planes.  y_start/y_len must be multiples of ty (they index the
    packed Y layout); bi is traced so one compilation covers all X-tiles.

    Args:
      xplanes: (p/tx, K*tx, n_pad) from :func:`x_indicator_planes`.
      yplanes: (n_pad, p/ty * K*ty) from :func:`y_indicator_planes`.
      margX/margY: (L, p_padX) / (L, p_padY) level marginals padded to the
        respective tile multiples.
      levelsX/maxvX: (1, p_padX) int32 (pad: levels 1, max_vals 0); same for Y.
    Returns (stat f32, df i32, n_obs i32, suff bool), each (tx, y_len).
    """
    K = L - 1
    n_pad = xplanes.shape[2]
    xt = lax.dynamic_slice(
        xplanes, (bi, 0, 0), (1, K * tx, n_pad)
    ).reshape(K * tx, n_pad)
    mx = lax.dynamic_slice(margX, (0, bi * tx), (L, tx))
    lx = lax.dynamic_slice(levelsX, (0, bi * tx), (1, tx))
    mvx = lax.dynamic_slice(maxvX, (0, bi * tx), (1, tx))
    jy0 = y_start // ty
    grid = (y_len // ty, n_pad // tn)
    scratch = [pltpu.VMEM((K * tx, K * ty), jnp.int32)]
    res_spec = pl.BlockSpec((tx, ty), lambda j, k: (0, j))
    stat, df, nobs, suff = pl.pallas_call(
        _make_mi_planes_kernel(L, nz, float(hps), float(n_obs_min), n_rows,
                               tx, ty),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K * tx, tn), lambda j, k: (0, k)),
            pl.BlockSpec((tn, K * ty), lambda j, k: (k, jy0 + j)),
            pl.BlockSpec((L, tx), lambda j, k: (0, 0)),
            pl.BlockSpec((L, ty), lambda j, k: (0, jy0 + j)),
            pl.BlockSpec((1, tx), lambda j, k: (0, 0)),
            pl.BlockSpec((1, ty), lambda j, k: (0, jy0 + j)),
            pl.BlockSpec((1, tx), lambda j, k: (0, 0)),
            pl.BlockSpec((1, ty), lambda j, k: (0, jy0 + j)),
        ],
        out_specs=[res_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((tx, y_len), jnp.float32),
            jax.ShapeDtypeStruct((tx, y_len), jnp.int32),
            jax.ShapeDtypeStruct((tx, y_len), jnp.int32),
            jax.ShapeDtypeStruct((tx, y_len), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(xt, yplanes, mx, margY, lx, levelsY, mvx, maxvY)
    return stat, df, nobs, suff.astype(bool)


@partial(jax.jit, static_argnames=("tile", "L"))
def pair_ctab_block_pallas(data, start, tile, L):
    """Drop-in for ops.contingency.pair_ctab_block on TPU: (tile, p, L, L)
    tables of an X-block against all variables via the fused kernel."""
    n, p = data.shape
    ct = pair_ctab_planes_pallas(data, start, tile, L)
    return jnp.transpose(ct.reshape(L, L, tile, p), (2, 3, 0, 1)).astype(
        data.dtype
    )


@partial(jax.jit, static_argnames=("tile", "y_len"))
def fz_nz_block_pallas(data, start, tile, y_start=0, y_len=None):
    """Drop-in for ops.univariate.fz_nz_block on TPU, with optional Y-slab
    restriction [y_start, y_start+y_len) for triangle sweeps."""
    n, p = data.shape
    if y_len is None:
        y_len = p
    block = jax.lax.dynamic_slice(data, (0, start), (n, tile))
    yslab = jax.lax.dynamic_slice(data, (0, y_start), (n, y_len))
    return fz_nz_stats_pallas(block, yslab)
