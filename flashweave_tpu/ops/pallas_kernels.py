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

        a = a_ref[:]                  # (tn, tx)
        b = b_ref[:]                  # (tn, ty)
        # one-hot indicators are exactly representable in bf16: counts
        # accumulate in f32 via preferred_element_type, so the tables are
        # exact while the MXU runs at bf16 rate
        for lv_a in range(L):
            ea = (a == lv_a).astype(jnp.bfloat16)
            for lv_b in range(L):
                eb = (b == lv_b).astype(jnp.bfloat16)
                out_ref[lv_a * L + lv_b, :, :] += jax.lax.dot_general(
                    ea, eb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    return kernel


@partial(jax.jit, static_argnames=("L", "tx", "ty", "tn"))
def mi_pair_ctabs(a, b=None, L=3, tx=256, ty=256, tn=512):
    """Contingency planes of an X-set against a Y-set: returns
    (L*L, pa, pb) float32 where plane a*L+b holds #rows with X==a and Y==b.
    Inputs are padded internally; pad cells hold value -1 and match no level."""
    if b is None:
        b = a
    pa0, pb0 = a.shape[1], b.shape[1]
    a = _pad_cols(_pad_rows(a, tn, -1.0), tx, -1.0)
    b = _pad_cols(_pad_rows(b, tn, -1.0), ty, -1.0)
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
        out_shape=jax.ShapeDtypeStruct((L * L, pa, pb), jnp.float32),
        interpret=_interpret(),
    )(a, b)
    return out[:, :pa0, :pb0]


@partial(jax.jit, static_argnames=("tile", "L"))
def pair_ctab_block_pallas(data, start, tile, L):
    """Drop-in for ops.contingency.pair_ctab_block on TPU: (tile, p, L, L)
    tables of an X-block against all variables via the fused kernel."""
    n, p = data.shape
    block = jax.lax.dynamic_slice(data, (0, start), (n, tile))
    ct = mi_pair_ctabs(block, data, L=L)
    return jnp.transpose(ct.reshape(L, L, tile, p), (2, 3, 0, 1))


@partial(jax.jit, static_argnames=("tile",))
def fz_nz_block_pallas(data, start, tile):
    """Drop-in for ops.univariate.fz_nz_block on TPU."""
    n, p = data.shape
    block = jax.lax.dynamic_slice(data, (0, start), (n, tile))
    return fz_nz_stats_pallas(block, data)
