"""Pallas kernel correctness vs the XLA reference formulation (interpret
mode on CPU; the same kernels compile natively on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flashweave_tpu.ops import pallas_kernels as pk
from flashweave_tpu.ops.univariate import fz_nz_block
from flashweave_tpu.ops.contingency import pair_ctab_block


@pytest.fixture(scope="module")
def synth():
    rng = np.random.default_rng(7)
    n, p = 500, 250  # deliberately NOT tile multiples (padding paths)
    data = rng.integers(0, 3, (n, p)).astype(np.float32)
    data[rng.random((n, p)) < 0.5] = 0.0
    return data


def test_fz_nz_moments_match_xla(synth):
    cont = np.where(synth > 0, np.log1p(synth), 0.0).astype(np.float32)
    r_p, n_p = pk.fz_nz_stats_pallas(jnp.asarray(cont), tx=128, ty=128, tn=256)
    r_x, n_x = fz_nz_block(jnp.asarray(cont), 0, cont.shape[1])
    np.testing.assert_allclose(np.asarray(n_p), np.asarray(n_x), atol=0)
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(r_p), nan=-9),
        np.nan_to_num(np.asarray(r_x, dtype=np.float32), nan=-9),
        atol=2e-4,
    )


def test_mi_ctabs_match_xla(synth):
    L = 3
    p = synth.shape[1]
    ct_p = pk.mi_pair_ctabs(jnp.asarray(synth), L=L, tx=128, ty=128, tn=256)
    ct_x = pair_ctab_block(jnp.asarray(synth), 0, p, L)
    got = np.transpose(np.asarray(ct_p).reshape(L, L, p, p), (2, 3, 0, 1))
    np.testing.assert_array_equal(got, np.asarray(ct_x, dtype=np.float32))


@pytest.mark.parametrize("dbuf", [True, False])
@pytest.mark.parametrize("nz", [True, False])
@pytest.mark.parametrize("block", [(0, 250, 0, 250), (25, 125, 100, 150)])
def test_fused_mi_stats_match_xla(synth, nz, block, dbuf):
    """The fully fused univariate kernel (4-dot joint counts + marginal
    reconstruction + in-VMEM G-test epilogue) must reproduce the XLA
    ctab+stats pipeline bit-for-bit on counts/df/suff and to f32 tolerance
    on the statistic."""
    from flashweave_tpu.ops.univariate import mi_block_stats

    L = 3
    data = synth.astype(np.float64)
    levels = np.array(
        [len(np.unique(data[:, j])) for j in range(data.shape[1])], np.int32
    )
    maxv = data.max(axis=0).astype(np.int32)
    dj = jnp.asarray(data)
    marg = pk.level_marginals(dj, L)
    np.testing.assert_array_equal(
        np.asarray(marg), np.stack([(data == lv).sum(0) for lv in range(L)])
    )
    s, tile, ys, ylen = block
    st, df, no, sp = pk.mi_univar_stats_pallas(
        dj.T, dj, marg, levels, maxv, s, tile, L, ys, ylen, nz, 5.0, 20.0,
        tx=128, ty=128, tn=256, dbuf=dbuf,
    )
    ctab = pair_ctab_block(dj, s, tile, L, ys, ylen)
    st2, df2, no2, sp2 = mi_block_stats(
        ctab, levels[s:s + tile], levels[ys:ys + ylen],
        maxv[s:s + tile], maxv[ys:ys + ylen], 5.0, 20.0, nz, L,
    )
    np.testing.assert_array_equal(np.asarray(no), np.asarray(no2))
    np.testing.assert_array_equal(np.asarray(df), np.asarray(df2))
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(sp2))
    np.testing.assert_allclose(
        np.asarray(st), np.asarray(st2), atol=2e-6, rtol=2e-5
    )


def test_mi_pval_smalldf_matches_gammaincc():
    from flashweave_tpu.ops import statfuns as sf

    rng = np.random.default_rng(1)
    mi = rng.exponential(0.02, 5000)
    n_obs = rng.integers(10, 9000, 5000)
    df = rng.integers(0, 9, 5000)
    ref = sf.mi_pval(mi, df, n_obs, xp=np)
    got = np.asarray(sf.mi_pval_smalldf(
        jnp.asarray(mi), jnp.asarray(df), jnp.asarray(n_obs), 8, xp=jnp
    ))
    np.testing.assert_allclose(got, ref, rtol=5e-12, atol=1e-300)


def test_block_wrappers_match_xla(synth):
    L = 3
    p = synth.shape[1]
    tile = 125
    ct_p = pk.pair_ctab_block_pallas(jnp.asarray(synth), 25, tile, L)
    ct_x = pair_ctab_block(jnp.asarray(synth), 25, tile, L)
    np.testing.assert_array_equal(np.asarray(ct_p), np.asarray(ct_x, np.float32))

    cont = np.where(synth > 0, np.log1p(synth), 0.0).astype(np.float32)
    r_p, n_p = pk.fz_nz_block_pallas(jnp.asarray(cont), 25, tile)
    r_x, n_x = fz_nz_block(jnp.asarray(cont), 25, tile)
    np.testing.assert_allclose(np.asarray(n_p), np.asarray(n_x), atol=0)
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(r_p), nan=-9),
        np.nan_to_num(np.asarray(r_x, np.float32), nan=-9),
        atol=2e-4,
    )


@pytest.mark.parametrize("nz", [True, False])
def test_planes_kernel_matches_fused(synth, nz):
    """The packed indicator-plane kernel (pure-MXU variant) must agree with
    the fused kernel on every X-tile: exact counts/df/suff, f32-tolerance
    stats."""
    L = 3
    n, p = synth.shape
    levels = np.array(
        [len(np.unique(synth[:, j])) for j in range(p)], np.int32
    )
    maxv = synth.max(axis=0).astype(np.int32)
    dj8 = jnp.asarray(synth).astype(jnp.int8)
    tx, ty, tn = 128, 128, 256
    xpl = pk.x_indicator_planes(dj8.T, L, tx, tn)
    ypl = pk.y_indicator_planes(dj8, L, ty, tn)
    p_padX = xpl.shape[0] * tx
    p_padY = ypl.shape[1] // ((L - 1) * ty) * ty

    def padc(a, w, fill):
        out = np.full((a.shape[0], w), fill, a.dtype)
        out[:, : a.shape[1]] = a
        return out

    marg = np.asarray(pk.level_marginals(dj8, L))
    margX = jnp.asarray(padc(marg, p_padX, 0))
    margY = jnp.asarray(padc(marg, p_padY, 0))
    lX = jnp.asarray(padc(levels[None], p_padX, 1))
    lY = jnp.asarray(padc(levels[None], p_padY, 1))
    mX = jnp.asarray(padc(maxv[None], p_padX, 0))
    mY = jnp.asarray(padc(maxv[None], p_padY, 0))
    dT_pad = jnp.asarray(padc(synth.T.astype(np.int8).T, p_padY, -1).T)
    d_pad = jnp.asarray(padc(synth.astype(np.int8), p_padY, -1))
    for bi in range(p_padX // tx):
        st, df, no, sp = pk.mi_univar_stats_planes(
            xpl, ypl, margX, margY, lX, lY, mX, mY, bi, L, 0, p_padY,
            nz, 5.0, 20.0, n, tx=tx, ty=ty, tn=tn,
        )
        st2, df2, no2, sp2 = pk.mi_univar_stats_pallas(
            dT_pad, d_pad, margY, lY[0], mY[0],
            bi * tx, tx, L, 0, p_padY, nz, 5.0, 20.0, tx=128, ty=128, tn=256,
        )
        np.testing.assert_array_equal(np.asarray(no), np.asarray(no2))
        np.testing.assert_array_equal(np.asarray(df), np.asarray(df2))
        np.testing.assert_array_equal(np.asarray(sp), np.asarray(sp2))
        np.testing.assert_allclose(
            np.asarray(st), np.asarray(st2), atol=2e-6, rtol=2e-5
        )
