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
