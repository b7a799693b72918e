"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from flashweave_tpu.parallel.mesh import get_mesh
from flashweave_tpu.ops import univariate as uv
from flashweave_tpu.ops.condtests import CondTestEngine
from flashweave_tpu.learning.lgl import LGL
from flashweave_tpu.utils.misc import get_levels, get_max_vals
from flashweave_tpu.utils.testing import compare_graph_results

from conftest import requires_reference_data

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def synth():
    rng = np.random.default_rng(42)
    n, p = 200, 36
    base = rng.integers(0, 3, (n, p)).astype(np.float64)
    # inject correlated pairs so networks are nonempty
    base[:, 1] = base[:, 0]
    base[:, 3] = np.where(rng.random(n) < 0.8, base[:, 2], base[:, 3])
    return base


@needs_mesh
def test_univar_mesh_matches_single(synth):
    mesh = get_mesh(8)
    lv, mx = get_levels(synth.astype(int)), get_max_vals(synth.astype(int))
    _, r1 = uv.pw_univar_neighbors(synth, "mi_nz", levels=lv, max_vals=mx,
                                   FDR=False, return_result=True)
    _, r2 = uv.pw_univar_neighbors(synth, "mi_nz", levels=lv, max_vals=mx,
                                   FDR=False, return_result=True, mesh=mesh)
    np.testing.assert_allclose(
        np.nan_to_num(r1.stats, nan=-1), np.nan_to_num(r2.stats, nan=-1),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.nan_to_num(r1.pvals, nan=-1), np.nan_to_num(r2.pvals, nan=-1),
        rtol=1e-10,
    )


@needs_mesh
def test_cond_mesh_matches_single(synth):
    mesh = get_mesh(8)
    lv, mx = get_levels(synth.astype(int)), get_max_vals(synth.astype(int))
    rng = np.random.default_rng(0)
    B = 100
    p = synth.shape[1]
    X = rng.integers(0, p, B).astype(np.int32)
    Y = (X + 1 + rng.integers(0, p - 2, B)).astype(np.int32) % p
    Zs = rng.integers(0, p, (B, 3)).astype(np.int32)
    k = rng.integers(0, 4, B).astype(np.int32)
    e1 = CondTestEngine(synth, "mi_nz", 3, levels=lv, max_vals=mx)
    e2 = CondTestEngine(synth, "mi_nz", 3, levels=lv, max_vals=mx, mesh=mesh)
    r1 = e1.mi_tests(X, Y, Zs, k)
    r2 = e2.mi_tests(X, Y, Zs, k)
    for a, b in zip(r1, r2):
        assert np.isclose(a.stat, b.stat, rtol=1e-12)
        assert a.df == b.df and a.suff_power == b.suff_power


@needs_mesh
@requires_reference_data
def test_lgl_multi_il_mesh_matches_unmeshed(hmp_small):
    from flashweave_tpu import preprocessing as pp

    d = pp.preprocess_data_default(hmp_small, "fz_nz", verbose=False, prec=64).data
    mesh = get_mesh(8)
    g1 = LGL(d, test_name="fz_nz", max_k=3, parallel="multi_il",
             time_limit=0.0, convergence_threshold=0.0, verbose=False).graph
    g2 = LGL(d, test_name="fz_nz", max_k=3, parallel="multi_il",
             time_limit=0.0, convergence_threshold=0.0, verbose=False,
             mesh=mesh).graph
    assert compare_graph_results(g1, g2, approx=True, approx_nbr_diff=0,
                                 approx_weight_meandiff=0.01, verbose=True)


@needs_mesh
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
