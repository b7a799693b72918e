"""Experimental branch-and-bound conditioning-set enumeration.

Faithful re-implementation of the reference's BNBIterator (reference:
src/types.jl:271-385, activated by the experimental kwarg ``bnb=true``,
src/hiton.jl:87-98): best-first expansion of conditioning sets driven by
per-level max-priority queues of p-values, with optional branch cutting
(a subset element only spawns deeper branches if its p-value exceeds the
parent's, or the level queue is still near-empty).

Tests are requested one at a time (the enumeration order is inherently
sequential); the scheduler still batches across concurrently searching
targets.  Note: for fz_nz the reference's bnb path reads the pre-allocated
(all-zero) correlation matrix because cor_subset! only runs in the non-bnb
test_subsets (src/tests.jl:303-307) -- effectively broken upstream; here the
per-pair masked correlation is computed first, which preserves the documented
BNB semantics while producing meaningful statistics.
"""

from __future__ import annotations

import heapq
import itertools
from typing import List, Sequence, Tuple

import numpy as np

from ..types import TestResult
from .hiton import issig


class _MaxQueue:
    """Max-priority queue over (Z, pval) with dict-like key semantics."""

    def __init__(self):
        self._heap: List[Tuple[float, int, int]] = []
        self._entries = {}
        self._counter = itertools.count()

    def __len__(self):
        return len(self._entries)

    def __setitem__(self, Z: int, pval: float):
        self._entries[Z] = pval
        heapq.heappush(self._heap, (-pval, next(self._counter), Z))

    def keys(self):
        return list(self._entries.keys())

    def pop_max(self) -> Tuple[int, float]:
        while self._heap:
            negp, _, Z = heapq.heappop(self._heap)
            if Z in self._entries and self._entries[Z] == -negp:
                del self._entries[Z]
                return Z, -negp
        raise KeyError("empty queue")


def bnb_test_subsets_gen(T: int, cand: int, Z_total: Sequence[int],
                         cfg, engine, cut_branches: bool = True):
    """Generator evaluating subsets in BNB order; yields single-test device
    requests and returns (test_result, Zs, num_tests) compatible with
    test_subsets (reference: src/tests.jl:349-367)."""
    if not Z_total:
        return TestResult(float("nan"), float("nan"), -1, True), (-1,), -1, float("nan")

    # pre-compute correlation context for continuous modes
    mcor = None
    n_obs = None
    positions = None
    if not cfg.discrete:
        if cfg.nz:
            var_list = [T, cand] + list(Z_total)
            mcor, n_obs = yield ("mcor", (T, cand), var_list)
            positions = {v: i for i, v in enumerate(var_list)}
        else:
            mcor = engine.cor_mat
            n_obs = engine.n
        if cfg.n_obs_min > n_obs:
            return TestResult(0.0, 1.0, 0, False), (), 0, float("nan")

    def eval_one(Zs):
        k = len(Zs)
        Zarr = np.zeros((1, cfg.max_k), np.int32)
        Zarr[0, :k] = Zs
        if cfg.discrete:
            stat, pval, df, suff = yield (
                "mi", T, cand, Zarr, np.array([k], np.int32))
            return TestResult(float(stat[0]), float(pval[0]), int(df[0]),
                              bool(suff[0]))
        if not cfg.nz and getattr(engine, "cor_device", False):
            # fz against the device-resident correlation matrix
            stat, pval, df, suff = yield (
                "fz", T, cand, Zarr, np.array([k], np.int32))
            return TestResult(float(stat[0]), float(pval[0]), int(df[0]),
                              bool(suff[0]))
        if positions is None:
            pos_X, pos_Y = np.array([T]), np.array([cand])
            pos_Z = Zarr.astype(np.int64)
        else:
            pos_X = np.array([positions[T]])
            pos_Y = np.array([positions[cand]])
            pos_Z = np.array([[positions.get(int(v), 0) for v in Zarr[0]]])
        return engine.fz_tests_from_cor(mcor, pos_X, pos_Y, pos_Z,
                                        np.array([k]), n_obs)[0]

    max_k = min(cfg.max_k, len(Z_total))
    num_tests = 0
    ret = TestResult(1.0, 0.0, 0, True)
    ret_Zs: Tuple[int, ...] = ()

    qs = [_MaxQueue() for _ in range(max_k)]
    i = 1
    Zs: Tuple[int, ...] = ()
    ref_pval = -1.0
    Z_pool = list(Z_total)
    pool_idx = 0

    while True:
        if pool_idx < len(Z_pool):
            Z = Z_pool[pool_idx]
            pool_idx += 1
        else:
            # backtrack to a queue with >= 2 entries (reference:
            # src/types.jl:362-368)
            while len(qs[i - 1]) < 2:
                i -= 1
                if i == 0:
                    return ret, ret_Zs, num_tests, float("nan")
            if len(Zs) >= i:
                Zs = Zs[: i - 1]
            Z_ext, pval = qs[i - 1].pop_max()
            Zs = Zs + (Z_ext,)
            ref_pval = pval if cut_branches else -1.0
            i += 1
            Z_pool = qs[i - 2].keys()
            pool_idx = 0
            if not Z_pool:
                continue
            Z = Z_pool[pool_idx]
            pool_idx += 1

        Zs_test = Zs + (Z,)
        res = yield from eval_one(Zs_test)
        num_tests += 1
        # queue admission (reference: src/types.jl:309-320)
        if i < max_k and res.suff_power and (
            not cut_branches or res.pval > ref_pval or len(qs[i - 1]) < 2
        ):
            qs[i - 1][Z] = res.pval

        if (not issig(res, cfg.alpha)) or (0 < cfg.max_tests <= num_tests):
            return res, Zs_test, num_tests, float("nan")
        elif res.pval > ret.pval:
            ret = res
            ret_Zs = Zs_test
