"""Semi-interleaved HITON-PC per-variable neighborhood search.

Faithful host-side re-expression of the reference's search control flow
(reference: src/hiton.jl): interleaving phase (univar-p-sorted candidates
admitted one at a time against the growing accepted set), elimination phase
(each accepted variable re-tested against the others), whitelist/blacklist
short-circuits, time-limit checkpointing into resumable HitonStates, and the
fast_elim / no_red_tests heuristics.

TPU-first divergence: the search logic is a Python GENERATOR per target
variable that yields fixed-shape batched test requests; a scheduler
(learning/scheduler.py) advances many targets per round and dispatches their
requests as single device batches (ops/condtests.py).  The per-pair
early-exit subset loop (reference src/tests.jl:281-346) becomes "evaluate a
chunk of subsets in one batch, then scan host-side in enumeration order" --
identical accept/reject decisions and reported statistics, with wasted
subset evaluations traded for MXU throughput.
"""

from __future__ import annotations

import itertools
import math
import warnings
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..types import HitonState, NbrStatDict, RejDict, TestResult

# subsets evaluated per device round for one (target, candidate) pair
SUBSET_CHUNK = 1024

NAN = float("nan")


def issig(res: TestResult, alpha: float) -> bool:
    # reference: src/tests.jl:1-3 (NaN pval compares False)
    return res.pval < alpha and res.suff_power


@dataclass
class HitonConfig:
    test_name: str
    max_k: int = 3
    alpha: float = 0.01
    hps: int = 5
    n_obs_min: int = 0
    max_tests: int = int(10e6)
    fast_elim: bool = True
    no_red_tests: bool = True
    weight_type: str = "cond_stat"
    time_limit: float = 0.0
    track_rejections: bool = False
    debug: int = 0
    # experimental branch-and-bound enumeration (reference: src/hiton.jl:87-98)
    bnb: bool = False
    cut_test_branches: bool = True

    @property
    def discrete(self) -> bool:
        return self.test_name.startswith("mi")

    @property
    def nz(self) -> bool:
        return self.test_name.endswith("_nz")


class SearchControl:
    """Shared convergence signal.  In the reference, global convergence NEVER
    interrupts a running job: it only freezes jobs that checkpoint at their
    per-job time limit and come back to the master for requeueing
    (src/interleaved.jl:119-124 marks only non-'F'/'C' *results* as 'C';
    fresh jobs from the waiting stack always run a full pass).  The flag is
    therefore consulted exclusively at time-limit checkpoints."""

    def __init__(self):
        self.converged = False


class JobClock:
    """Per-job time-limit clock.  The reference restarts the clock on every
    (re)entry into si_HITON_PC (src/hiton.jl:305 sets start_time per call, and
    checkpointed jobs are requeued and re-enter with a fresh clock), so a
    checkpoint that is immediately resumed is equivalent to resetting the
    timer and continuing."""

    def __init__(self, time_limit: float):
        import time as _time

        self._time = _time
        self.time_limit = time_limit
        self.start = _time.time() if time_limit > 0.0 else 0.0

    def expired(self) -> bool:
        from ..utils.misc import stop_reached

        return stop_reached(self.start, self.time_limit)

    def reset(self) -> None:
        if self.time_limit > 0.0:
            self.start = self._time.time()


def _empty_state(phase="F") -> HitonState:
    return HitonState(phase, {}, {}, [], {})


# ---------------------------------------------------------------------------
# subset enumeration + early-exit scan (reference: src/tests.jl:281-346)
# ---------------------------------------------------------------------------

# cached position templates keyed by (len(Z_total), max_k): most candidates
# have small accepted sets, so one cached fancy-index replaces per-candidate
# itertools enumeration (the per-send numpy bookkeeping dominated large runs)
_combo_cache: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}


def _combo_template(a: int, max_k: int) -> Tuple[np.ndarray, np.ndarray]:
    """All subsets of range(a) in the reference's enumeration order -- sizes
    max_k..1 descending, lexicographic within a size (src/tests.jl:311-316).
    Returns (pos (B_total, max_k) int32 zero-padded, kvec (B_total,) int32)."""
    tpl = _combo_cache.get((a, max_k))
    if tpl is None:
        pos_parts, k_parts = [], []
        for k in range(min(max_k, a), 0, -1):
            nc = math.comb(a, k)
            block = np.zeros((nc, max_k), np.int32)
            block[:, :k] = np.fromiter(
                itertools.chain.from_iterable(
                    itertools.combinations(range(a), k)),
                np.int32, count=nc * k,
            ).reshape(nc, k)
            pos_parts.append(block)
            k_parts.append(np.full(nc, k, np.int32))
        tpl = (np.concatenate(pos_parts), np.concatenate(k_parts))
        _combo_cache[(a, max_k)] = tpl
    return tpl


_subset_total_cache: Dict[Tuple[int, int], int] = {}


def _subset_total(a: int, max_k: int) -> int:
    t = _subset_total_cache.get((a, max_k))
    if t is None:
        t = sum(math.comb(a, k) for k in range(1, min(max_k, a) + 1))
        _subset_total_cache[(a, max_k)] = t
    return t


def _materialize_lowest(low_m, low_ref):
    """Resolve the deferred weakest-significant reference into a TestResult.

    Two layouts: the digest fast path stores the p-value directly (the
    scheduler computed it on the early-exit prefix); the fallback scan stores
    the full p-value array."""
    if low_ref is None:
        return TestResult(0.0, 0.0, 0, True), ()
    if low_ref[0] is None:
        _, pv, stat_a, df_a, suff_a, Zarr, kvec, i = low_ref
        return (
            TestResult(stat_a.item(i), pv, int(df_a.item(i)),
                       bool(suff_a.item(i))),
            tuple(Zarr[i, : kvec.item(i)].tolist()),
        )
    stat_a, pval_a, df_a, suff_a, Zarr, kvec, i = low_ref
    return (
        TestResult(stat_a.item(i), pval_a.item(i), int(df_a.item(i)),
                   bool(suff_a.item(i))),
        tuple(Zarr[i, : kvec.item(i)].tolist()),
    )


def _combo_chunks(a: int, max_k: int):
    """Yield (pos, kvec) chunks covering all subsets in enumeration order.

    Small candidate sets (the overwhelmingly common case) come from the
    template cache as ONE chunk, so a candidate costs a single device round;
    large sets are enumerated lazily in SUBSET_CHUNK slices so early-exit
    still bounds the work and nothing huge is materialized."""
    total = _subset_total(a, max_k)
    if total <= SUBSET_CHUNK:
        yield _combo_template(a, max_k)
        return
    for k in range(min(max_k, a), 0, -1):
        it = itertools.combinations(range(a), k)
        while True:
            block = list(itertools.islice(it, SUBSET_CHUNK))
            if not block:
                break
            nc = len(block)
            pos = np.zeros((nc, max_k), np.int32)
            pos[:, :k] = np.fromiter(
                itertools.chain.from_iterable(block), np.int32, count=nc * k,
            ).reshape(nc, k)
            yield pos, np.full(nc, k, np.int32)


def test_subsets_gen(T: int, cand: int, Z_total: Sequence[int],
                     cfg: HitonConfig, engine):
    """Generator evaluating conditioning subsets of Z_total, largest first,
    early-exiting on the first non-significant result.

    Yields batched device requests ("mi", T, cand, Zarr, kvec) -- all subset
    sizes of a small candidate set ship as ONE request (wasted post-exit
    evaluations traded for one scheduler round per candidate); the host-side
    scan in enumeration order keeps accept/reject decisions and reported
    statistics identical to the reference's sequential loop.  Returns
    (test_result, lowest_sig_Zs, num_tests, frac_tests)."""
    if not Z_total:
        return TestResult(NAN, NAN, -1, True), (-1,), -1, NAN

    # weakest-significant ("lowest") tracking is kept as a REFERENCE into the
    # already-fetched result arrays and materialized once on return -- per-
    # chunk TestResult/tuple construction dominated large runs
    low_m = 0.0
    low_ref = None
    num_tests = 0

    mcor = None
    mcor_nobs = None
    nz_positions = False
    if not cfg.discrete:
        if cfg.nz:
            # per-pair masked correlations over [X, Y, Z_total...]
            # (reference: src/tests.jl:293-307 cor_subset!)
            if engine.recursive_pcor:
                var_list = [T, cand] + list(Z_total)
                mcor, mcor_nobs = yield ("mcor", (T, cand), var_list)
                nz_positions = True
            else:
                mcor_nobs = engine.nz_pair_count(T, cand)
            if cfg.n_obs_min > mcor_nobs:
                return TestResult(0.0, 1.0, 0, False), (), num_tests, 0.0
        else:
            mcor = engine.cor_mat
            mcor_nobs = engine.n

    a = len(Z_total)
    max_k = cfg.max_k
    Z_np = np.asarray(Z_total, dtype=np.int32)
    num_tests_total = _subset_total(a, max_k)

    for pos, kvec in _combo_chunks(a, max_k):
        B = len(kvec)
        Zarr = Z_np[pos]  # padded pos 0 -> a real column; kvec masks it
        digest = None
        nobs_a = None
        if cfg.discrete:
            got = yield ("mi", T, cand, Zarr, kvec)
            if len(got) == 5:
                # scheduler fast path: p-values deferred (stat, df, n_obs,
                # suff, digest); exact pvals live in the digest
                stat_a, df_a, nobs_a, suff_a, digest = got
                pval_a = None
            else:
                stat_a, pval_a, df_a, suff_a = got
        elif not engine.recursive_pcor:
            subsets = [tuple(Zarr[i, :kvec[i]]) for i in range(B)]
            results = engine.fz_tests_iterative(T, cand, subsets)
            stat_a = np.array([r.stat for r in results])
            pval_a = np.array([r.pval for r in results])
            df_a = np.array([r.df for r in results], dtype=np.int64)
            suff_a = np.array([r.suff_power for r in results])
        else:
            if nz_positions:
                # mcor is over [T, cand, Z_total...]: position of Z_total[i]
                # is i + 2, so the position template maps directly
                pos_X = np.zeros(B, np.int64)
                pos_Y = np.ones(B, np.int64)
                pos_Z = (pos + 2).astype(np.int64)
            else:
                pos_X = np.full(B, T, np.int64)
                pos_Y = np.full(B, cand, np.int64)
                pos_Z = Zarr
            stat_a, pval_a, df_a, suff_a = engine.fz_tests_from_cor_raw(
                mcor, pos_X, pos_Y, pos_Z, kvec, mcor_nobs
            )

        # fast path: the scheduler precomputed this request's early-exit /
        # weakest digest (same float64 semantics, one vectorized pass over
        # the whole mega-batch); only a possible max_tests cutoff inside
        # this chunk forces the local scan
        if digest is not None and not (0 < cfg.max_tests <= num_tests + B):
            e, w, maxp, exit_pv = digest
            if w >= 0:
                m = float(maxp)
                if m >= low_m or math.isnan(low_m):
                    low_m = m
                    low_ref = (None, m, stat_a, df_a, suff_a, Zarr, kvec, w)
            if e >= 0:
                num_tests += e + 1
                res = TestResult(stat_a.item(e), float(exit_pv),
                                 int(df_a.item(e)), bool(suff_a.item(e)))
                return (res, tuple(Zarr[e, : kvec.item(e)].tolist()),
                        num_tests, num_tests / num_tests_total)
            num_tests += B
            continue
        if pval_a is None:
            # digest skipped (max_tests budget falls inside this chunk, or a
            # non-digest dispatcher): full p-value semantics of
            # condtests._finish_packed, computed generator-side
            from ..ops import statfuns as sf

            pval_a = np.where(suff_a, sf.mi_pval(stat_a, df_a, nobs_a), 1.0)

        # vectorized early-exit scan in enumeration order (semantics of
        # the sequential loop, reference src/tests.jl:311-343); NaN pvals
        # compare False like the reference's issig (src/tests.jl:1-3)
        sig = (pval_a < cfg.alpha) & suff_a
        exit_flags = ~sig
        if cfg.max_tests > 0:
            exit_flags |= (num_tests + 1 + np.arange(B)) >= cfg.max_tests

        def upd_lowest(upto):
            nonlocal low_m, low_ref
            if upto == 0:
                return
            # argmax over the reversed view finds the LAST max occurrence --
            # one numpy call resolves both the max and the reference's
            # sequential >= tie-break (NaNs propagate to m and compare False,
            # exactly like the running max)
            i = upto - 1 - int(np.argmax(pval_a[upto - 1 :: -1]))
            m = float(pval_a[i])
            if m >= low_m or math.isnan(low_m):
                low_m = m
                low_ref = (stat_a, pval_a, df_a, suff_a, Zarr, kvec, i)

        if exit_flags.any():
            e = int(np.argmax(exit_flags))
            upd_lowest(e)
            num_tests += e + 1
            res = TestResult(stat_a.item(e), pval_a.item(e),
                             int(df_a.item(e)), bool(suff_a.item(e)))
            frac = num_tests / num_tests_total
            if 0 < cfg.max_tests <= num_tests:
                warnings.warn(
                    f"Maximum number of tests for variable pair {T} / "
                    f"{cand} at {num_tests} out of {num_tests_total} "
                    f"tests (fraction: {round(frac, 3)}, size of Z: "
                    f"{len(Z_total)})."
                )
            return res, tuple(Zarr[e, : kvec.item(e)].tolist()), num_tests, frac
        upd_lowest(B)
        num_tests += B

    lowest, lowest_Zs = _materialize_lowest(low_m, low_ref)
    return lowest, lowest_Zs, num_tests, num_tests / num_tests_total


# ---------------------------------------------------------------------------
# phase backend (reference: src/hiton.jl:109-149)
# ---------------------------------------------------------------------------

def phase_backend(T: int, candidates: List[int], cfg: HitonConfig, engine,
                  phase: str,
                  prev_accepted_dict: Optional[NbrStatDict],
                  candidates_unchecked: List[int],
                  support_dict: NbrStatDict,
                  whitelist, blacklist: Set[int],
                  rej_dict: RejDict,
                  control: SearchControl, clock: JobClock):
    """One HITON phase ('I' interleaving / 'E' elimination).  Returns
    (accepted_dict, candidates_unchecked)."""
    if prev_accepted_dict:
        accepted_dict = prev_accepted_dict
        candidates = list(candidates_unchecked)
    else:
        accepted_dict = {}

    accepted: List[int] = list(candidates) if phase == "E" else []

    for ci, cand in enumerate(candidates):
        if cfg.debug > 0:
            print(f"\tTesting candidate {cand} ({ci + 1} out of "
                  f"{len(candidates)}) conditioned on {accepted}, current set "
                  f"size: {len(accepted)}")
        in_list = False
        # whitelist feed-forward (reference: src/hiton.jl:20-38)
        if whitelist is not None and cand in whitelist:
            accepted.append(cand)
            accepted_dict[cand] = (NAN, NAN)
            in_list = True
            if cfg.debug > 0:
                print("\tin whitelist")
        if blacklist and cand in blacklist:
            in_list = True
            if cfg.debug > 0:
                print("\tin blacklist")

        if not in_list:
            if phase == "E":
                accepted = [a for a in accepted if a != cand]
            if cfg.bnb:
                from .bnb import bnb_test_subsets_gen

                res, lowest_Zs, num_tests, frac = yield from bnb_test_subsets_gen(
                    T, cand, accepted, cfg, engine, cfg.cut_test_branches
                )
            else:
                res, lowest_Zs, num_tests, frac = yield from test_subsets_gen(
                    T, cand, accepted, cfg, engine
                )
            # update_sig_result! (reference: src/hiton.jl:53-78)
            if not accepted:
                accepted.append(cand)
                accepted_dict[cand] = support_dict[cand]
            elif issig(res, cfg.alpha):
                accepted.append(cand)
                accepted_dict[cand] = (res.stat, res.pval)
                if cfg.debug > 0:
                    print(f"\taccepted: {res}")
            else:
                if cfg.debug > 0:
                    print(f"\trejected: {res} through Z {lowest_Zs}")
                if phase == "E" and not cfg.fast_elim:
                    accepted.append(cand)
                if cfg.track_rejections:
                    rej_dict[cand] = (lowest_Zs, res, (num_tests, frac))

        # per-job time-limit checkpoint (reference: src/hiton.jl:143-146).
        # Global convergence only takes effect HERE: a checkpointed job is
        # frozen instead of resumed (reference: src/interleaved.jl:119-124);
        # an unconverged checkpoint is requeued and re-enters with a fresh
        # clock, which is equivalent to resetting the timer and continuing.
        if clock.expired() and ci < len(candidates) - 1:
            if control.converged:
                return accepted_dict, candidates[ci + 1:]
            clock.reset()
    return accepted_dict, []


# ---------------------------------------------------------------------------
# full per-target search (reference: src/hiton.jl:283-400)
# ---------------------------------------------------------------------------

def si_hiton_pc_gen(T: int, cfg: HitonConfig, engine,
                    univar_nbrs: NbrStatDict,
                    prev_state: Optional[HitonState] = None,
                    whitelist=None, blacklist: Optional[Set[int]] = None,
                    control: Optional[SearchControl] = None):
    """Generator running the full HITON-PC search for target T.  Yields
    batched test requests and returns the final (or partial) HitonState."""
    if prev_state is None:
        prev_state = HitonState("S", {}, {}, [], {})
    if control is None:
        control = SearchControl()
    blacklist = blacklist or set()
    rej_dict: RejDict = {}

    if cfg.discrete and engine.levels[T] < 2:
        return _empty_state()

    # per-job clock, started when this target's search actually begins
    # (generator body runs on first advance; reference: src/hiton.jl:305)
    clock = JobClock(cfg.time_limit)

    if cfg.max_k <= 0:
        TPC_dict: NbrStatDict = {}
        PC_dict = univar_nbrs
        return _make_final_state(prev_state, PC_dict, TPC_dict, rej_dict)

    if prev_state.phase == "C":
        # global convergence froze this variable (reference: src/hiton.jl:315-322)
        if prev_state.inter_results:
            TPC_dict = prev_state.inter_results
            PC_dict = prev_state.state_results
        else:
            TPC_dict, PC_dict = {}, {}
        return _make_final_state(prev_state, PC_dict, TPC_dict, rej_dict)

    TPC_dict = {}
    if prev_state.phase in ("I", "S"):
        # prepare interleaving (reference: src/hiton.jl:199-220)
        if prev_state.phase == "I":
            prev_TPC = prev_state.state_results
            candidates_unchecked = list(prev_state.unchecked_vars)
            candidates: List[int] = []
            if cfg.track_rejections:
                rej_dict = prev_state.state_rejections
        else:
            # univar-p-sorted candidates; stable argsort keeps insertion
            # order on ties like the previous sorted() (vectorized -- per-
            # target Python sorts dominated large runs)
            nn = len(univar_nbrs)
            cs = np.fromiter((c for c in univar_nbrs), np.int64, count=nn)
            pv = np.fromiter((v[1] for v in univar_nbrs.values()), np.float64,
                             count=nn)
            keep = pv < cfg.alpha
            cs, pv = cs[keep], pv[keep]
            candidates = cs[np.argsort(pv, kind="stable")].tolist()
            candidates_unchecked = []
            prev_TPC = {}
        if not candidates and not candidates_unchecked and not prev_TPC:
            return _empty_state()

        TPC_dict, candidates_unchecked = yield from phase_backend(
            T, candidates, cfg, engine, "I", prev_TPC, candidates_unchecked,
            univar_nbrs, whitelist, blacklist, rej_dict, control, clock,
        )
        if candidates_unchecked:
            return HitonState("I", TPC_dict, {}, candidates_unchecked, rej_dict)

    # prepare elimination (reference: src/hiton.jl:223-246)
    if prev_state.phase == "E":
        prev_PC = prev_state.state_results
        if cfg.no_red_tests or cfg.fast_elim:
            TPC_dict = prev_state.inter_results
        PC_unchecked = list(prev_state.unchecked_vars)
        PC_candidates = list(prev_PC.keys()) + PC_unchecked
        if cfg.track_rejections:
            rej_dict = prev_state.state_rejections
    else:
        prev_PC = {}
        PC_unchecked = []
        PC_candidates = list(TPC_dict.keys())

    PC_dict, TPC_unchecked = yield from phase_backend(
        T, PC_candidates, cfg, engine, "E", prev_PC, PC_unchecked,
        TPC_dict, whitelist, blacklist, rej_dict, control, clock,
    )
    if TPC_unchecked:
        return HitonState("E", PC_dict, TPC_dict, TPC_unchecked, rej_dict)

    # reconcile weakest-significance weights (reference: src/hiton.jl:249-256)
    if cfg.no_red_tests or cfg.fast_elim:
        for nbr in PC_dict:
            if nbr in TPC_dict and (
                TPC_dict[nbr][1] > PC_dict[nbr][1] or np.isnan(PC_dict[nbr][1])
            ):
                PC_dict[nbr] = TPC_dict[nbr]

    return _make_final_state(prev_state, PC_dict, TPC_dict, rej_dict)


def si_hiton_pc(T: int, data, test_name: str = "mi", **kwargs) -> HitonState:
    """Convenience wrapper: learn the local neighborhood of one variable
    (reference: src/hiton.jl:403-409).  Runs the univariate pass, then drives
    the search generator to completion with a local engine."""
    import numpy as np

    from ..ops.condtests import CondTestEngine
    from ..ops.univariate import cor_matrix, pw_univar_neighbors
    from ..utils.misc import get_levels, get_max_vals, isdiscrete

    data = np.asarray(data)
    cfg_keys = {f.name for f in __import__("dataclasses").fields(HitonConfig)}
    cfg = HitonConfig(test_name=test_name,
                      **{k: v for k, v in kwargs.items() if k in cfg_keys})
    levels = max_vals = None
    cor_mat = None
    if isdiscrete(test_name):
        levels = get_levels(data)
        max_vals = get_max_vals(data)
    elif test_name == "fz":
        cor_mat = np.asarray(cor_matrix(data), dtype=np.float64)
    univar = pw_univar_neighbors(
        data, test_name=test_name, alpha=cfg.alpha, hps=cfg.hps,
        n_obs_min=cfg.n_obs_min, levels=levels, max_vals=max_vals,
        cor_mat=cor_mat,
    )
    engine = CondTestEngine(data, test_name, cfg.max_k, levels=levels,
                            max_vals=max_vals, cor_mat=cor_mat, hps=cfg.hps,
                            n_obs_min=cfg.n_obs_min)
    gen = si_hiton_pc_gen(T, cfg, engine, univar[T])
    resp = None
    while True:
        try:
            req = gen.send(resp)
        except StopIteration as stop:
            return stop.value
        if req[0] == "mi":
            B = len(req[4])
            resp = engine.mi_tests_raw(np.full(B, req[1], np.int32),
                                       np.full(B, req[2], np.int32),
                                       req[3], req[4])
        else:
            resp = engine.masked_cor([req[1]], [req[2]])[0]


def _make_final_state(prev_state: HitonState, PC_dict, TPC_dict,
                      rej_dict) -> HitonState:
    # reference: src/hiton.jl:259-277
    if prev_state.phase == "C":
        return HitonState("C", PC_dict, TPC_dict,
                          list(prev_state.unchecked_vars),
                          prev_state.state_rejections)
    return HitonState("F", PC_dict, TPC_dict, [], rej_dict)
