"""Fused Markov-chain Pallas kernel — the TPU hot path of the :mcmc solver.

Reference chain law: src/mcmc/montecarlo.jl:72-184 + src/mcmc/updates.jl —
Metropolis over the extended (integrand index, variables) space with update
mix {changeIntegrand, swapVariable, changeVariable x 2*nvar} selected with
probabilities (1, 1, 2*nvar)/(2*nvar+2), neighbor-graph jumps with
create/remove proposal products, burn-in, and only the CURRENT integrand
evaluated per step.

The XLA scan path (solvers/mcmc.py) pays two TPU taxes: the walker-state
carry round-trips HBM every step, and per-walker integrand heterogeneity
forces ``lax.switch`` under ``vmap`` to evaluate ALL N branches (O(N) eval
cost per step, which SURVEY.md §5 forbids for the huge-bundle regime this
solver exists for).  This kernel fixes both:

1. **VMEM-resident chains** (like ops/pallas_chain.py): each grid instance
   owns S*128 walkers and runs all steps in a ``fori_loop``; per-step state
   never touches HBM.

2. **Scheduled single-integrand steps** — the O(1)-eval-per-step redesign.
   Each step draws one scalar "active sector" j_t uniformly over the N
   INTEGRAND sectors (state-independent schedule).  Per walker, mutually
   exclusive roles:

   - an independent "norm-coin" with probability q_w(i) = 1/(N*deg_i*C)
     (C = 2*nvar+1) proposes the jump into the normalization sector —
     needs no evaluation (p_norm = reweight[norm]);
   - walkers currently AT j_t propose a changeVariable (or, on 1-in-C
     steps, swapVariable);
   - walkers at a NEIGHBOR of j_t propose the jump to j_t, thinned by a
     coin with probability 1/(deg_i*C).

   Every proposal needs only w_{j_t}, so each step runs EXACTLY ONE
   batched integrand evaluation, dispatched on the scalar j_t through a
   chain of ``pl.when`` blocks (real scalar-core branches: untaken bodies
   do not execute).  Per-step eval cost is therefore independent of N,
   and no step's evaluation is wasted on the evaluation-free norm sector.

   Validity: with the schedule marginalized, the proposal density of the
   jump i->j (both integrand sectors) is (1-q_w(i))/(N*deg_i*C) and of
   j->i is (1-q_w(j))/(N*deg_j*C), so the Metropolis-Hastings correction
   is the reference's neighbor-degree ratio deg_i/deg_j (updates.jl:1-70)
   times (1-q_w(j))/(1-q_w(i)); for jumps i<->norm the coin density
   q_w(i) = 1/(N*deg_i*C) exactly mirrors the out-jump's
   (1/N)*(1/(deg_norm*C)), leaving the bare degree ratio.  The in-sector
   thinning (1-q_w(i)) of CV/swap cancels between forward and reverse.
   Per-walker rates of (CI : swap : CV) come out 1 : 1 : 2*nvar — the
   reference mix.  A walker updates on ~(2nvar+2)/(N*(2nvar+1)) of steps
   (vs every step for the reference's scalar walker); the SIMD lanes of
   non-selected walkers ride along in the batched eval.  Statistical
   efficiency per *evaluation* matches the reference's
   one-eval-per-update; wall-clock throughput comes from the 2048-wide
   batch.

Proposal draws reuse the lattice-roll machinery of ops/pallas_chain.py for
Continuous pools (power-of-two ninc) and threshold-count CDF inversion for
Discrete pools (nbin <= MAX_DISCRETE_NBIN = 1024: direct SMEM-scalar
thresholds up to DISC_DIRECT_NBIN, a two-level blocked CDF draw beyond).
FermiK pools (the :mcmc-only momentum shell sampler,
sampler.jl:109-244) run fully in-kernel: values are stored as D separate
(S,128) component tiles, fresh draws are the shell x angle transform (pure
VPU math, no gathers), and changeVariable uses the reference's three-way
scale/rotate/jitter move.  FermiK slots store no probability tile — their
removal densities are recomputed from the stored value each step
(fermik_density), exactly as the XLA path recomputes dev_density, so no
stale-prob bookkeeping exists by construction.

Custom measures (mcmc convention ``measure(idx, var, relw, config)``,
montecarlo.jl:160-170) are served batched: per-sector measure functions are
built like ops/pallas_chain.make_measure_batched, proven equivalent to the
per-sample vmapped evaluation at build time, and evaluated at measured
steps masked by ``curr == i``.  Complex custom measures ride the same path
through the realify transform (make_measure_batched_idx_pairs): relw
arrives as an (re, im) tile pair and complex observable components
accumulate as consecutive re/im channel pairs — the reference's uniform
complex handling (src/statistics.jl:207-214) with no fast-path exception.  For the canonical N=1 physics bundles
(test/bubble.jl shape) that is exactly one batched measure call per
measured step; for N>1 the measure cost is O(N) per *measured* step while
integrand evaluation stays O(1) per step (use ``measurefreq`` to amortize
wide bundles).  Measure-path observables accumulate in VMEM scratch under
``pl.when(measured)`` so unmeasured steps pay nothing.

Like the reference (sampler.jl:306, createRollback! is a no-op), slots
freshly created by a rejected changeIntegrand keep their new values: slots
beyond the current dof never influence the chain law.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lookup import level_size, padded_hist_size
from ..common import DENS_FLOOR_F32, TINY_F32
from .pallas_vegas import _mix32, build_view

from .pallas_chain import (DISC_BLK, DISC_DIRECT_NBIN, MAX_DISCRETE_NBIN,
                           kahan_add, wide_discrete_draw,
                           wide_discrete_tables)

HIST_EVERY = 8    # histogram subsample period (pallas_chain.py docstring)
N_LATTICE = 8     # precomputed multiplier lattices per leaf (decorrelation)
TALLY_EVERY = 8   # propose/accept pair-table subsample period: the full
                  # (kind, sector, target) tables are DIAGNOSTIC statistics
                  # (configuration.jl:345-465); sampling every 8th step and
                  # scaling by 8 keeps their expectation exact while the
                  # per-step reduction cost drops 8x (ratios converge over
                  # millions of steps; the XLA path stays exact-count)


def _leaf_kind(leaf):
    from ..models.variable import Continuous, Discrete, FermiK
    if isinstance(leaf, Continuous):
        return "cont"
    if isinstance(leaf, Discrete):
        return "disc"
    if isinstance(leaf, FermiK):
        return "fermik"
    return None


def _leaf_width(leaf) -> int:
    """Component tiles per slot value (FermiK: D, scalar leaves: 1)."""
    return leaf.dim if _leaf_kind(leaf) == "fermik" else 1


def mcmc_eligible(spec, *, measure, weight_dtype, obs_proto=None,
                  S: int = 16, why=None) -> bool:
    """Static checks for the fused mcmc kernel (else: XLA scan path).

    ``why``: optional list; on a False return, a one-line human-readable
    reason is appended (surfaced as ``Result.backend_reason``)."""
    from .pallas_chain import MAX_MEASURE_COMPONENTS, obs_components

    def no(reason):
        if why is not None:
            why.append(reason)
        return False

    # complex64 weights — and complex custom-measure observables — run as
    # (re, im) f32 pairs via ops/realify.py; the reference treats complex
    # uniformly in all solvers (src/statistics.jl:207-214)
    cplx = weight_dtype == jnp.complex64
    if not cplx and weight_dtype != jnp.float32:
        return no(f"weight dtype {jnp.dtype(weight_dtype).name} "
                  "(kernel supports float32 and complex64)")
    nd = spec.N + 1
    if nd > 62:            # adjacency bitmask lives in two int32 words
        return no(f"{spec.N} integrands > 61 (two-word adjacency bitmask)")
    drawn = [li for li in spec.leaves if li.ndraw > 0]
    if not drawn:
        return no("no MC-owned slots to draw")
    w_inst = S * 128
    ncont = 0
    for li in spec.leaves:
        kind = _leaf_kind(li.leaf)
        if kind is None:
            return no(f"{type(li.leaf).__name__} pools run on the XLA path")
        if li.ndraw == 0:
            continue
        if kind == "cont":
            ncont += 1
            ninc = li.leaf.ninc
            if ninc & (ninc - 1) or w_inst % ninc:
                return no(f"Continuous ninc={ninc} is not a power of two "
                          f"dividing the {w_inst}-walker tile "
                          "(lattice-roll requirement)")
        elif kind == "disc":
            if li.leaf.nbin > MAX_DISCRETE_NBIN:
                return no(f"Discrete nbin={li.leaf.nbin} > "
                          f"{MAX_DISCRETE_NBIN} (kernel CDF-table limit)")
    ncomp = spec.N * (2 if cplx else 1)
    if measure is not None:
        ncomp = obs_components(obs_proto)
        if cplx:
            ncomp *= 2
        if ncomp > MAX_MEASURE_COMPONENTS:
            return no(f"{ncomp} observable components > "
                      f"{MAX_MEASURE_COMPONENTS} (VMEM accumulator budget)")
    # VMEM working-set bound (cf. pallas_chain.chain_eligible): per slot the
    # loop carries value/proposal/draw component tiles plus gidx/prob pairs.
    n, nvar = spec.N, spec.nvar
    tile = S * 128 * 4
    slot_tiles = sum(li.ndraw * (3 * _leaf_width(li.leaf) + 6)
                     for li in drawn)
    # 2*ncomp: observable accumulators (carry or measure scratch) + their
    # Kahan compensation tiles
    tiles = (slot_tiles + (4 if cplx else 2) * n + 2 * ncomp + 2 * nd
             + nvar + 25)
    bases = 2 * N_LATTICE * tile * ncont
    hists = sum(level_size(li.leaf.nhist) ** 2 * 4 for li in drawn
                if getattr(li.leaf, "adapt", False))
    dtabs = sum(2 * -(-li.leaf.nbin // DISC_BLK) * DISC_BLK * 4
                for li in drawn if _leaf_kind(li.leaf) == "disc"
                and li.leaf.nbin > DISC_DIRECT_NBIN)
    if tiles * tile + bases + hists + dtabs > 48 * 1024 * 1024:
        return False
    return True


def _probe_leaf_vals(spec, rng):
    """Random [ndraw(,D), 4, 2] leaf values for equivalence probes."""
    leaf_vals = []
    for li in spec.leaves:
        kind = _leaf_kind(li.leaf)
        nd_ = max(li.ndraw, 1)
        if kind == "disc":
            v = rng.integers(li.leaf.lower, li.leaf.upper + 1, (nd_, 4, 2))
            leaf_vals.append(jnp.asarray(v, jnp.int32)[: li.ndraw])
        elif kind == "fermik":
            D = li.leaf.dim
            kamp = (li.leaf.kF
                    + (rng.uniform(size=(nd_, 1, 4, 2)) - 0.5)
                    * li.leaf.delta_k)
            dirs = rng.normal(size=(nd_, D, 4, 2))
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            leaf_vals.append(jnp.asarray(kamp * dirs,
                                         jnp.float32)[: li.ndraw])
        else:
            lo = float(getattr(li.leaf, "lower", 0.0))
            rg = float(getattr(li.leaf, "range", 1.0))
            u = rng.uniform(0.05, 0.95, (nd_, 4, 2))
            leaf_vals.append(jnp.asarray(lo + rg * u,
                                         jnp.float32)[: li.ndraw])
    return leaf_vals


def make_eval_batched_idx(spec, integrand, weight_dtype) -> List[Callable]:
    """Per-integrand batched evals on [ndraw, S, 128] leaf values.

    mcmc integrand convention: ``integrand(idx, var, config)``
    (src/mcmc/montecarlo.jl:34); returns one function per integrand index.
    """
    from ..solvers.engine import _finite_guard

    uc = spec.uconfig
    _view = build_view(spec)

    def make(i):
        def _eval(leaf_vals):
            v = _view(leaf_vals)
            # trailing two axes are the sample tile (leading axes are the
            # slot axis and, for FermiK, the component axis)
            shape = leaf_vals[0].shape[-2:]
            w = jnp.asarray(integrand(i, v, uc), weight_dtype)
            return _finite_guard(jnp.broadcast_to(w, shape))
        return _eval

    return [make(i) for i in range(spec.N)]


def validate_batched_idx(spec, evals_b, integrand, weight_dtype) -> bool:
    """Prove batched eval == per-sample eval for every integrand index."""
    try:
        rng = np.random.default_rng(12345)
        leaf_vals = _probe_leaf_vals(spec, rng)
        for i in range(spec.N):
            wb = evals_b[i](leaf_vals)
            eval_one = spec.make_eval_one(integrand, i, weight_dtype)

            def per_sample(vals):
                return eval_one([{"val": v} for v in vals])

            wv = jax.vmap(jax.vmap(per_sample, in_axes=-1, out_axes=-1),
                          in_axes=-1, out_axes=-1)(leaf_vals)
            if not bool(jnp.allclose(wb, wv, rtol=1e-5, atol=1e-6)):
                return False
        return True
    except Exception:
        return False


def make_eval_batched_idx_pairs(spec, integrand) -> List[Callable]:
    """Per-integrand batched complex evals as (re, im) float32 pairs.

    Wraps :func:`make_eval_batched_idx` at complex64 with the realify
    transform (ops/realify.py) so every complex intermediate evaluates as
    an (re, im) f32 pair — the form Mosaic kernels can run.  Raises
    RealifyError at trace time for complex primitives without a rewrite
    rule (callers fall back to the XLA scan path).
    """
    from .realify import realify

    base = make_eval_batched_idx(spec, integrand, jnp.complex64)

    def make(i):
        lifted = realify(lambda *lv: base[i](list(lv)))

        def _eval(leaf_vals):
            out = lifted(*leaf_vals)
            if not isinstance(out, tuple):        # real-valued sector
                return (out, jnp.zeros_like(out))
            return out

        return _eval

    return [make(i) for i in range(spec.N)]


def validate_batched_idx_pairs(spec, evals_b, integrand) -> bool:
    """Prove realified pair eval == complex per-sample eval per sector."""
    try:
        rng = np.random.default_rng(12345)
        leaf_vals = _probe_leaf_vals(spec, rng)
        for i in range(spec.N):
            eval_one = spec.make_eval_one(integrand, i, jnp.complex64)

            def per_sample(vals):
                return eval_one([{"val": v} for v in vals])

            @jax.jit
            def probe(leaf_vals, i=i):
                re, im = evals_b[i](leaf_vals)
                wv = jax.vmap(jax.vmap(per_sample, in_axes=-1, out_axes=-1),
                              in_axes=-1, out_axes=-1)(leaf_vals)
                return (jnp.allclose(re, jnp.real(wv), rtol=1e-5, atol=1e-6)
                        & jnp.allclose(im, jnp.imag(wv), rtol=1e-5,
                                       atol=1e-6))

            if not bool(probe(leaf_vals)):
                return False
        return True
    except Exception:
        return False


def make_measure_batched_idx(spec, measure, weight_dtype, obs_proto):
    """Per-sector batched measure on [ndraw(,D), S, 128] leaf values.

    mcmc measure convention: ``measure(idx, var, relw, config)`` returning
    the observable-contribution pytree (mcmc/montecarlo.jl:160-170);
    ``relw`` is the walker tile ``weight/probability``.  Returns one
    function per integrand index, mirroring
    :func:`pallas_chain.make_measure_batched`.
    """
    _view = build_view(spec)
    uc = spec.uconfig

    def make(i):
        def _m(leaf_vals, relw):
            v = _view(leaf_vals)
            tile = relw.shape
            out = measure(i, v, relw, uc)

            def fix(z, proto):
                z = jnp.asarray(z, weight_dtype)
                return jnp.broadcast_to(z, np.shape(proto) + tile)

            return jax.tree_util.tree_map(fix, out, obs_proto)

        return _m

    return [make(i) for i in range(spec.N)]


def validate_measure_batched_idx(spec, measure_b, measure,
                                 obs_proto) -> bool:
    """Prove batched measure == per-sample vmapped measure per sector."""
    try:
        rng = np.random.default_rng(98765)
        leaf_vals = _probe_leaf_vals(spec, rng)
        relw = jnp.asarray(rng.uniform(0.1, 1.0, (4, 2)), jnp.float32)
        uc = spec.uconfig
        for i in range(spec.N):
            wb = measure_b[i](leaf_vals, relw)

            def per_sample(vals, rw, i=i):
                pools = [{"val": v} for v in vals]
                out = measure(i, spec.view(pools), rw, uc)
                return jax.tree_util.tree_map(
                    lambda z, p: jnp.reshape(z, np.shape(p)),
                    out, obs_proto)

            wv = jax.vmap(jax.vmap(per_sample, in_axes=-1, out_axes=-1),
                          in_axes=-1, out_axes=-1)(leaf_vals, relw)
            ok = jax.tree_util.tree_map(
                lambda a, b: bool(jnp.allclose(
                    a, jnp.asarray(b, a.dtype), rtol=1e-5, atol=1e-6)),
                wb, wv)
            if not all(jax.tree_util.tree_leaves(ok)):
                return False
        return True
    except Exception:
        return False


def make_measure_batched_idx_pairs(spec, measure, obs_proto):
    """Complex-capable per-sector batched measure as (re, im) f32 pairs.

    Wraps :func:`make_measure_batched_idx` at complex64 with the realify
    transform (ops/realify.py), mirroring
    :func:`pallas_chain.make_measure_batched_pairs` for the :mcmc measure
    convention ``measure(idx, var, relw, config)``: the kernel's relative
    weight arrives as an (re, im) tile pair, is recombined into complex
    inside the traced function, and every complex observable contribution
    comes back as an (re, im) tuple in the output pytree.  Raises
    RealifyError at build time for complex primitives without a rewrite
    rule (callers fall back to the XLA path).  Closes the reference's
    complex-uniformity contract (src/statistics.jl:207-214) on the last
    fast path that lacked it.
    """
    from .realify import realify

    base = make_measure_batched_idx(spec, measure, jnp.complex64, obs_proto)

    def make(i):
        def complex_call(leaf_vals, relw_re, relw_im):
            return base[i](leaf_vals, jax.lax.complex(relw_re, relw_im))

        lifted = realify(complex_call)

        def _m(leaf_vals, relw_pair):
            return lifted(leaf_vals, relw_pair[0], relw_pair[1])

        return _m

    return [make(i) for i in range(spec.N)]


def validate_measure_batched_idx_pairs(spec, measure_b, measure,
                                       obs_proto) -> bool:
    """Prove realified pair measure == complex per-sample measure/sector."""
    try:
        rng = np.random.default_rng(98765)
        leaf_vals = _probe_leaf_vals(spec, rng)
        rw_re = jnp.asarray(rng.uniform(0.1, 1.0, (4, 2)), jnp.float32)
        rw_im = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 2)), jnp.float32)
        uc = spec.uconfig
        for i in range(spec.N):
            def per_sample(vals, rw_col, i=i):
                pools = [{"val": v} for v in vals]
                out = measure(i, spec.view(pools), rw_col, uc)
                return jax.tree_util.tree_map(
                    lambda z, p: jnp.reshape(z, np.shape(p)),
                    out, obs_proto)

            @jax.jit
            def probe(leaf_vals, rw_re, rw_im, i=i):
                wb = measure_b[i](leaf_vals, (rw_re, rw_im))
                relw = jax.lax.complex(rw_re, rw_im)
                wv = jax.vmap(jax.vmap(per_sample, in_axes=-1, out_axes=-1),
                              in_axes=-1, out_axes=-1)(leaf_vals, relw)
                oks = []
                for a, b in zip(jax.tree_util.tree_leaves(
                        wb, is_leaf=lambda x: isinstance(x, tuple)),
                        jax.tree_util.tree_leaves(wv)):
                    if isinstance(a, tuple):
                        oks.append(jnp.allclose(a[0], jnp.real(b),
                                                rtol=1e-5, atol=1e-6))
                        oks.append(jnp.allclose(a[1], jnp.imag(b),
                                                rtol=1e-5, atol=1e-6))
                    else:
                        oks.append(jnp.allclose(a, jnp.asarray(b, a.dtype),
                                                rtol=1e-5, atol=1e-6))
                return jnp.all(jnp.stack(oks))

            if not bool(probe(leaf_vals, rw_re, rw_im)):
                return False
        return True
    except Exception:
        return False


def _twhere(m, a, b):
    """jnp.where lifted over per-component value tuples (FermiK slots)."""
    if isinstance(a, tuple):
        return tuple(jnp.where(m, x, y) for x, y in zip(a, b))
    return jnp.where(m, a, b)


def build_mcmc_run_all(spec, evals_b: List[Callable], *, block: int,
                       wtiles: int, S: int, nsteps: int, nburnin: int,
                       mf: int, interpret: bool = False,
                       measure_b=None, obs_proto=None, cplx: bool = False):
    """Return run_all(params, kd [B*wtiles, 2] uint32) with the contract
    (obs [block, n] — or the obs_proto pytree with leading [block] when a
    custom measure is active — norm [block], visited [nd], hists,
    pc [3, nd, ncol], ac [3, nd, ncol], eval_steps [scalar f32]): per-block
    observable/normalization sums, per-sector visited tallies, per-leaf
    padded histograms, FULL per-(kind, sector, target) proposal/acceptance
    tables (configuration.jl:345-465 layout, subsampled — see TALLY_EVERY),
    and the number of steps that ran an integrand evaluation (for honest
    neval accounting).
    """
    n = spec.N
    nd = n + 1
    norm = spec.norm
    nvar = spec.nvar
    leaves = spec.leaves
    dleaf = [i for i, li in enumerate(leaves) if li.ndraw > 0]
    cleaf = [i for i in dleaf if _leaf_kind(leaves[i].leaf) == "cont"]
    xleaf = [i for i in dleaf if _leaf_kind(leaves[i].leaf) == "disc"]
    xleaf_wide = [i for i in xleaf
                  if leaves[i].leaf.nbin > DISC_DIRECT_NBIN]
    fleaf = [i for i in dleaf if _leaf_kind(leaves[i].leaf) == "fermik"]
    f32 = jnp.float32
    i32 = jnp.int32
    LN = 128
    NF = S * LN
    C = 2 * nvar + 1          # thinning constant: mix (1,1,2nvar)/(2nvar+2)
    hk = min(HIST_EVERY, max(nsteps // mf, 1))
    ntot = nsteps + nburnin
    adapt_leaves = [i for i in dleaf if getattr(leaves[i].leaf, "adapt",
                                                False)]
    Ls = {i: level_size(leaves[i].leaf.nhist) for i in adapt_leaves}
    eligible_groups = [g for g in range(nvar) if spec.maxdof[g] > 0]
    ncol_t = max(nd, nvar)        # tally-table column count (solver nmax)
    # flattened observable components (custom measure path); complex proto
    # leaves expand to consecutive (re, im) component groups — exactly the
    # flattening order of the realified measure's (re, im) output tuples
    # (cf. pallas_chain.build_chain_run_all)
    if measure_b is not None:
        proto_leaves, proto_def = jax.tree_util.tree_flatten(obs_proto)
        comp_infos = [(np.shape(x), bool(np.iscomplexobj(x)))
                      for x in proto_leaves]
        comp_shapes = []
        for s, iscpx in comp_infos:
            comp_shapes += [s, s] if iscpx else [s]
        ncomp = sum(max(int(np.prod(s)), 1) for s in comp_shapes)
    else:
        # complex weights run as (re, im) pairs: component 2i = Re w_i,
        # component 2i+1 = Im w_i (reference treats re/im as independent
        # channels, src/statistics.jl:24-55)
        ncomp = 2 * n if cplx else n

    # weight algebra over scalars (real) or (re, im) pairs (complex);
    # probability = |weight| * reweight[curr] stays real either way
    # (mcmc/montecarlo.jl:99-101)
    if cplx:
        def wabs(w):
            return jnp.sqrt(w[0] * w[0] + w[1] * w[1])

        def wsel(m, a, b):
            return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))

        def wzero_like(w):
            return (w[0] * 0.0, w[1] * 0.0)
    else:
        def wabs(w):
            return jnp.abs(w)

        def wsel(m, a, b):
            return jnp.where(m, a, b)

        def wzero_like(w):
            return w * 0.0

    # static host tables ---------------------------------------------------
    deg_np = np.asarray([len(a) for a in spec.cfg.neighbor], np.float32)
    # adjacency bitmask: 31 sector bits per int32 word (sign bit unused)
    nwords = 1 if nd <= 31 else 2
    adjb_np = np.zeros((nd, nwords), np.int32)
    for i, adj in enumerate(spec.cfg.neighbor):
        for j in adj:
            w, bit = divmod(int(j), 31)
            adjb_np[i, w] |= (1 << bit)
    dof_np = np.asarray(spec.cfg.dof, np.int32)          # [nd, nvar]

    def kernel(kd_ref, rw_ref, deg_ref, adjb_ref, dof_ref, *refs):
        # refs: atab (SMEM [ncont, R] i32), per cont leaf (pgbase, pibase)
        # VMEM [R*S, 128]; per disc leaf (cdf SMEM [nbin+1], dist SMEM
        # [nbin]); outs: obs (SMEM [B, n]), norm (SMEM [B, 1]), visited
        # (SMEM [1, nd]), pc/ac (SMEM [1, 3]), evsteps (SMEM [1,1]),
        # hist per adapt leaf (VMEM [L, L]); scratch: neww (VMEM (S,128)).
        o = 0
        atab_ref = refs[o]; o += 1
        pgb, pib = {}, {}
        for lidx in cleaf:
            pgb[lidx] = refs[o]; pib[lidx] = refs[o + 1]; o += 2
        cdfr, distr, ccdfr, cfr, dfr = {}, {}, {}, {}, {}
        for lidx in xleaf:
            if lidx in xleaf_wide:
                ccdfr[lidx] = refs[o]
                cfr[lidx] = refs[o + 1]
                dfr[lidx] = refs[o + 2]
                o += 3
            else:
                cdfr[lidx] = refs[o]; distr[lidx] = refs[o + 1]; o += 2
        (obs_ref, norm_ref, vis_ref, pcf_ref, acf_ref, ev_ref) = refs[o:o + 6]
        o += 6
        hist_refs = {lidx: refs[o + k] for k, lidx in enumerate(adapt_leaves)}
        if measure_b is not None:
            # scratch: eval buffer + measure accumulator + its Kahan
            # compensation buffer (kahan_add docstring, pallas_chain.py)
            neww_ref, mobs_ref, mcmp_ref = refs[-3], refs[-2], refs[-1]
        else:
            neww_ref = refs[-1]   # scratch
            mobs_ref = mcmp_ref = None

        b = pl.program_id(0)
        wt = pl.program_id(1)
        inst = b * wtiles + wt

        @pl.when((b == 0) & (wt == 0))
        def _():
            for lidx in adapt_leaves:
                L = Ls[lidx]
                hist_refs[lidx][:, :] = jnp.zeros((L, L), f32)
            # propose/accept pair tables accumulate in SMEM during the
            # step loop: zero them before the first instance's loop runs
            for r in range(3 * nd):
                for c in range(ncol_t):
                    pcf_ref[r, c] = 0.0
                    acf_ref[r, c] = 0.0

        # ---- per-instance RNG (cf. pallas_chain.py) ----
        if not interpret:
            tm = _mix32(inst.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
            pltpu.prng_seed(kd_ref[inst, 0] ^ tm, kd_ref[inst, 1])

            def rand_u01(salt, t):
                bits = pltpu.prng_random_bits((S, LN))
                b24 = bits & jnp.int32(0x00FFFFFF)
                return (b24.astype(f32) + 0.5) * f32(2.0 ** -24)

            def rand_int(salt, t):
                bits = pltpu.prng_random_bits((1, 1))
                return bits[0, 0] & jnp.int32(0x7FFFFFFF)
        else:
            k1 = _mix32(kd_ref[inst, 0] ^ jnp.uint32(0x243F6A88))
            k2 = _mix32(kd_ref[inst, 1] + jnp.uint32(0x13198A2E))

            def _mix_t(salt, t):
                tt = t.astype(jnp.uint32) if hasattr(t, "astype") \
                    else jnp.uint32(t)
                return _mix32(tt * jnp.uint32(2654435761)
                              + jnp.uint32((salt * 0x85EB) & 0xFFFFFFFF))

            def rand_u01(salt, t):
                idx = (jax.lax.broadcasted_iota(jnp.uint32, (S, LN), 0)
                       * jnp.uint32(LN)
                       + jax.lax.broadcasted_iota(jnp.uint32, (S, LN), 1))
                u = _mix32(_mix32(idx ^ k1) + k2 + _mix_t(salt, t))
                b24 = jax.lax.bitcast_convert_type(
                    u, jnp.int32) & jnp.int32(0x00FFFFFF)
                return (b24.astype(f32) + 0.5) * f32(2.0 ** -24)

            def rand_int(salt, t):
                u = _mix32(k1 + _mix32(k2 ^ _mix_t(salt, t)))
                return jax.lax.bitcast_convert_type(
                    u, jnp.int32) & jnp.int32(0x7FFFFFFF)

        salt = [0]

        def draw_u(t):
            salt[0] += 1
            return rand_u01(salt[0], t)

        def draw_i(t):
            salt[0] += 1
            return rand_int(salt[0], t)

        lane = jax.lax.broadcasted_iota(jnp.int32, (S, LN), 1)
        widx = (jax.lax.broadcasted_iota(jnp.int32, (S, LN), 0) * LN + lane)

        def flat_roll(x, k):
            q = k // LN
            m = k % LN
            a = pltpu.roll(pltpu.roll(x, q, 0), m, 1)
            bq = pltpu.roll(pltpu.roll(x, q + 1, 0), m, 1)
            return jnp.where(lane >= m, a, bq)

        def fermik_density(lidx, value):
            """Shell density of a stored momentum (FermiK.dev_density,
            sampler.jl:157-186): 0 outside |K| in (kF-dk, kF+dk)."""
            leaf = leaves[lidx].leaf
            kF, dk = float(leaf.kF), float(leaf.delta_k)
            k2 = value[0] * value[0]
            for c in value[1:]:
                k2 = k2 + c * c
            kamp = jnp.sqrt(k2)
            inside = (kamp > kF - dk) & (kamp < kF + dk)
            if leaf.dim == 3:
                rho = jnp.sqrt(value[0] ** 2 + value[1] ** 2)
                sin_t = rho / jnp.maximum(kamp, f32(DENS_FLOOR_F32))
                ok = inside & (sin_t >= 1.0e-15)
                jac = (4 * np.pi * np.pi * dk) * sin_t * kamp * kamp
            else:
                ok = inside
                jac = (4 * np.pi * dk) * kamp
            dens = 1.0 / jnp.maximum(jac, f32(DENS_FLOOR_F32))
            return jnp.where(ok, dens, 0.0)

        def fermik_shift(lidx, t, value):
            """Three-way CV move: radial scale / re-orientation / jitter
            (FermiK.dev_shift, sampler.jl:196-244).  Returns
            (new_value tuple, proposal-factor tile)."""
            leaf = leaves[lidx].leaf
            dk = float(leaf.delta_k)
            lam = 1.5
            sel = draw_u(t)
            u1 = draw_u(t)
            # branch 1: radial scale by ratio in [1/lam, lam]
            ratio = f32(1.0 / lam) + u1 * f32(lam - 1.0 / lam)
            v_scale = tuple(c * ratio for c in value)
            # branch 2: uniform re-orientation at fixed |K|
            k2 = value[0] * value[0]
            for c in value[1:]:
                k2 = k2 + c * c
            kamp = jnp.sqrt(k2)
            phi = u1 * f32(2.0 * np.pi)
            if leaf.dim == 3:
                u2 = draw_u(t)
                ct = jnp.clip(1.0 - 2.0 * u2, -1.0, 1.0)
                st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
                v_rot = (kamp * jnp.cos(phi) * st,
                         kamp * jnp.sin(phi) * st, kamp * ct)
                prop_scale = ratio
            else:
                v_rot = (kamp * jnp.cos(phi), kamp * jnp.sin(phi))
                prop_scale = jnp.ones_like(ratio)
            # branch 3: per-component jitter
            v_jit = tuple(c + (draw_u(t) - 0.5) * dk for c in value)
            b1 = sel < f32(1.0 / 3.0)
            b2 = (~b1) & (sel < f32(2.0 / 3.0))
            nv = tuple(jnp.where(b1, a, jnp.where(b2, b, c))
                       for a, b, c in zip(v_scale, v_rot, v_jit))
            prop = jnp.where(b1, prop_scale, 1.0)
            return nv, prop

        def draw_leaf(lidx, t):
            """Fresh map draw: lattice-roll (Continuous, pallas_chain.py
            item 1), threshold-count CDF inversion (Discrete), or shell x
            angle transform (FermiK, sampler.jl:109-145).
            Returns (value, gidx, prob)."""
            li = leaves[lidx]
            if lidx in fleaf:
                leaf = li.leaf
                kF, dk = float(leaf.kF), float(leaf.delta_k)
                u0 = draw_u(t)
                u1 = draw_u(t)
                kamp = f32(kF) + (u0 - 0.5) * f32(2.0 * dk)
                phi = u1 * f32(2.0 * np.pi)
                if leaf.dim == 3:
                    u2 = draw_u(t)
                    theta = u2 * f32(np.pi)
                    st, ct = jnp.sin(theta), jnp.cos(theta)
                    value = (kamp * jnp.cos(phi) * st,
                             kamp * jnp.sin(phi) * st, kamp * ct)
                    jac = (4 * np.pi * np.pi * dk) * st * kamp * kamp
                else:
                    value = (kamp * jnp.cos(phi), kamp * jnp.sin(phi))
                    jac = (4 * np.pi * dk) * kamp
                prob = jnp.where(kamp <= 0.0, 0.0,
                                 1.0 / jnp.maximum(jac, f32(DENS_FLOOR_F32)))
                return value, jnp.zeros((S, LN), i32), prob
            if lidx in cleaf:
                ninc = li.leaf.ninc
                kidx = cleaf.index(lidx)
                r = draw_i(t) % N_LATTICE
                a = atab_ref[kidx, r]
                k = draw_i(t) % NF
                base_pg = pgb[lidx][pl.ds(r * S, S), :]
                base_pi = pib[lidx][pl.ds(r * S, S), :]
                sh = (NF - k) % NF
                pg = flat_roll(base_pg, sh)
                pi = flat_roll(base_pi, sh)
                iy = (a * ((widx + k) % NF)) % ninc
                dy = draw_u(t)
                x = pg + dy * pi
                prob = 1.0 / (ninc * pi)
                return x, iy, prob
            # Discrete: gidx = #{k: u >= cdf[k+1]} (sampler.jl:13-22)
            nbin = li.leaf.nbin
            u = draw_u(t)
            if lidx in xleaf_wide:
                gidx, prob = wide_discrete_draw(
                    u, ccdfr[lidx], cfr[lidx], dfr[lidx], nbin, S, LN)
                return gidx + np.int32(li.leaf.lower), gidx, prob
            gidx = jnp.zeros((S, LN), i32)
            for k in range(nbin - 1):
                gidx = gidx + (u >= cdfr[lidx][k + 1]).astype(i32)
            prob = jnp.zeros((S, LN), f32)
            for k in range(nbin):
                prob = jnp.where(gidx == k, distr[lidx][k], prob)
            value = gidx + np.int32(li.leaf.lower)
            return value, gidx, prob

        def scatter_hist(lidx, bins, w):
            """hist[bins] += w via per-column one-hot MXU outer products."""
            L = Ls[lidx]
            binsT = bins.T
            wT = w.T
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (LN, L), 1)
            acc = jnp.zeros((L, L), f32)
            for s in range(S):
                col = binsT[:, s:s + 1]
                wc = wT[:, s:s + 1]
                hi = col // L
                lo = col - hi * L
                ohh = (hi == iota_l).astype(f32)
                ohl = (lo == iota_l).astype(f32)
                acc = acc + jax.lax.dot_general(
                    ohh * wc, ohl, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
            return acc

        def eval_leaf_vals(vals):
            leaf_vals = []
            for lidx, li in enumerate(leaves):
                wid = _leaf_width(li.leaf)
                if li.ndraw > 0 and wid > 1:
                    leaf_vals.append(jnp.stack(
                        [jnp.stack(list(vals[(lidx, s)]), axis=0)
                         for s in range(li.ndraw)], axis=0))
                elif li.ndraw > 0:
                    leaf_vals.append(jnp.stack(
                        [vals[(lidx, s)] for s in range(li.ndraw)], axis=0))
                else:
                    dt = i32 if lidx in xleaf else f32
                    shape = (0, wid, S, LN) if wid > 1 else (0, S, LN)
                    leaf_vals.append(jnp.zeros(shape, dt))
            return leaf_vals

        def eval_sector(jt, vals):
            """One batched eval of integrand jt via scalar-core branches
            (untaken pl.when bodies do not execute: O(1) eval per step)."""
            leaf_vals = eval_leaf_vals(vals)
            if n == 1:
                return evals_b[0](leaf_vals)
            if cplx:
                for i in range(n):
                    @pl.when(jt == i)
                    def _(i=i):
                        re, im = evals_b[i](leaf_vals)
                        neww_ref[0, :, :] = re
                        neww_ref[1, :, :] = im
                return (neww_ref[0, :, :], neww_ref[1, :, :])
            for i in range(n):
                @pl.when(jt == i)
                def _(i=i):
                    neww_ref[:, :] = evals_b[i](leaf_vals)
            return neww_ref[:, :]

        # ---- initialize!: fresh draw, start in integrand 0, retry x10 ----
        # (montecarlo.jl:76, 103-113).  FermiK slots store no prob: their
        # removal densities are recomputed from the stored value each step
        # (fermik_density), mirroring the XLA path's dev_density use.
        vals, gidxs, probs = {}, {}, {}
        for lidx in dleaf:
            for slot in range(leaves[lidx].ndraw):
                x, iy, pr = draw_leaf(lidx, jnp.int32(0))
                vals[(lidx, slot)] = x
                gidxs[(lidx, slot)] = iy
                if lidx not in fleaf:
                    probs[(lidx, slot)] = pr
        w0 = evals_b[0](eval_leaf_vals(vals))
        r0 = rw_ref[0]
        weight = w0
        prob_reg = wabs(w0) * r0

        def retry(rt, st):
            vals, gidxs, probs, weight, prob_reg = st
            bad = prob_reg <= TINY_F32
            nv = dict(vals)
            ng = dict(gidxs)
            npr = dict(probs)
            for lidx in dleaf:
                for slot in range(leaves[lidx].ndraw):
                    x, iy, pr = draw_leaf(lidx, rt + 1)
                    nv[(lidx, slot)] = _twhere(bad, x, vals[(lidx, slot)])
                    ng[(lidx, slot)] = jnp.where(bad, iy, gidxs[(lidx, slot)])
                    if lidx not in fleaf:
                        npr[(lidx, slot)] = jnp.where(bad, pr,
                                                      probs[(lidx, slot)])
            w2 = evals_b[0](eval_leaf_vals(nv))
            weight = wsel(bad, w2, weight)
            prob_reg = wabs(weight) * r0
            return nv, ng, npr, weight, prob_reg

        vals, gidxs, probs, weight, prob_reg = jax.lax.fori_loop(
            0, 10, retry, (vals, gidxs, probs, weight, prob_reg))

        # carry tiles must NOT be layout-replicated constants: Mosaic pins
        # a replicated layout on constant-initialized loop carries and the
        # natural-layout body output then fails relayout (verified with a
        # minimal repro).  Deriving the zeros from runtime data (the eval
        # result) is unfoldable and keeps every carry in natural layout.
        zero = (weight[0] if cplx else weight) * 0.0
        zeroi = zero.astype(i32)
        if measure_b is not None:
            mobs_ref[...] = jnp.zeros((ncomp, S, LN), f32)
            mcmp_ref[...] = jnp.zeros((ncomp, S, LN), f32)
        carry = dict(
            vals=vals, gidxs=gidxs, probs=probs,
            weight=weight, prob=prob_reg,
            curr=zeroi,                                   # integrand 0
            rcur=zero + r0,
            invr=zero + 1.0 / r0,
            degc=zero + deg_ref[0],
            picv=zero + 1.0 / (deg_ref[0] * float(C)),
            adjb=[zeroi + adjb_ref[0, w] for w in range(nwords)],
            dof=[zeroi + dof_ref[0, g] for g in range(nvar)],
            obs=([zero] * ncomp if measure_b is None else []),
            # Kahan compensation for the long-chain accumulators
            # (kahan_add docstring, pallas_chain.py); vis adds exact 1.0s
            obs_c=([zero] * ncomp if measure_b is None else []),
            nrm=zero, nrm_c=zero, vis=[zero] * nd,
            evcnt=jnp.float32(0.0),
        )

        # swap machinery only exists when some group has >1 slot; a
        # deterministic macro-unrolled swap cycle was measured SLOWER
        # (0.65 vs 0.93 G evals/s: 3x loop body -> Mosaic register
        # pressure), so the kind is a runtime scalar in a single-step loop.
        any_swap = any(spec.maxdof[g] > 1 for g in eligible_groups)

        def step(t, carry):
            vals = dict(carry["vals"])
            gidxs = dict(carry["gidxs"])
            probs = dict(carry["probs"])
            weight = carry["weight"]
            prob_reg = carry["prob"]
            curr = carry["curr"]
            rcur = carry["rcur"]
            invr = carry["invr"]
            degc = carry["degc"]
            picv = carry["picv"]
            adjb = carry["adjb"]
            dof = list(carry["dof"])

            # visited tally at step start (montecarlo.jl:137), incl burn-in
            vis = list(carry["vis"])
            for i in range(nd):
                vis[i] = vis[i] + (curr == i).astype(f32)

            # ---- per-step scalars: active sector + update kind ----
            # jt ranges over INTEGRAND sectors only; jumps into the
            # normalization sector ride every step on an independent
            # per-walker coin (see norm_prop below), so every step runs
            # exactly one integrand evaluation — none are wasted.
            jt = draw_i(t) % n
            kind_swap = ((draw_i(t) % C) == 0) if any_swap \
                else False                        # P(swap)=1/(2nvar+1)
            r_jt = rw_ref[jt]
            deg_jt = deg_ref[jt]
            adjb_jt = [adjb_ref[jt, w] for w in range(nwords)]
            dof_jt = [dof_ref[jt, g] for g in range(nvar)]

            # ---- fresh draws per (leaf, slot position) ----
            draws = {}
            shifts = {}
            for g in eligible_groups:
                for lidx in spec.group_leaves[g]:
                    for s in range(spec.maxdof[g]):
                        draws[(lidx, s)] = draw_leaf(lidx, t)
                        if lidx in fleaf:
                            shifts[(lidx, s)] = fermik_shift(
                                lidx, t, vals[(lidx, s)])

            # ---- role masks (mutually exclusive per walker) ----
            # ONE uniform drives both jump coins via disjoint intervals:
            #   u <  q_w(i)                  -> propose jump into norm
            #   u in [q_w, q_w + pi_ci)      -> propose jump to jt (if adj)
            #   u >= q_w                     -> CV/swap eligible (at jt)
            # with q_w(i) = pi_ci(i)/n and pi_ci(i) = 1/(deg_i*C).  The
            # marginal densities are then EXACTLY (1/n)*pi_ci both ways,
            # so the MH correction is the bare degree ratio deg_i/deg_j
            # (updates.jl:48) — no thinning correction factor.  The
            # (1-q_w) thinning of in-sector CV/swap cancels forward vs
            # reverse (same sector).  picv is a per-walker register
            # (picv = 1/(deg_curr*C)), updated only on accepted jumps.
            nw, nb = divmod(norm, 31)                 # static word/bit
            adjn = (adjb[nw] & np.int32(1 << nb)) != 0    # adjacent to norm
            qw = jnp.where(adjn, picv * float(1.0 / n), 0.0)
            u_role = draw_u(t)
            norm_prop = adjn & (u_role < qw)

            at_jt = (curr == jt) & (u_role >= qw)
            # bit-test via a SCALAR mask: shifting an (S,128) int tile by a
            # traced scalar amount lowers to an expensive Mosaic sequence
            # (measured ~2.3x per-step cost at nd=33 vs nd<=31); building
            # 1<<jt on the scalar core and testing with tile AND/compare
            # keeps the vector work shift-free.
            if nwords == 1:
                m0 = jnp.int32(1) << jt
                is_adj = (adjb[0] & m0) != 0
            else:                                     # jt is a traced scalar
                jl = jnp.minimum(jt, 30)
                jh = jnp.maximum(jt - 31, 0)
                lo = jt < 31
                m0 = jnp.where(lo, jnp.int32(1) << jl, jnp.int32(0))
                m1 = jnp.where(lo, jnp.int32(0), jnp.int32(1) << jh)
                is_adj = ((adjb[0] & m0) | (adjb[1] & m1)) != 0
            ci_prop = is_adj & (u_role >= qw) & (u_role < qw + picv)

            # CV/swap var-type and slot choices (updates.jl:72-147)
            if nvar == 1:
                vi = None
                dof_vi = dof[0]
            else:
                u_vi = draw_u(t)
                vi = jnp.minimum((u_vi * nvar).astype(i32), nvar - 1)
                dof_vi = zeroi
                for g in range(nvar):
                    dof_vi = jnp.where(vi == g, dof[g], dof_vi)
            dvf = dof_vi.astype(f32)
            u_s1 = draw_u(t)
            idx1 = (u_s1 * dvf).astype(i32)
            can_move = at_jt & (dof_vi > 0)
            if any_swap:
                u_s2 = draw_u(t)
                idx2 = (u_s2 * dvf).astype(i32)
                active_cv = can_move & (~kind_swap)
                active_sw = can_move & kind_swap & (idx1 != idx2)
            else:
                idx2 = None
                active_cv = can_move
                active_sw = None

            # ---- build proposed state + Hastings factors ----
            nvals = dict(vals)
            ngidxs = dict(gidxs)
            nprobs = dict(probs)
            commit = {}
            prop_cv = jnp.ones((S, LN), f32)
            prop_ci = jnp.ones((S, LN), f32)
            prop_nj = jnp.ones((S, LN), f32)
            for g in eligible_groups:
                md = spec.maxdof[g]
                dof_jt_g = dof_jt[g]
                sel_g = True if vi is None else (vi == g)
                for lidx in spec.group_leaves[g]:
                    isf = lidx in fleaf
                    # per-walker gathered swap values (masked O(md) select)
                    if any_swap and md > 1:
                        sw1v = sw2v = None
                        sw1g = sw2g = sw1p = sw2p = None
                        for s in range(md):
                            h1 = (idx1 == s)
                            h2 = (idx2 == s)
                            v, gi_ = vals[(lidx, s)], gidxs[(lidx, s)]
                            sw1v = v if sw1v is None else _twhere(h1, v, sw1v)
                            sw2v = v if sw2v is None else _twhere(h2, v, sw2v)
                            sw1g = gi_ if sw1g is None else jnp.where(h1, gi_, sw1g)
                            sw2g = gi_ if sw2g is None else jnp.where(h2, gi_, sw2g)
                            if not isf:
                                pr_ = probs[(lidx, s)]
                                sw1p = pr_ if sw1p is None else jnp.where(h1, pr_, sw1p)
                                sw2p = pr_ if sw2p is None else jnp.where(h2, pr_, sw2p)
                    for s in range(md):
                        key = (lidx, s)
                        x, iy, pr = draws[key]
                        created = ci_prop & (s >= dof[g]) & (s < dof_jt_g)
                        removed = ci_prop & (s >= dof_jt_g) & (s < dof[g])
                        nv, ngi = vals[key], gidxs[key]
                        # removal density: stored prob (cont/disc grid
                        # invariant) or recomputed shell density (FermiK,
                        # matching solvers/mcmc.py's dev_density use)
                        old_dens = (fermik_density(lidx, vals[key]) if isf
                                    else probs[key])
                        hit_cv = active_cv & sel_g & (idx1 == s)
                        if isf:
                            # changeVariable: three-way local shift
                            sv, sprop = shifts[key]
                            nv = _twhere(hit_cv, sv, nv)
                            prop_cv = jnp.where(hit_cv, prop_cv * sprop,
                                                prop_cv)
                            npr_ = None
                        else:
                            # changeVariable: fresh redraw, prop q_old/q_new
                            nv = jnp.where(hit_cv, x, nv)
                            ngi = jnp.where(hit_cv, iy, ngi)
                            npr_ = jnp.where(hit_cv, pr, probs[key])
                            prop_cv = jnp.where(
                                hit_cv, prop_cv * (probs[key] / pr), prop_cv)
                        if any_swap and md > 1:
                            # swapVariable: exchange slots idx1 <-> idx2
                            hit_s1 = active_sw & sel_g & (idx1 == s)
                            hit_s2 = active_sw & sel_g & (idx2 == s)
                            nv = _twhere(hit_s1, sw2v,
                                         _twhere(hit_s2, sw1v, nv))
                            ngi = jnp.where(hit_s1, sw2g,
                                            jnp.where(hit_s2, sw1g, ngi))
                            if not isf:
                                npr_ = jnp.where(hit_s1, sw2p,
                                                 jnp.where(hit_s2, sw1p, npr_))
                            hit_sw = hit_s1 | hit_s2
                        else:
                            hit_sw = None
                        # changeIntegrand create/remove (updates.jl:15-26)
                        nv = _twhere(created, x, nv)
                        ngi = jnp.where(created, iy, ngi)
                        if isf:
                            # fresh shell draws can be rejected (prob 0)
                            prop_ci = jnp.where(
                                created,
                                jnp.where(pr > 0.0,
                                          prop_ci / jnp.maximum(pr, TINY_F32),
                                          0.0),
                                prop_ci)
                        else:
                            npr_ = jnp.where(created, pr, npr_)
                            prop_ci = jnp.where(created, prop_ci / pr,
                                                prop_ci)
                        prop_ci = jnp.where(removed, prop_ci * old_dens,
                                            prop_ci)
                        # jump INTO norm removes every slot of curr's dof
                        removed_nj = norm_prop & (s < dof[g])
                        prop_nj = jnp.where(removed_nj,
                                            prop_nj * old_dens, prop_nj)
                        nvals[key] = nv
                        ngidxs[key] = ngi
                        if not isf:
                            nprobs[key] = npr_
                        # slots created by CI commit even on reject
                        # (sampler.jl:306: createRollback! is a no-op)
                        commit[key] = (hit_cv, hit_sw, created)

            # ---- ONE batched eval of integrand jt, every step ----
            new_w = eval_sector(jt, nvals)

            # ---- acceptance ----
            p_old = jnp.maximum(prob_reg, TINY_F32)
            p_new_mv = wabs(new_w) * rcur               # CV/swap: curr==jt
            p_new_ci = wabs(new_w) * r_jt
            r_norm = rw_ref[norm]
            # Hastings pi_ci(new)/pi_ci(old) = deg_old/deg_new — exactly
            # the reference's neighbor-count ratio (updates.jl:48); the
            # interval-coin scheme above makes both directions' densities
            # exactly (1/n)/(deg*C), no further correction.
            ratio_ci = prop_ci * (degc * f32(1.0) / deg_jt) * p_new_ci / p_old
            # jump into norm: reverse move is norm's (untinned) jt-step CI
            ratio_nj = prop_nj * (degc / deg_ref[norm]) * r_norm / p_old
            u_acc = draw_u(t)
            ratio_cv = prop_cv * p_new_mv / p_old
            acc_cv = active_cv & (u_acc < ratio_cv) & (prop_cv > TINY_F32)
            acc_mv = acc_cv
            if any_swap:
                acc_sw = active_sw & (u_acc < p_new_mv / p_old)
                acc_mv = acc_cv | acc_sw
            else:
                acc_sw = None
            acc_ci = ci_prop & (u_acc < ratio_ci) & (prop_ci > TINY_F32)
            acc_nj = norm_prop & (u_acc < ratio_nj)

            # ---- full (kind, sector, target) tallies, subsampled ----
            # (configuration.jl:345-465; curr is still pre-commit here.)
            # CI targets the step's scalar sector jt (or norm), CV/swap
            # happen only at curr == jt, so one masked reduction per source
            # sector covers the whole pair table.
            @pl.when((t % TALLY_EVERY) == 0)
            def _():
                def sred(m):
                    return jnp.sum(jnp.sum(
                        m.astype(f32), axis=1, keepdims=True)) \
                        * float(TALLY_EVERY)

                for i in range(nd):
                    seli = (curr == i)
                    pcf_ref[0 * nd + i, jt] += sred(ci_prop & seli)
                    acf_ref[0 * nd + i, jt] += sred(acc_ci & seli)
                    if i != norm:
                        pcf_ref[0 * nd + i, norm] += sred(norm_prop & seli)
                        acf_ref[0 * nd + i, norm] += sred(acc_nj & seli)
                for g in range(nvar):
                    selg = True if vi is None else (vi == g)
                    pcf_ref[1 * nd + jt, g] += sred(active_cv & selg)
                    acf_ref[1 * nd + jt, g] += sred(acc_cv & selg)
                    if any_swap:
                        pcf_ref[2 * nd + jt, g] += sred(active_sw & selg)
                        acf_ref[2 * nd + jt, g] += sred(acc_sw & selg)

            # ---- commit ----
            for key in vals:
                hit_cv, hit_sw, created = commit.get(
                    key, (None, None, None))
                take = created
                if hit_cv is not None:
                    take = (acc_cv & hit_cv) | take
                if hit_sw is not None:
                    take = (acc_sw & hit_sw) | take
                if take is None:
                    continue
                vals[key] = _twhere(take, nvals[key], vals[key])
                gidxs[key] = jnp.where(take, ngidxs[key], gidxs[key])
                if key in probs:
                    probs[key] = jnp.where(take, nprobs[key], probs[key])
            weight = wsel(acc_mv | acc_ci, new_w,
                          wsel(acc_nj, wzero_like(weight), weight))
            prob_reg = jnp.where(acc_mv, p_new_mv,
                                 jnp.where(acc_ci, p_new_ci,
                                           jnp.where(acc_nj, r_norm,
                                                     prob_reg)))
            curr = jnp.where(acc_ci, jt, jnp.where(acc_nj, norm, curr))
            rcur = jnp.where(acc_ci, r_jt, jnp.where(acc_nj, r_norm, rcur))
            invr = jnp.where(acc_ci, 1.0 / r_jt,
                             jnp.where(acc_nj, 1.0 / r_norm, invr))
            degc = jnp.where(acc_ci, deg_jt,
                             jnp.where(acc_nj, deg_ref[norm], degc))
            picv = jnp.where(acc_ci, 1.0 / (deg_jt * float(C)),
                             jnp.where(acc_nj,
                                       1.0 / (deg_ref[norm] * float(C)),
                                       picv))
            adjb = [jnp.where(acc_ci, adjb_jt[w],
                              jnp.where(acc_nj, adjb_ref[norm, w], adjb[w]))
                    for w in range(nwords)]
            for g in range(nvar):
                dof[g] = jnp.where(acc_ci, dof_jt[g],
                                   jnp.where(acc_nj, 0, dof[g]))

            # ---- measurement (montecarlo.jl:145-170) ----
            measured = (t >= nburnin) & (((t - nburnin) % mf) == 0)
            mw = jnp.where(measured, 1.0, 0.0).astype(f32)
            in_norm = (curr == norm)
            obs = list(carry["obs"])
            obs_c = list(carry["obs_c"])
            if measure_b is None:
                # weight/probability = sign(weight)/reweight[curr]
                # (montecarlo.jl:160-170); norm walkers: weight 0 -> sign 0
                if cplx:
                    # complex sign = phase w/|w| (|w|=0 in the norm sector)
                    absw = wabs(weight)
                    inv_abs = jnp.where(absw > TINY_F32,
                                        1.0 / jnp.maximum(absw, TINY_F32),
                                        0.0)
                    c_re = weight[0] * inv_abs * invr * mw
                    c_im = weight[1] * inv_abs * invr * mw
                    for i in range(n):
                        sel = (curr == i)
                        obs[2 * i], obs_c[2 * i] = kahan_add(
                            obs[2 * i], obs_c[2 * i],
                            jnp.where(sel, c_re, 0.0))
                        obs[2 * i + 1], obs_c[2 * i + 1] = kahan_add(
                            obs[2 * i + 1], obs_c[2 * i + 1],
                            jnp.where(sel, c_im, 0.0))
                else:
                    contrib = jnp.sign(weight) * invr * mw
                    for i in range(n):
                        obs[i], obs_c[i] = kahan_add(
                            obs[i], obs_c[i],
                            jnp.where(curr == i, contrib, 0.0))
            else:
                # custom measure: batched per-sector eval masked by
                # curr == i, accumulated in VMEM scratch only at measured
                # steps (`measured` is a scalar: untaken bodies are free)
                @pl.when(measured)
                def _():
                    ok = (~in_norm) & (prob_reg > TINY_F32)
                    invp = jnp.where(
                        ok, 1.0 / jnp.where(ok, prob_reg, 1.0), 0.0)
                    if cplx:
                        # complex relw rides as an (re, im) pair into the
                        # realified measure (make_measure_batched_idx_pairs)
                        relw = (weight[0] * invp, weight[1] * invp)
                    else:
                        relw = weight * invp
                    leaf_vals = eval_leaf_vals(vals)
                    for i in range(n):
                        sel = (curr == i)
                        ct = measure_b[i](leaf_vals, relw)
                        k = 0
                        def _kadd_ref(k, inc):
                            s, cmp_ = mobs_ref[k, :, :], mcmp_ref[k, :, :]
                            t2, c2 = kahan_add(s, cmp_, inc)
                            mobs_ref[k, :, :] = t2
                            mcmp_ref[k, :, :] = c2

                        for leafv, shape in zip(
                                jax.tree_util.tree_leaves(ct), comp_shapes):
                            if shape == ():
                                _kadd_ref(k, jnp.where(sel, leafv, 0.0))
                                k += 1
                            else:
                                for idxs in np.ndindex(shape):
                                    _kadd_ref(k, jnp.where(sel, leafv[idxs],
                                                           0.0))
                                    k += 1
            nrm, nrm_c = kahan_add(
                carry["nrm"], carry["nrm_c"],
                jnp.where(in_norm, 1.0 / rw_ref[norm], 0.0) * mw)

            # ---- histogram: 1.0 per used slot, subsampled x hk ----
            @pl.when(measured & ((((t - nburnin) // mf) % hk) == 0))
            def _():
                for lidx in adapt_leaves:
                    li = leaves[lidx]
                    g = li.group
                    for s in range(li.ndraw):
                        wgt = ((s < dof[g]) & (~in_norm)).astype(f32) \
                            * float(hk)
                        h2 = scatter_hist(lidx, gidxs[(lidx, s)], wgt)
                        hist_refs[lidx][:, :] += h2

            evcnt = carry["evcnt"] + 1.0   # every step evaluates once
            return dict(vals=vals, gidxs=gidxs, probs=probs,
                        weight=weight, prob=prob_reg, curr=curr,
                        rcur=rcur, invr=invr, degc=degc, picv=picv,
                        adjb=adjb, dof=dof,
                        obs=obs, obs_c=obs_c, nrm=nrm, nrm_c=nrm_c,
                        vis=vis, evcnt=evcnt)

        carry = jax.lax.fori_loop(0, ntot, step, carry)

        def red(x):
            return jnp.sum(jnp.sum(x, axis=1, keepdims=True))

        first = (b == 0) & (wt == 0)

        @pl.when(wt == 0)
        def _():
            for i in range(ncomp):
                obs_ref[b, i] = 0.0
            norm_ref[b, 0] = 0.0

        @pl.when(first)
        def _():
            for i in range(nd):
                vis_ref[0, i] = 0.0
            ev_ref[0, 0] = 0.0

        if measure_b is None:
            for i in range(ncomp):
                obs_ref[b, i] += red(carry["obs"][i])
        else:
            for i in range(ncomp):
                obs_ref[b, i] += red(mobs_ref[i, :, :])
        norm_ref[b, 0] += red(carry["nrm"])
        for i in range(nd):
            vis_ref[0, i] += red(carry["vis"][i])
        # eval-step count only (x NF on the host: f32 stays exact —
        # per-instance step counts are < 2^24)
        ev_ref[0, 0] += carry["evcnt"]

    # host-chosen odd multipliers (coprime to power-of-two ninc)
    host_rng = np.random.default_rng(spec.cfg.seed + 4321)
    a_np = np.zeros((max(len(cleaf), 1), N_LATTICE), np.int32)
    for kk, lidx in enumerate(cleaf):
        ninc = leaves[lidx].leaf.ninc
        a_np[kk] = host_rng.integers(0, max(ninc // 2, 1),
                                     N_LATTICE) * 2 + 1

    def run_all(params, kd):
        B = block
        ins = [jnp.asarray(a_np)]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),   # kd [B*wtiles, 2]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # reweight [nd]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # deg [nd]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # adjbits [nd]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dof [nd, nvar]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # atab
        ]
        for kk, lidx in enumerate(cleaf):
            L = level_size(leaves[lidx].leaf.ninc)
            ninc = leaves[lidx].leaf.ninc
            flat = params["leaf"][lidx]["tab"].reshape(L * L, 2)
            i_all = jnp.arange(NF)
            rows_g, rows_i = [], []
            for r in range(N_LATTICE):
                idx = (int(a_np[kk, r]) * i_all) % ninc
                rows_g.append(flat[idx, 0].reshape(S, LN))
                rows_i.append(flat[idx, 1].reshape(S, LN))
            ins += [jnp.concatenate(rows_g, axis=0),
                    jnp.concatenate(rows_i, axis=0)]
            in_specs += [pl.BlockSpec((N_LATTICE * S, LN),
                                      lambda bb, tt: (0, 0),
                                      memory_space=pltpu.VMEM)] * 2
        for lidx in xleaf:
            cdf = params["leaf"][lidx]["cdf"].astype(jnp.float32)
            if lidx in xleaf_wide:
                nbin = leaves[lidx].leaf.nbin
                ccdf, cf, df = wide_discrete_tables(cdf, nbin)
                nblk = -(-nbin // DISC_BLK)
                ins += [ccdf, cf, df]
                in_specs += [
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((nblk, DISC_BLK), lambda bb, tt: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk, DISC_BLK), lambda bb, tt: (0, 0),
                                 memory_space=pltpu.VMEM),
                ]
            else:
                dist = cdf[1:] - cdf[:-1]
                ins += [cdf, dist]
                in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2

        rw = params["reweight"].astype(jnp.float32)
        out_shape = ([jax.ShapeDtypeStruct((B, ncomp), f32),
                      jax.ShapeDtypeStruct((B, 1), f32),
                      jax.ShapeDtypeStruct((1, nd), f32),
                      jax.ShapeDtypeStruct((3 * nd, ncol_t), f32),
                      jax.ShapeDtypeStruct((3 * nd, ncol_t), f32),
                      jax.ShapeDtypeStruct((1, 1), f32)]
                     + [jax.ShapeDtypeStruct((Ls[l], Ls[l]), f32)
                        for l in adapt_leaves])
        out_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 6
                     + [pl.BlockSpec((Ls[l], Ls[l]), lambda bb, tt: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for l in adapt_leaves])
        scratch = [pltpu.VMEM((2, S, LN) if cplx else (S, LN), f32)]
        if measure_b is not None:
            scratch.append(pltpu.VMEM((ncomp, S, LN), f32))
            scratch.append(pltpu.VMEM((ncomp, S, LN), f32))  # Kahan comp

        outs = pl.pallas_call(
            kernel,
            grid=(B, wtiles),
            in_specs=in_specs,
            out_shape=out_shape,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=pltpu.InterpretParams() if interpret else False,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(kd, rw, jnp.asarray(deg_np), jnp.asarray(adjb_np),
          jnp.asarray(dof_np), *ins)

        obs_b = outs[0]
        if measure_b is not None:
            # rebuild the observable pytree with leading [block] axis;
            # complex proto leaves recombine their re/im component groups
            # as encode_complex marker dicts (the axon TPU runtime cannot
            # emit complex jit outputs — engine.py), decoded by
            # decode_complex_numpy in MCMCIteration.run
            from ..solvers.engine import _CPLX_IM, _CPLX_RE

            cols, k = [], 0
            for shape, iscpx in comp_infos:
                m = max(int(np.prod(shape)), 1)
                if iscpx:
                    re = obs_b[:, k:k + m].reshape((B,) + shape)
                    im = obs_b[:, k + m:k + 2 * m].reshape((B,) + shape)
                    cols.append({_CPLX_RE: re, _CPLX_IM: im})
                    k += 2 * m
                else:
                    cols.append(obs_b[:, k:k + m].reshape((B,) + shape))
                    k += m
            obs_b = jax.tree_util.tree_unflatten(proto_def, cols)
        norm_b = outs[1][:, 0]
        visited = outs[2][0]
        pc = outs[3].reshape(3, nd, ncol_t)
        ac = outs[4].reshape(3, nd, ncol_t)
        evals = outs[5][0, 0] * float(NF)
        hist_out = {l: h for l, h in zip(adapt_leaves, outs[6:])}
        hists = []
        for lidx, li in enumerate(leaves):
            if lidx in hist_out:
                hists.append(hist_out[lidx].reshape(-1))
            else:
                hists.append(jnp.zeros(padded_hist_size(li.nhist), f32))
        return obs_b, norm_b, visited, hists, pc, ac, evals

    return run_all
