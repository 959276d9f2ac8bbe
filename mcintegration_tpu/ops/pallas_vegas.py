"""Fused stratified-Vegas Pallas kernel — the TPU hot path of the :vegas solver.

Replaces the XLA ``run_block`` pipeline of ``solvers/vegas.py`` with ONE
Mosaic kernel per (block, chunk) grid step that keeps the entire sample
pipeline in VMEM:

    hardware PRNG -> strata permutation -> one-hot Vegas-map lookup (MXU)
    -> x = g + dy*inc -> user integrand (traced inside the kernel)
    -> obs reduction + histogram scatter (MXU one-hot outer product)

Wins vs the XLA path (same algorithm, solvers/vegas.py docstring):

- ``pltpu.prng_random_bits`` (hardware RNG) replaces Threefry — an order of
  magnitude fewer VPU ops per uniform, the dominant per-sample cost of the
  2-D pi benchmark;
- zero HBM round-trips inside a chunk: every fusion boundary of the XLA
  scan-of-chunks (carry materialization, vmap-over-blocks batching) is gone;
- the histogram un-permute is free: scattering the per-stratum row back to
  natural bin order reuses the SAME one-hot factors built for the lookup,
  ``hist += (oh_hi * row)^T @ oh_lo`` (a bijection, hence exact — cf.
  ops/lookup.py:onehot_accumulate).

Numerical contract: identical estimator semantics to the XLA path
(vegas/montecarlo.jl:117-185 — obs[i] += w_i*pad_i*jac, histogram weight
(|w_i| jac)^2, stratified variance reduction), but a different (hardware)
random stream, so results agree statistically, not bit-exactly.  Runs are
reproducible for a fixed seed on the same backend.

Eligibility (checked by solvers/vegas.py, which falls back to XLA):
every drawn leaf Continuous + stratifiable with one shared bin count,
measurefreq=1, real weights, modest VMEM footprint.  Real custom
measures run in-kernel (round 5): one batched measure call per chunk on
the relative weights w_i*pad_i*jac, components Kahan-accumulated in
SMEM with padded strata rows masked out; complex observable components
stay on the XLA path.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, List

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lookup import level_size

_N_MULT = 64  # multiplier-table width, matches solvers/vegas.py


def _mix32(x):
    """lowbias32 avalanche mixer (32-bit finalizer), uint32 in/out."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _make_rng(kd_ref, b, t, interpret: bool):
    """Per-kernel-instance random-bits source.

    Hardware path: the TPU per-core PRNG (pltpu.prng_seed/prng_random_bits)
    — the main throughput win over Threefry.  Interpret path (CPU tests):
    the TPU interpreter stubs prng_random_bits to zeros, so substitute a
    counter-hash generator (lowbias32 over a per-draw keyed counter), which
    exercises every other line of the kernel with statistically sound bits.
    """
    if not interpret:
        # hardware seeder takes at most 2 words: fold the chunk id into one
        tm = _mix32(t.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        pltpu.prng_seed(kd_ref[b, 0] ^ tm, kd_ref[b, 1])
        return pltpu.prng_random_bits  # int32 on hardware
    k1 = _mix32(kd_ref[b, 0]
                ^ (t.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)))
    k2 = _mix32(kd_ref[b, 1] + t.astype(jnp.uint32))
    ctr = [0]

    def rand_bits(shape):
        ctr[0] += 1
        idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
               * jnp.uint32(shape[1])
               + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        u = _mix32(_mix32(idx ^ k1) + k2
                   + jnp.uint32((ctr[0] * 0x85EBCA6B) & 0xFFFFFFFF))
        return jax.lax.bitcast_convert_type(u, jnp.int32)

    return rand_bits


def build_view(spec):
    """User-facing variable view over batched [ndraw, ...tile] leaf values.

    Mirrors Spec.view (solvers/engine.py) but for batched arrays inside a
    Mosaic kernel: offset (user-pinned) slots are prepended as broadcast
    constants; CompositeVar groups become tuples of member views.
    """
    from ..models.variable import CompositeVar

    def _view(leaf_vals):
        views = []
        for gi, v in enumerate(spec.cfg.var):
            member_views = []
            for lidx in spec.group_leaves[gi]:
                li = spec.leaves[lidx]
                drawn = leaf_vals[lidx]
                if li.offset > 0:
                    # fixed slots as SCALAR fills, never array constants:
                    # pallas_call rejects captured array constants in the
                    # kernel body (found by tests/test_fuzz.py)
                    fv = np.asarray(li.leaf.fixed_values()[: li.offset])
                    tiles = []
                    for k in range(li.offset):
                        if fv.ndim == 1:
                            tiles.append(jnp.full(
                                (1,) + drawn.shape[1:], fv[k].item(),
                                drawn.dtype))
                        else:           # FermiK: one fill per component
                            tiles.append(jnp.concatenate(
                                [jnp.full((1, 1) + drawn.shape[2:],
                                          fv[k, d].item(), drawn.dtype)
                                 for d in range(fv.shape[1])], axis=1))
                    full = jnp.concatenate(tiles + [drawn], axis=0)
                else:
                    full = drawn
                member_views.append(full)
            views.append(tuple(member_views)
                         if isinstance(spec.cfg.var[gi], CompositeVar)
                         else member_views[0])
        return views[0] if len(views) == 1 else tuple(views)

    return _view


def make_eval_batched(spec, integrand, inplace, weight_dtype):
    """Batched integrand eval on [ndraw, NP, m] leaf values.

    The XLA path vmaps the integrand per sample; inside a Mosaic kernel that
    vmap inserts relayout copies per op (measured: 67MB VMEM stack, ~3x
    slower).  Reference-style integrands are elementwise in the sample axes,
    so calling them once on batched arrays is equivalent — and
    solvers/vegas.py verifies that equivalence numerically at build time,
    falling back to the XLA path on any mismatch.
    """
    from ..solvers.engine import WeightBuffer, _finite_guard

    uc = spec.uconfig
    n = spec.N
    _view = build_view(spec)

    def _eval(leaf_vals):
        v = _view(leaf_vals)
        shape = leaf_vals[0].shape[1:]
        if inplace:
            buf = WeightBuffer(n, weight_dtype)
            integrand(v, buf, uc)
            ws = [buf[i] for i in range(n)]
        else:
            w = integrand(v, uc)
            ws = list(w) if isinstance(w, (tuple, list)) else [w]
            if len(ws) == 1 and n > 1:
                ws = [ws[0][i] for i in range(n)]
        assert len(ws) == n, f"integrand returned {len(ws)} weights, want {n}"
        out = [jnp.broadcast_to(jnp.asarray(wi, weight_dtype), shape)
               for wi in ws]
        return [_finite_guard(wi) for wi in out]

    return _eval


def make_eval_batched_pairs(spec, integrand, inplace):
    """Batched complex integrand eval as (re, im) float32 pairs.

    Wraps :func:`make_eval_batched` at complex64 with the realify
    transform (ops/realify.py) so every complex intermediate evaluates as
    an (re, im) f32 pair — the form Mosaic kernels can run (no complex
    element type on TPU cores).  Returns f(leaf_vals) -> list of n
    (re, im) tuples.  Raises RealifyError at trace time for complex
    primitives without a rewrite rule (callers fall back to XLA).
    """
    from .realify import realify

    base = make_eval_batched(spec, integrand, inplace, jnp.complex64)
    lifted = realify(lambda *leaf_vals: tuple(base(list(leaf_vals))))

    def _eval(leaf_vals):
        return list(lifted(*leaf_vals))

    return _eval


def validate_batched_pairs(spec, eval_pairs, eval_fn) -> bool:
    """Prove realified pair eval == complex vmapped eval (else: XLA)."""
    try:
        from ..models.variable import Discrete

        rng = np.random.default_rng(12345)
        leaf_vals = []
        for li in spec.leaves:
            if isinstance(li.leaf, Discrete):
                v = rng.integers(li.leaf.lower, li.leaf.upper + 1,
                                 (li.ndraw, 4, 2))
                leaf_vals.append(jnp.asarray(v, jnp.int32))
                continue
            lo = float(getattr(li.leaf, "lower", 0.0))
            rg = float(getattr(li.leaf, "range", 1.0))
            u = rng.uniform(0.05, 0.95, (li.ndraw, 4, 2))
            leaf_vals.append(jnp.asarray(lo + rg * u, jnp.float32))

        def per_sample(vals):
            return eval_fn([{"val": v} for v in vals])

        @jax.jit
        def probe(leaf_vals):
            pairs = eval_pairs(leaf_vals)
            wv = jax.vmap(jax.vmap(per_sample, in_axes=-1, out_axes=-1),
                          in_axes=-1, out_axes=-1)(leaf_vals)
            oks = []
            for i, p in enumerate(pairs):
                re, im = p if isinstance(p, tuple) else (p, jnp.zeros_like(p))
                oks.append(jnp.allclose(re, jnp.real(wv[i]),
                                        rtol=1e-5, atol=1e-6))
                oks.append(jnp.allclose(im, jnp.imag(wv[i]),
                                        rtol=1e-5, atol=1e-6))
            return jnp.all(jnp.stack(oks))

        return bool(probe(leaf_vals))
    except Exception:
        return False


def validate_batched(spec, eval_batched, eval_fn) -> bool:
    """Prove batched eval == per-sample vmapped eval on random points.

    Evaluates both on a tiny in-domain batch; any numerical mismatch
    (i.e. an integrand that is NOT elementwise across samples) disables the
    Pallas fast path.  The whole probe is ONE jitted program: on a remote
    TPU runtime every eager op would otherwise be its own compile+dispatch
    round-trip (measured ~12 s of build time through the axon tunnel).
    """
    try:
        from ..models.variable import Discrete

        rng = np.random.default_rng(12345)
        leaf_vals = []
        for li in spec.leaves:
            if isinstance(li.leaf, Discrete):
                v = rng.integers(li.leaf.lower, li.leaf.upper + 1,
                                 (li.ndraw, 4, 2))
                leaf_vals.append(jnp.asarray(v, jnp.int32))
                continue
            lo = float(getattr(li.leaf, "lower", 0.0))
            rg = float(getattr(li.leaf, "range", 1.0))
            u = rng.uniform(0.05, 0.95, (li.ndraw, 4, 2))
            leaf_vals.append(jnp.asarray(lo + rg * u, jnp.float32))

        def per_sample(vals):
            return eval_fn([{"val": v} for v in vals])

        @jax.jit
        def probe(leaf_vals):
            wb = jnp.stack(eval_batched(leaf_vals))
            wv = jax.vmap(jax.vmap(per_sample, in_axes=-1, out_axes=-1),
                          in_axes=-1, out_axes=-1)(leaf_vals)
            return jnp.allclose(wb, wv, rtol=1e-5, atol=1e-6)

        return bool(probe(leaf_vals))
    except Exception:
        return False


def pick_m_tile(spec, nb: int, m_avail: int) -> int:
    """Samples-per-stratum per kernel instance: the largest lane-aligned
    tile whose working set fits comfortably in VMEM (bigger tiles amortize
    the per-chunk permutation/lookup fixed cost)."""
    np_pad = level_size(nb) ** 2
    nslots = sum(li.ndraw for li in spec.leaves)
    live_per_m = (nslots + spec.N + 6) * np_pad * 4
    m = 128
    while m * 2 <= min(2048, m_avail) and live_per_m * m * 2 <= 44 * 2 ** 20:
        m *= 2
    return min(m, max(1, m_avail)) if m_avail < 128 else m


def eligible(spec, plans, *, measure, measurefreq, weight_dtype,
             m_tile_cap=128, why=None, obs_proto=None) -> bool:
    """Can the Pallas fast path run this spec? (conservative static checks)

    ``why``: optional list; on a False return, a one-line human-readable
    reason is appended (surfaced as ``Result.backend_reason``)."""
    def no(reason):
        if why is not None:
            why.append(reason)
        return False

    if measurefreq != 1:
        return no(f"measurefreq={measurefreq} != 1 runs on the XLA path")
    # kernel accumulators (obs SMEM rows, Kahan compensation, histograms)
    # are float32; any other weight dtype must take the XLA path
    if weight_dtype != jnp.float32:
        return no(f"weight dtype {jnp.dtype(weight_dtype).name} (kernel "
                  "accumulators are float32; complex :vegas runs on XLA)")
    if measure is not None:
        # real custom measures run in-kernel (round 5, same machinery as
        # the chain kernel); complex observable components stay on XLA
        from .pallas_chain import MAX_MEASURE_COMPONENTS, obs_components
        import jax.tree_util as jtu

        if any(np.iscomplexobj(x) for x in jtu.tree_leaves(obs_proto)):
            return no("complex measure observables run on the XLA path")
        ncomp = obs_components(obs_proto)
        if ncomp > MAX_MEASURE_COMPONENTS:
            return no(f"{ncomp} observable components > "
                      f"{MAX_MEASURE_COMPONENTS} (accumulator budget)")
    drawn = [(li, plan) for li, plan in zip(spec.leaves, plans) if li.ndraw > 0]
    if not drawn:
        return no("no MC-owned slots to draw")
    if any(plan is None for _, plan in drawn):
        return no("a drawn pool has no stratified sampling plan "
                  "(Discrete/FermiK pools run on the XLA :vegas path)")
    nbs = {plan["nb"] for _, plan in drawn}
    if len(nbs) != 1:
        return no("drawn pools have mismatched strata counts")
    nb = nbs.pop()
    if nb > 32768:  # int32 overflow guard for a*b+s
        return no(f"strata count {nb} > 32768 (int32 lattice overflow guard)")
    l = level_size(nb)
    np_pad = l * l
    nslots = sum(li.ndraw for li, _ in drawn)
    # rough VMEM bound: per-slot x + per-integrand w + scratch headroom
    live = (nslots + spec.N + 6) * np_pad * m_tile_cap * 4
    if live > 12 * 1024 * 1024:
        return no(f"working set ~{live // (1024 * 1024)} MiB exceeds the "
                  "12 MiB VMEM budget")
    return True


def build_run_all(spec, plans, eval_batched: Callable, *, nchunks: int,
                  m_tile: int, interpret: bool = False,
                  measure_b=None, obs_proto=None):
    """Return run_all(params, kd[B,2] uint32) -> (obs [B,N], norm [B], hists).

    Drop-in replacement for the XLA run_all of VegasIteration (same output
    contract: per-block obs/norm, per-leaf padded 1-D histograms summed over
    blocks).
    """
    n = spec.N
    leaves = spec.leaves
    # drawn strata leaves in kernel order; (leaf index, slot) per kernel slot
    dleaf = [i for i, li in enumerate(leaves) if li.ndraw > 0]
    slot_map = [(lidx, s) for lidx in dleaf for s in range(leaves[lidx].ndraw)]
    nslots = len(slot_map)
    nb = plans[dleaf[0]]["nb"]
    L = level_size(nb)
    NP = L * L
    used = np.asarray(spec.mask_used)[:n]            # [n, nvar, mm] static
    adapt_leaves = [i for i in dleaf if getattr(leaves[i].leaf, "adapt", False)]
    f32 = jnp.float32

    # flattened observable components (custom measure path, real-only —
    # complex obs are gated to XLA by eligible())
    if measure_b is not None:
        proto_leaves, proto_def = jax.tree_util.tree_flatten(obs_proto)
        comp_shapes = [np.shape(x) for x in proto_leaves]
        ncomp = sum(max(int(np.prod(s)), 1) for s in comp_shapes)
    else:
        ncomp = n

    # per-kernel-slot multiplier tables, stacked [nslots, N_MULT]
    a_tab_np = np.stack([np.asarray(plans[lidx]["a_tab"])[s]
                         for (lidx, s) in slot_map]).astype(np.int32)

    def kernel(kd_ref, atab_ref, *refs):
        # refs = pg_0, pi_0, ..., pg_{nleaf-1}, pi_{nleaf-1},
        #        obs_ref, hist_ref_0, ... (adapt leaves only), comp scratch
        pg_refs = {lidx: refs[2 * k] for k, lidx in enumerate(dleaf)}
        pi_refs = {lidx: refs[2 * k + 1] for k, lidx in enumerate(dleaf)}
        obs_ref = refs[2 * len(dleaf)]
        hist_refs = {lidx: refs[2 * len(dleaf) + 1 + k]
                     for k, lidx in enumerate(adapt_leaves)}
        comp_ref = refs[-1]    # SMEM scratch [B, n]: Kahan compensation

        b = pl.program_id(0)
        t = pl.program_id(1)
        rand_bits = _make_rng(kd_ref, b, t, interpret)

        iota_np = jax.lax.broadcasted_iota(jnp.int32, (NP, 1), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (NP, L), 1)
        rowmask = (iota_np < nb).astype(f32)                     # [NP,1]

        # ---- per-slot stratified draw through the learned map ----
        xs = {}        # (lidx, slot) -> x [NP, m]
        invp = {}      # (lidx, slot) -> 1/prob = nb*inc [NP, 1]
        ohs = {}       # (lidx, slot) -> (oh_hi, oh_lo) for the hist scatter
        for k, (lidx, slot) in enumerate(slot_map):
            sb = rand_bits((1, 1))
            jb = rand_bits((1, 1))
            s = (sb[0, 0] & jnp.int32(0x7FFFFFFF)) % nb
            j = (jb[0, 0] & jnp.int32(0x7FFFFFFF)) % _N_MULT
            a = atab_ref[k, j]
            perm = (a * iota_np + s) % nb                        # [NP,1]
            hi = perm // L
            lo = perm - hi * L
            oh_hi = (hi == iota_l).astype(f32)                   # [NP,L]
            oh_lo = (lo == iota_l).astype(f32)
            # HIGHEST precision: the default bf16 MXU pass rounds grid
            # points by up to ~0.4% (+-2 bins!), biasing the estimator
            tmp_g = jnp.dot(oh_hi, pg_refs[lidx][:, :],
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)  # [NP,L]
            tmp_i = jnp.dot(oh_hi, pi_refs[lidx][:, :],
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
            pg = jnp.sum(oh_lo * tmp_g, axis=1, keepdims=True)   # [NP,1]
            pi = jnp.sum(oh_lo * tmp_i, axis=1, keepdims=True)
            bits = rand_bits((NP, m_tile))
            # 24 random low bits as nonnegative int32 (Mosaic has no
            # uint32->f32 cast); midpoint offset keeps dy inside (0, 1)
            b24 = bits & jnp.int32(0x00FFFFFF)
            dy = (b24.astype(f32) + 0.5) * f32(2.0 ** -24)
            xs[(lidx, slot)] = pg + dy * pi                      # [NP,m]
            invp[(lidx, slot)] = nb * pi
            ohs[(lidx, slot)] = (oh_hi, oh_lo)

        # ---- jacobian and per-(group,slot) probabilities ----
        jac = None
        for k in xs:
            jac = invp[k] if jac is None else jac * invp[k]      # [NP,1]
        gprob = {}
        for gi in range(spec.nvar):
            for slot in range(spec.maxdof[gi]):
                p = None
                for lidx in spec.group_leaves[gi]:
                    q = 1.0 / invp[(lidx, slot)]
                    p = q if p is None else p * q
                gprob[(gi, slot)] = p

        # ---- user integrand, batched over (strata, samples) ----
        leaf_vals = []
        for lidx, li in enumerate(leaves):
            if li.ndraw > 0:
                leaf_vals.append(jnp.stack(
                    [xs[(lidx, s)] for s in range(li.ndraw)], axis=0))
            else:
                leaf_vals.append(jnp.zeros((0, NP, m_tile), f32))

        weights = eval_batched(leaf_vals)   # list of n arrays [NP, m]

        # ---- obs[i] += w_i * padding_i * jac (montecarlo.jl:148-165) ----
        # obs lives in SMEM (scalar accumulators, dynamic row = block id)
        @pl.when(t == 0)
        def _():
            for i in range(ncomp):
                obs_ref[b, i] = 0.0
                comp_ref[b, i] = 0.0

        def kadd_smem(i, contrib):
            # Kahan across chunks: one heavy-tailed sample (singular
            # integrands) would otherwise absorb every later chunk's sum
            # (the XLA path uses ops/ksum.py for the same reason)
            y = contrib - comp_ref[b, i]
            tt = obs_ref[b, i] + y
            comp_ref[b, i] = (tt - obs_ref[b, i]) - y
            obs_ref[b, i] = tt

        factors = []
        for i in range(n):
            factor = jac * rowmask
            if not spec.pad_trivial[i]:
                for gi in range(spec.nvar):
                    for slot in range(spec.cfg.dof[i][gi], spec.maxdof[gi]):
                        factor = factor * gprob[(gi, slot)]
            factors.append(factor)

        if measure_b is None:
            for i in range(n):
                # staged reduction: row sums first, then across strata —
                # a flat f32 sum over ~1M elements accumulates O(sqrt(N)
                # ulp) rounding bias (measured -7e-5 at m_tile=1024)
                rowsum = jnp.sum(weights[i] * factors[i], axis=1,
                                 keepdims=True)
                kadd_smem(i, jnp.sum(rowsum))
        else:
            # custom measure (round 5): one batched call per chunk on the
            # relative weights w_i * pad_i * jac; padded strata rows are
            # masked out of every component (a real sample never sits
            # there, so even relw-independent measure terms stay exact)
            relws = [weights[i] * factors[i] for i in range(n)]
            contrib_tree = measure_b(leaf_vals, relws)
            k = 0
            for leafv, shape in zip(
                    jax.tree_util.tree_leaves(contrib_tree), comp_shapes):
                comps = ([leafv] if shape == () else
                         [leafv[idxs] for idxs in np.ndindex(shape)])
                for comp in comps:
                    rowsum = jnp.sum(comp * rowmask, axis=1, keepdims=True)
                    kadd_smem(k, jnp.sum(rowsum))
                    k += 1

        # ---- histograms: slot weight (|w_i| jac)^2 summed over users ----
        if adapt_leaves:
            wj2 = [jnp.minimum(jnp.abs(w) * jac, 1e17) ** 2 for w in weights]

            @pl.when((b == 0) & (t == 0))
            def _():
                for lidx in adapt_leaves:
                    hist_refs[lidx][:, :] = jnp.zeros((L, L), f32)

            for lidx in adapt_leaves:
                li = leaves[lidx]
                for slot in range(li.ndraw):
                    mask = used[:, li.group, slot]               # [n] static
                    if not mask.any():
                        continue
                    sw = None
                    for i in range(n):
                        if mask[i]:
                            sw = wj2[i] if sw is None else sw + wj2[i]
                    row = jnp.sum(sw, axis=1, keepdims=True) * rowmask
                    oh_hi, oh_lo = ohs[(lidx, slot)]
                    # scatter by perm: hist[perm_p] += row_p, via the SAME
                    # one-hots (bijection => exact; cf. onehot_accumulate)
                    h2 = jax.lax.dot_general(
                        oh_hi * row, oh_lo, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)     # [L,L]
                    hist_refs[lidx][:, :] += h2

    grid = None  # set in run_all (B from input shape)

    def run_all(params, kd):
        B = kd.shape[0]
        # unpack the packed [L, L*2] tables into (pg, pi) [L, L] pairs
        tabs = []
        for lidx in dleaf:
            tab = params["leaf"][lidx]["tab"].reshape(L, L, 2)
            tabs += [tab[..., 0], tab[..., 1]]
        atab = jnp.asarray(a_tab_np)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),               # kd [B,2]
            pl.BlockSpec(memory_space=pltpu.SMEM),               # atab
        ] + [pl.BlockSpec((L, L), lambda bb, tt: (0, 0),
                          memory_space=pltpu.VMEM)] * (2 * len(dleaf))
        out_shape = [jax.ShapeDtypeStruct((B, ncomp), jnp.float32)] + [
            jax.ShapeDtypeStruct((L, L), jnp.float32) for _ in adapt_leaves]
        out_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
            pl.BlockSpec((L, L), lambda bb, tt: (0, 0),
                         memory_space=pltpu.VMEM)] * len(adapt_leaves)

        outs = pl.pallas_call(
            kernel,
            grid=(B, nchunks),
            in_specs=in_specs,
            out_shape=out_shape,
            out_specs=out_specs,
            scratch_shapes=[pltpu.SMEM((B, ncomp), jnp.float32)],
            # CPU tests run under the TPU-semantics interpreter
            # (InterpretParams).  That interpreter executes through host
            # callbacks, which DEADLOCK under a multi-process
            # jax.distributed mesh (verified with a minimal repro); the
            # cross-process test (tests/test_multiprocess.py) sets
            # MCI_PALLAS_GENERIC_INTERPRET=1 to use the generic pure-JAX
            # interpreter instead — valid for this kernel because its
            # interpret path avoids all pltpu primitives (_make_rng).
            interpret=((True if os.environ.get(
                "MCI_PALLAS_GENERIC_INTERPRET")
                else pltpu.InterpretParams()) if interpret else False),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(kd, atab, *tabs)

        obs_b = outs[0]
        if measure_b is not None:
            # rebuild the observable pytree with leading [block] axis
            cols, k = [], 0
            for shape in comp_shapes:
                m = max(int(np.prod(shape)), 1)
                cols.append(obs_b[:, k:k + m].reshape((B,) + shape))
                k += m
            obs_b = jax.tree_util.tree_unflatten(proto_def, cols)
        hist_out = {lidx: h for lidx, h in zip(adapt_leaves, outs[1:])}
        hists = []
        for lidx, li in enumerate(leaves):
            if lidx in hist_out:
                hists.append(hist_out[lidx].reshape(NP))
            else:
                from .lookup import padded_hist_size
                hists.append(jnp.zeros(padded_hist_size(li.nhist),
                                       jnp.float32))
        norm_b = jnp.full((B,), float(nb * m_tile * nchunks), jnp.float32)
        return obs_b, norm_b, hists

    return run_all
