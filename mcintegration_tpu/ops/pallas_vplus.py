"""Fused vegas+ Pallas kernel — the TPU hot path of the :vegasplus solver.

The XLA pipeline (solvers/vegasplus.py) pays ~15x over plain stratified
vegas in cube bookkeeping: the per-cube second-moment scatter alone costs
2*ncubes MACs per sample through the factored one-hot matmul
(ops/lookup.py) — 32 kFLOP/sample at ncubes=16384 — plus per-sample
two_level_take map lookups.  Measured rates for both paths live in
BENCHMARKS.md (generated from committed measurement rows).

This kernel removes BOTH costs by aligning the sample layout with the
stratification (cf. the m-CUBES GPU scheme's cube-per-thread layout,
Lepage 2021 "vegas+" for the estimator):

1. **Lanes are cubes.**  The host assigns each of NL vector lanes to one
   hypercube (cube-major, >=1 lane per cube); Neyman reallocation
   (Lepage 2021 Eq.(24), solvers/vegasplus.py:_reallocate) moves LANES
   between cubes instead of per-cube sample counts, so every shape stays
   static and the per-cube second-moment accumulation is a per-lane
   elementwise add — the 16384-wide scatter disappears entirely.  The
   sampling density per lane is

       p(x) = [lanes(c) * ncubes / NL] * prod_d rho_d(x_d),

   exactly the vegas+ density n_c * ncubes / T with n_c = lanes(c) * spp
   and T = NL * spp (spp = samples per lane per iteration).

2. **The map lookup is an R-way select, no gather.**  A lane's cube fixes
   the coarse coordinate q_d in [0, nstrat); the Vegas-map bin of a
   sample is iy = q_d*R + j with j = floor(u*R), R = ninc_eff/nstrat <= 8,
   so the (grid, inc) fetch is a select over the lane's own R-entry grid
   segment, uploaded per iteration as [R, NL] tables (host gathers from
   the float64 grid).  When the leaf's training resolution ninc exceeds
   8*nstrat, the kernel samples an exactly-coarsened map (the subsampled
   grid ninc_eff = R*nstrat is itself a valid Vegas map of the same
   learned distribution; its density is used exactly, so the estimator
   stays unbiased — only the adaption resolution coarsens).

Training histograms accumulate per (dim, j, lane) in [R, NL] buffers —
lane-local, scatter-free — and are folded to per-leaf bin histograms on
the host once per iteration (they are cube-indexed, so the fold is a
segment sum over the static lane->cube map).

Accumulator design: obs rows live in SMEM with Kahan compensation across
chunks (as in ops/pallas_vegas.py); per-lane second moments accumulate
elementwise in a [TS, 128] VMEM tile reduced once at loop end.

RNG: hardware pltpu.prng_* per (lane-tile, block) instance; CPU tests run
under the TPU interpreter where prng_random_bits is stubbed to zeros, so
a step-salted counter-hash generator substitutes (ops/pallas_chain.py
precedent).

Reference semantics being reproduced: the :vegas estimator
obs[i] += w_i * pad_i / p (src/vegas/montecarlo.jl:148-165) under the
vegas+ stratified density; histogram weight (|w_i| jac)^2
(src/vegas/montecarlo.jl:170-185).
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_vegas import _mix32

R_PAD = 8          # sublane padding of the per-lane grid-segment tables
HIST_EVERY = 4     # training-histogram subsample period (unbiased, scaled)


def vplus_eligible(spec, *, measure, measurefreq, weight_dtype,
                   nevalperblock: int, max_cubes: int,
                   why=None) -> dict | None:
    """Static eligibility + shaping for the fused vegas+ kernel.

    Returns None (XLA path) or a shape plan dict with nstrat/R per dim.
    ``why``: optional list; on a None return, a one-line human-readable
    reason is appended (surfaced as ``Result.backend_reason``).
    """
    from ..models.variable import Continuous

    def no(reason):
        if why is not None:
            why.append(reason)
        return None

    if measure is not None:
        return no("custom measure functions run on the XLA :vegasplus path")
    if measurefreq != 1:
        return no(f"measurefreq={measurefreq} != 1 runs on the XLA path")
    if weight_dtype != jnp.float32:
        return no(f"weight dtype {jnp.dtype(weight_dtype).name} "
                  "(kernel accumulators are float32)")
    dims = []
    for lidx, li in enumerate(spec.leaves):
        if li.ndraw == 0:
            continue
        if not isinstance(li.leaf, Continuous):
            return no(f"{type(li.leaf).__name__} pools run on the XLA "
                      ":vegasplus path (stratification is Continuous-only)")
        for slot in range(li.ndraw):
            dims.append((lidx, slot))
    D = len(dims)
    if D == 0 or D > 10:
        return no(f"{D} stratified dimensions (kernel serves 1..10)")
    nincs = [spec.leaves[lidx].leaf.ninc for (lidx, _) in dims]
    # largest power-of-two nstrat dividing every ninc, with nstrat^D within
    # both the cube budget and the sample budget — >=2 lanes of >=8 samples
    # per cube on average, so Neyman reallocation has room to move lanes
    nstrat = 2
    while True:
        cand = nstrat * 2
        if (cand ** D <= max_cubes and all(n % cand == 0 for n in nincs)
                and 16 * cand ** D <= nevalperblock):
            nstrat = cand
        else:
            break
    if (nstrat ** D > max_cubes or any(n % nstrat for n in nincs)
            or 16 * nstrat ** D > nevalperblock):
        return no(f"no power-of-two strata count divides every ninc within "
                  f"the cube budget ({max_cubes}) and sample budget "
                  f"({nevalperblock}/block) — need >=16 samples/cube")
    ncubes = nstrat ** D
    # per-dim sub-bin count R: largest <= R_PAD with ninc % (nstrat*R) == 0
    Rs = []
    for n in nincs:
        r = 1
        for cand in range(R_PAD, 0, -1):
            if n % (nstrat * cand) == 0:
                r = cand
                break
        Rs.append(r)
    # lane budget: >=1 lane per cube, up to 8 lanes/cube on average for
    # reallocation granularity, NL a multiple of 128
    lanes_avg = int(max(1, min(8, nevalperblock // (8 * ncubes))))
    NL = -(-(ncubes * lanes_avg) // 128) * 128
    spp = max(8, (nevalperblock // NL // 8) * 8)
    TS = min(spp, 128)
    nchunks = -(-spp // TS)
    spp = TS * nchunks
    # VMEM working set: sample tiles + per-instance table slices
    n = spec.N
    tile = TS * 128 * 4
    if (3 * D + n + 8) * tile + (2 * D + 2) * R_PAD * 128 * 4 > 32 * 2**20:
        return no("working set exceeds the 32 MiB VMEM budget")
    return {
        "dims": dims, "D": D, "nstrat": nstrat, "ncubes": ncubes,
        "Rs": Rs, "NL": NL, "LT": NL // 128, "TS": TS, "nchunks": nchunks,
        "spp": spp, "ninc_effs": [nstrat * r for r in Rs],
    }


def build_vplus_run_all(spec, plan: dict, eval_batched: Callable, *,
                        block: int, interpret: bool = False):
    """Return run_all(cube_of_lane, invlf, coarse_tabs, kd) ->
    (obs [B, n], sig [LT, 128], hist per adapt dim [R_PAD, NL]).

    The solver uploads the lane->cube map + per-lane density factor each
    iteration; the per-lane [R_PAD, NL] grid-segment tables are gathered on
    device (see run_all docstring); ``kd`` = [B, 2] uint32 per-block seeds.
    """
    n = spec.N
    dims: List[Tuple[int, int]] = plan["dims"]
    D = plan["D"]
    plan_nstrat = plan["nstrat"]
    Rs = plan["Rs"]
    ninc_effs = plan["ninc_effs"]
    LT, TS, nchunks = plan["LT"], plan["TS"], plan["nchunks"]
    NL = plan["NL"]
    B = block
    f32 = jnp.float32
    leaves = spec.leaves
    adapt_dims = [d for d, (lidx, _) in enumerate(dims)
                  if getattr(leaves[lidx].leaf, "adapt", False)]
    hk = min(HIST_EVERY, nchunks)

    def kernel(kd_ref, *refs):
        invlf_ref = refs[0]
        gtab = {d: refs[1 + 2 * d] for d in range(D)}
        itab = {d: refs[2 + 2 * d] for d in range(D)}
        o = 1 + 2 * D
        obs_ref, sig_ref = refs[o], refs[o + 1]
        hist_refs = {d: refs[o + 2 + k] for k, d in enumerate(adapt_dims)}
        comp_ref = refs[-1]                        # SMEM scratch [B, n]

        lt = pl.program_id(0)
        b = pl.program_id(1)

        # ---- per-instance RNG: one seed row per block, lane-tile id mixed
        # into the seed words (SMEM budget: kd is [B, 2], not [B*LT, 2]) ----
        ltm = _mix32(lt.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        if not interpret:
            pltpu.prng_seed(kd_ref[b, 0] ^ ltm, kd_ref[b, 1] + ltm)

            def rand_u01(salt, t):
                bits = pltpu.prng_random_bits((TS, 128))
                b24 = bits & jnp.int32(0x00FFFFFF)
                return (b24.astype(f32) + 0.5) * f32(2.0 ** -24)
        else:
            k1 = _mix32((kd_ref[b, 0] ^ ltm) ^ jnp.uint32(0x243F6A88))
            k2 = _mix32((kd_ref[b, 1] + ltm) + jnp.uint32(0x13198A2E))

            def rand_u01(salt, t):
                tt = t.astype(jnp.uint32) if hasattr(t, "astype") \
                    else jnp.uint32(t)
                idx = (jax.lax.broadcasted_iota(jnp.uint32, (TS, 128), 0)
                       * jnp.uint32(128)
                       + jax.lax.broadcasted_iota(jnp.uint32, (TS, 128), 1))
                u = _mix32(_mix32(idx ^ k1) + k2
                           + _mix32(tt * jnp.uint32(2654435761)
                                    + jnp.uint32((salt * 0x85EB) & 0xFFFFFFFF)))
                b24 = jax.lax.bitcast_convert_type(
                    u, jnp.int32) & jnp.int32(0x00FFFFFF)
                return (b24.astype(f32) + 0.5) * f32(2.0 ** -24)

        salt = [0]

        def draw_u(t):
            salt[0] += 1
            return rand_u01(salt[0], t)

        # ---- zero the revisited output blocks ----
        @pl.when(lt == 0)
        def _():
            for i in range(n):
                obs_ref[b, i] = 0.0
                comp_ref[b, i] = 0.0

        @pl.when((b == 0) & (lt == 0))
        def _():
            sig_ref[:, :] = jnp.zeros((LT, 128), f32)

        @pl.when(b == 0)
        def _():
            for d in adapt_dims:
                hist_refs[d][:, :] = jnp.zeros((R_PAD, 128), f32)

        inv_lfac = invlf_ref[:, :]                 # [1, 128]

        def chunk(t, carry):
            obs_c, sig_c = carry

            # -- per-dim draw: bin = q*R + j via R-way select over the
            #    lane's own grid segment (module docstring, item 2) --
            xs = {}
            invp = {}
            js = {}
            for d, (lidx, slot) in enumerate(dims):
                R = Rs[d]
                u = draw_u(t)
                if R > 1:
                    tt = u * float(R)
                    j = jnp.minimum(tt.astype(jnp.int32), R - 1)
                    frac = tt - j.astype(f32)
                    x = gtab[d][0:1, :] + frac * itab[d][0:1, :]
                    inc = jnp.broadcast_to(itab[d][0:1, :], (TS, 128))
                    for r in range(1, R):
                        selr = (j == r)
                        x = jnp.where(selr,
                                      gtab[d][r:r + 1, :]
                                      + frac * itab[d][r:r + 1, :], x)
                        inc = jnp.where(selr, itab[d][r:r + 1, :], inc)
                else:
                    j = jnp.zeros((TS, 128), jnp.int32)
                    x = gtab[d][0:1, :] + u * itab[d][0:1, :]
                    inc = jnp.broadcast_to(itab[d][0:1, :], (TS, 128))
                xs[(lidx, slot)] = x
                invp[(lidx, slot)] = float(ninc_effs[d]) * inc
                js[d] = j

            # -- jacobian 1/p = (NL / (lanes*ncubes)) * prod ninc_eff*inc --
            jac = inv_lfac
            for k in invp:
                jac = jac * invp[k]

            # -- per-(group,slot) map probabilities for padding algebra --
            gprob = {}
            for gi in range(spec.nvar):
                for slot in range(spec.maxdof[gi]):
                    p = None
                    for lidx in spec.group_leaves[gi]:
                        q = 1.0 / invp[(lidx, slot)]
                        p = q if p is None else p * q
                    gprob[(gi, slot)] = p

            # -- user integrand, batched over the (TS, 128) tile --
            leaf_vals = []
            for lidx, li in enumerate(leaves):
                if li.ndraw > 0:
                    leaf_vals.append(jnp.stack(
                        [xs[(lidx, s)] for s in range(li.ndraw)], axis=0))
                else:
                    leaf_vals.append(jnp.zeros((0, TS, 128), f32))
            weights = eval_batched(leaf_vals)      # list of n [TS, 128]

            # -- obs[i] += w_i * pad_i * jac (montecarlo.jl:148-165) --
            relw = []
            for i in range(n):
                factor = jac
                if not spec.pad_trivial[i]:
                    for gi in range(spec.nvar):
                        for slot in range(spec.cfg.dof[i][gi],
                                          spec.maxdof[gi]):
                            factor = factor * gprob[(gi, slot)]
                relw.append(weights[i] * factor)
                obs_c[i] = obs_c[i] + jnp.sum(
                    jnp.sum(relw[i], axis=1, keepdims=True))

            # -- per-lane second moments for Neyman reallocation: the
            #    vegas+ score uses the MAP density only (not the lane
            #    factor): wj_map = sum_i |w_i| pad_i * prod(ninc_eff*inc).
            #    relw already includes inv_lfac = NL/(lanes*ncubes); the
            #    host undoes that per-cube constant (it knows lanes(c))
            #    before computing the Neyman weights d_c. --
            score = None
            for i in range(n):
                s = jnp.abs(relw[i])
                score = s if score is None else score + s
            # clip in MAP-DENSITY units for parity with the XLA path
            # (vegasplus.py wj_map = min(score/denom, 1e17)): relw carries
            # the per-lane factor inv_lfac, so fold it into the threshold
            # — the effective clip is then cube-independent
            sig_c = sig_c + jnp.minimum(score, 1e17 * inv_lfac) ** 2

            # -- training histograms, subsampled (lane-local, no scatter;
            #    accumulated straight into the resident output block) --
            @pl.when((t % hk) == 0)
            def _():
                for d in adapt_dims:
                    lidx, slot = dims[d]
                    mask = np.asarray(spec.mask_used)[
                        :n, leaves[lidx].group, slot]
                    sw = None
                    for i in range(n):
                        if mask[i]:
                            wj2 = jnp.minimum(jnp.abs(relw[i]),
                                              1e17 * inv_lfac) ** 2
                            sw = wj2 if sw is None else sw + wj2
                    if sw is None:
                        continue
                    # exact inverse sampling fraction: chunks t=0,hk,2hk,...
                    # are ceil(nchunks/hk) of nchunks, NOT nchunks/hk — the
                    # old *hk scale over-weighted by hk*ceil(nchunks/hk)/
                    # nchunks when nchunks % hk != 0
                    sw = sw * (float(nchunks) / float(-(-nchunks // hk)))
                    R = Rs[d]
                    for r in range(R):
                        sel = (js[d] == r).astype(f32) if R > 1 else 1.0
                        hist_refs[d][r:r + 1, :] += jnp.sum(
                            sw * sel, axis=0, keepdims=True)

            return obs_c, sig_c

        obs_c = [jnp.zeros((), f32) for _ in range(n)]
        sig_c = jnp.zeros((TS, 128), f32)
        obs_c, sig_c = jax.lax.fori_loop(
            0, nchunks, chunk, (obs_c, sig_c))

        # ---- fold the per-instance accumulators into the outputs ----
        for i in range(n):
            y = obs_c[i] - comp_ref[b, i]
            tt = obs_ref[b, i] + y
            comp_ref[b, i] = (tt - obs_ref[b, i]) - y
            obs_ref[b, i] = tt
        sig_ref[pl.ds(lt, 1), :] += jnp.sum(sig_c, axis=0, keepdims=True)

    def run_all(cube_of_lane, invlf, coarse_tabs, kd):
        """cube_of_lane [NL] i32, invlf [1, NL] f32, coarse_tabs = per-dim
        packed [L, L*2] (grid_eff, inc_eff) tables, kd [B, 2] uint32.

        The per-lane [R_PAD, NL] grid-segment tables are built HERE, on
        device, inside the same jit as the kernel dispatch: uploading them
        prebuilt costs ~17 MB/iteration through a remote-TPU tunnel vs
        ~1 MB for the lane map (measured 4x end-to-end at neval=2.7e8).
        """
        from .lookup import two_level_take

        nstrat = plan_nstrat
        gi_tabs = []
        for d in range(D):
            R = Rs[d]
            coords = (cube_of_lane // (nstrat ** d)) % nstrat
            idx = coords[None, :] * R + jnp.minimum(
                jnp.arange(R_PAD, dtype=jnp.int32), R - 1)[:, None]
            gi = two_level_take(coarse_tabs[d], idx, 2)   # [R_PAD, NL, 2]
            gi_tabs += [gi[..., 0], gi[..., 1]]
        tabs = (invlf, *gi_tabs)

        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]        # kd
                    + [pl.BlockSpec((1, 128), lambda lt, bb: (0, lt),
                                    memory_space=pltpu.VMEM)]      # invlf
                    + [pl.BlockSpec((R_PAD, 128), lambda lt, bb: (0, lt),
                                    memory_space=pltpu.VMEM)] * (2 * D))
        out_shape = ([jax.ShapeDtypeStruct((B, n), f32),
                      jax.ShapeDtypeStruct((LT, 128), f32)]
                     + [jax.ShapeDtypeStruct((R_PAD, NL), f32)
                        for _ in adapt_dims])
        out_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec((R_PAD, 128), lambda lt, bb: (0, lt),
                                     memory_space=pltpu.VMEM)] * len(adapt_dims))
        outs = pl.pallas_call(
            kernel,
            grid=(LT, B),
            in_specs=in_specs,
            out_shape=out_shape,
            out_specs=out_specs,
            scratch_shapes=[pltpu.SMEM((B, n), f32)],
            interpret=pltpu.InterpretParams() if interpret else False,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(kd, *tabs)
        return outs[0], outs[1], list(outs[2:])

    return run_all
