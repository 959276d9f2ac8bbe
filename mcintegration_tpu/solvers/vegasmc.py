"""The :vegasmc solver — hybrid Vegas + Markov-chain over vectorized walkers.

Reference semantics (src/vegas_mc/montecarlo.jl:112-241, updates.jl:45-106):
one walker samples the joint distribution

    p(x) = r_norm * pad_norm(x) + sum_i |w_i(x)| * r_i * pad_i(x)

with a single update type ``changeVariable``: shift one random slot of one
random variable type through the learned map, re-evaluate ALL integrand
weights, and Metropolis-accept with R = prop * p_new / p_old.  Measurements
after a 1% warmup accumulate ``obs[i] += w_i * pad_i / p`` and
``normalization += pad_norm / p``; visited tallies drive reweighting; the
per-slot histogram weight is ``(|w_i|^2 / prob_i) * pad_i / p``.

TPU design: W independent walkers advance in lockstep inside one
``lax.scan`` of vmapped transitions; walkers are grouped into ``block``
lanes for the reference's block error bars, and the walker axis is sharded
over the device mesh.  Each walker picks its own variable type and slot
(masked proposals across var types), so the kernel is bit-for-bit the
reference chain law, just W chains wide.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..common import TINY_F32
from ..ops import ksum
from ..ops.grid import uniform_open01
from ..parallel.mesh import distribute_rows, gather_rows, ordered_psum
from .engine import (
    Spec,
    accumulate_hists,
    decode_complex_numpy,
    encode_complex,
    fetch_stats,
    gather_slot,
    scatter_slot,
    take_rows,
    zero_hists,
)


def choose_walkers(neval: int, block: int, nwalkers, min_steps: int,
                   max_walkers: int = 65536):
    """Pick (W, nsteps) with W a multiple of block and W*nsteps ≈ neval."""
    if nwalkers is None:
        w = max(block, min(int(neval) // max(min_steps, 1), max_walkers))
    else:
        w = max(int(nwalkers), block)
    w = (w // block) * block
    nsteps = max(int(neval) // w, 8)
    return w, nsteps


class VegasMCIteration:
    """One compiled per-iteration kernel for the :vegasmc solver."""

    def __init__(self, spec: Spec, integrand: Callable, *, measure=None,
                 inplace=False, measurefreq=1, block=16, nevalperblock=10000,
                 mesh=None, weight_dtype=jnp.float32, obs_proto=None,
                 nwalkers=None, min_steps_per_walker=256, backend="auto",
                 warmup=0.01):
        self.spec = spec
        self.block = block
        self.mesh = mesh
        from ..models.variable import FermiK
        for li in spec.leaves:
            if isinstance(li.leaf, FermiK) and li.ndraw > 0:
                raise NotImplementedError(
                    "FermiK pools are supported by the :mcmc solver only "
                    "(reference capability boundary, test/bubble_FermiK.jl:2)")
        ndev = 1
        if mesh is not None:
            ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        assert block % ndev == 0, f"block={block} must divide over {ndev} devices"
        neval = nevalperblock * block
        Wg, nsteps = choose_walkers(neval, block * ndev, nwalkers,
                                    min_steps_per_walker)
        # all shapes below are per-device (shard_map-local)
        W = Wg // ndev
        block = block // ndev
        self.nwalkers = Wg
        self.nsteps = nsteps
        self.neval = Wg * nsteps
        # burn-in discard: measure only after `warmup` fraction of each
        # walker's chain (reference: fixed 1%, montecarlo.jl:213).  Larger
        # values pay for unbiasedness when the proposal map is badly
        # mismatched (frozen-map robustness regime, important_sampling.md).
        assert 0.0 <= warmup < 1.0, f"warmup fraction must be in [0,1), got {warmup}"
        self.warmup = float(warmup)

        # ---- fused Pallas chain kernel (ops/pallas_chain.py) ----
        self.backend = "xla"
        self.backend_reason = ("backend='xla' requested" if backend == "xla"
                               else "")
        self._shadow = None
        if backend in ("auto", "pallas"):
            from ..models.variable import Continuous
            from ..ops import pallas_chain, pallas_vegas
            from .engine import pow2_shadow
            devs = (np.asarray(mesh.devices).ravel() if mesh is not None
                    else jax.devices())
            interp = devs[0].platform == "cpu"
            # non-power-of-two Continuous pools run through a pow2
            # resample of the live map (engine.pow2_shadow); the kernel
            # is BUILT against spec_b, the original spec stays untouched
            spec_b, shadow = pow2_shadow(spec)
            why: list = []
            if backend != "pallas" and interp:
                self.backend_reason = (
                    "no TPU device (interpret-mode Pallas is slower than "
                    "XLA; pass backend='pallas' to force it)")
            elif not pallas_chain.chain_eligible(
                    spec_b, measure=measure, weight_dtype=weight_dtype,
                    obs_proto=obs_proto, why=why):
                self.backend_reason = why[0] if why else "spec not eligible"
            if ((backend == "pallas" or not interp)
                    and pallas_chain.chain_eligible(
                        spec_b, measure=measure, weight_dtype=weight_dtype,
                        obs_proto=obs_proto)):
                cplx = weight_dtype == jnp.complex64
                eval_fn_probe = spec_b.make_eval(integrand, inplace,
                                                 weight_dtype)
                if cplx:
                    # complex weights run as (re, im) f32 pairs inside the
                    # kernel (ops/realify.py); any complex primitive
                    # without a rewrite rule fails the probe -> XLA path
                    try:
                        eval_b = pallas_vegas.make_eval_batched_pairs(
                            spec_b, integrand, inplace)
                        validate = pallas_vegas.validate_batched_pairs
                    except Exception:
                        eval_b = None
                else:
                    eval_b = pallas_vegas.make_eval_batched(
                        spec_b, integrand, inplace, weight_dtype)
                    validate = pallas_vegas.validate_batched
                measure_b = None
                measure_ok = eval_b is not None
                if measure is not None and measure_ok:
                    if cplx:
                        # complex custom measures: realified pair path
                        try:
                            measure_b = pallas_chain.make_measure_batched_pairs(
                                spec_b, measure, obs_proto)
                            measure_ok = \
                                pallas_chain.validate_measure_batched_pairs(
                                    spec_b, measure_b, measure, obs_proto)
                        except Exception:
                            measure_ok = False
                    else:
                        measure_b = pallas_chain.make_measure_batched(
                            spec_b, measure, weight_dtype, obs_proto)
                        measure_ok = pallas_chain.validate_measure_batched(
                            spec_b, measure_b, measure, obs_proto)
                # per-device shapes: `block` and `W` are already local.
                # Pick the largest walker tile that (a) fits the requested
                # walker budget without inflating it (which would shorten
                # chains below the requested length) and (b) keeps S*128 a
                # multiple of every Continuous ninc (lattice rolls); if none
                # fits (or a batched probe fails), use the XLA path.
                S = 0
                for cand in (16, 8):
                    if block * cand * 128 > W:
                        continue
                    if all((cand * 128) % li.leaf.ninc == 0
                           for li in spec_b.leaves
                           if li.ndraw > 0
                           and isinstance(li.leaf, Continuous)):
                        S = cand
                        break
                ok = S > 0 and measure_ok
                if S == 0:
                    self.backend_reason = (
                        f"no {8 * 128}/{16 * 128}-walker tile fits "
                        f"{W} walkers over {block} block lanes with every "
                        "Continuous ninc dividing it (raise neval or "
                        "nwalkers)")
                elif eval_b is None:
                    self.backend_reason = (
                        "the complex integrand uses a primitive without a "
                        "realify rewrite rule (ops/realify.py)")
                elif not measure_ok:
                    self.backend_reason = (
                        "the batched custom-measure probe did not reproduce "
                        "the per-sample evaluation (measure not "
                        "batch-rewritable)")
                elif not validate(spec_b, eval_b, eval_fn_probe):
                    ok = False
                    self.backend_reason = (
                        "the batched-integrand probe did not reproduce the "
                        "per-sample evaluation (integrand not "
                        "batch-rewritable)")
                if ok:
                    wtiles = max(1, W // (block * S * 128))
                    Wg = block * wtiles * S * 128 * ndev
                    self.nwalkers = Wg
                    self.nsteps = max(int(neval) // Wg, 8)
                    self.neval = Wg * self.nsteps
                    self._shadow = shadow
                    run_all_pallas = pallas_chain.build_chain_run_all(
                        spec_b, eval_b, block=block, wtiles=wtiles, S=S,
                        nsteps=self.nsteps, mf=measurefreq,
                        interpret=interp, measure_batched=measure_b,
                        obs_proto=obs_proto,
                        warmup=int(self.nsteps * self.warmup),
                        cplx=cplx)
                    self.backend = "pallas"
                    self.backend_reason = ""
                    # default-measure complex uses the flat [B, 2n] re/im
                    # column layout; custom-measure complex comes back as
                    # encode_complex marker dicts (decoded generically)
                    self._pallas_cplx = cplx and measure_b is None
                    rows_local = block * wtiles

                    if ndev > 1:
                        axis = mesh.axis_names[0]

                        def sharded(params, kd):
                            def local(params, kd):
                                o, nb, vis, hists, pc, ac = run_all_pallas(
                                    params, kd)
                                vis = ordered_psum(vis, axis)
                                hists = [ordered_psum(h, axis) for h in hists]
                                pc = ordered_psum(pc, axis)
                                ac = ordered_psum(ac, axis)
                                return o, nb, vis, hists, pc, ac

                            return jax.shard_map(
                                local, mesh=mesh,
                                in_specs=(P(), P(axis)),
                                out_specs=(P(axis), P(axis), P(), P(),
                                           P(), P()),
                                check_vma=False,
                            )(params, kd)

                        self.raw_fn = sharded
                    else:
                        self.raw_fn = run_all_pallas
                    self._fn = jax.jit(self.raw_fn)
                    self._ndev = ndev
                    self._pallas_rows = rows_local * ndev
                    return
        n = spec.N
        nd = n + 1
        nvar = spec.nvar
        norm = spec.norm
        wb = W // block
        mf = measurefreq
        # measure once ne >= warmup*neval (reference fixes 1%, montecarlo.jl:213)
        warmup = int(nsteps * self.warmup)

        eval_fn = spec.make_eval(integrand, inplace, weight_dtype)
        # var types the chain may update (maxdof > 0), static
        eligible = [g for g in range(nvar) if spec.maxdof[g] > 0]
        maxdof_arr = jnp.asarray([max(spec.maxdof[g], 1) for g in range(nvar)],
                                 jnp.float32)

        if measure is None:
            obs_zero = np.zeros((n,), weight_dtype)  # numpy: eager complex arrays are unimplemented on some TPU runtimes
            def measure_contrib(pools, relw):
                return relw
        else:
            obs_zero = jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), weight_dtype), obs_proto)
            uc = spec.uconfig
            def measure_contrib(pools, relw):
                return measure(spec.view(pools), relw, uc)

        def joint_probability(params, weights, pad):
            """p = r_norm*pad_norm + sum_i |w_i|*r_i*pad_i (montecarlo.jl:161-166)."""
            r = params["reweight"]
            p = r[norm] * pad[:, norm]
            p = p + jnp.sum(jnp.abs(weights) * r[None, :n] * pad[:, :n], axis=-1)
            return p

        def paddings(slotp):
            return jnp.stack(
                [spec.padding_probability(slotp, i) for i in range(nd)], axis=-1)

        def propose_shift(params, key, pools, vi):
            """Per-walker changeVariable proposal across all var types.

            Returns (new_pools, prop [W]).  Each group's shift is computed for
            every walker; the per-walker ``vi`` mask selects which group's
            proposal actually lands (identity elsewhere).
            """
            u_slot = uniform_open01(jax.random.fold_in(key, 1), (W,))
            new_pools = [dict(p) for p in pools]
            prop = jnp.ones((W,), jnp.float32)
            for g in eligible:
                idx_g = jnp.minimum(
                    (u_slot * maxdof_arr[g]).astype(jnp.int32), spec.maxdof[g] - 1)
                sel = (vi == g)
                prop_g = jnp.ones((W,), jnp.float32)
                for lidx in spec.group_leaves[g]:
                    li = spec.leaves[lidx]
                    pool = pools[lidx]
                    ov = gather_slot(pool["val"], idx_g)
                    og = gather_slot(pool["gidx"], idx_g)
                    op = gather_slot(pool["prob"], idx_g)
                    k = jax.random.fold_in(key, 100 + lidx)
                    nv, ng, npb, prop_l = li.leaf.dev_shift(
                        params["leaf"][lidx], k, ov, og, op)
                    prop_g = prop_g * prop_l
                    selx = sel
                    new_pools[lidx] = {
                        "val": scatter_slot(new_pools[lidx]["val"], idx_g,
                                            jnp.where(_bsel(selx, nv), nv, ov)),
                        "gidx": scatter_slot(new_pools[lidx]["gidx"], idx_g,
                                             jnp.where(selx, ng, og)),
                        "prob": scatter_slot(new_pools[lidx]["prob"], idx_g,
                                             jnp.where(selx, npb, op)),
                    }
                prop = jnp.where(sel, prop_g, prop)
            return new_pools, prop

        def step(carry, t):
            (pools, weights, pad, p, obs_acc, norm_acc, visited_acc, hists,
             prop_cnt, acc_cnt, base_key) = carry
            key = jax.random.fold_in(base_key, t)

            # -- changeVariable (updates.jl:45-106) --
            u_vi = uniform_open01(jax.random.fold_in(key, 0), (W,))
            vi_pick = jnp.minimum((u_vi * len(eligible)).astype(jnp.int32),
                                  len(eligible) - 1)
            vi = take_rows(jnp.asarray(eligible, jnp.int32), vi_pick)

            prop_pools, prop = propose_shift(params_ref[0], key, pools, vi)
            new_weights = jax.vmap(eval_fn)(prop_pools)
            new_slotp = spec.slot_probs(prop_pools)
            new_pad = paddings(new_slotp)
            new_p = joint_probability(params_ref[0], new_weights, new_pad)

            r_ratio = prop * new_p / p
            u_acc = uniform_open01(jax.random.fold_in(key, 2), (W,))
            accept = (u_acc < r_ratio) & (prop > TINY_F32)

            pools = [
                {k2: jnp.where(_b(accept, npv[k2]), npv[k2], opv[k2])
                 for k2 in opv}
                for opv, npv in zip(pools, prop_pools)
            ]
            weights = jnp.where(accept[:, None], new_weights, weights)
            pad = jnp.where(accept[:, None], new_pad, pad)
            p = jnp.where(accept, new_p, p)

            # proposal / acceptance tallies per var type (updates.jl:90-92)
            vi_onehot = (vi[:, None] == jnp.arange(nvar)[None, :]).astype(jnp.float32)
            prop_cnt = prop_cnt + jnp.sum(vi_onehot, axis=0)
            acc_cnt = acc_cnt + jnp.sum(vi_onehot * accept[:, None].astype(jnp.float32), axis=0)

            # -- per-step histogram accumulation (montecarlo.jl:198-211) --
            slotp = spec.slot_probs(pools)
            prob_i = jnp.stack([spec.probability(slotp, i) for i in range(n)],
                               axis=-1)                                  # [W,n]
            wf2 = jnp.minimum(
                (jnp.abs(weights) ** 2 / prob_i) * pad[:, :n] / p[:, None],
                1e34)
            mask = spec.mask_used[:n].astype(wf2.dtype)
            slot_w = jnp.einsum("wn,nvm->wvm", wf2, mask)
            hists = accumulate_hists(spec, hists, pools, slot_w)

            # -- measurement (montecarlo.jl:213-232) --
            measured = ((t % mf) == 0) & (t >= warmup)
            mw = measured.astype(jnp.float32)
            r = params_ref[0]["reweight"]
            relw = weights * (pad[:, :n] / p[:, None]).astype(weights.dtype)
            contrib = jax.vmap(measure_contrib)(pools, relw)
            contrib_b = jax.tree_util.tree_map(
                lambda x: (x * mw).reshape((block, wb) + x.shape[1:]).sum(axis=1),
                contrib)
            obs_acc = ksum.tree_kadd(obs_acc, contrib_b)

            norm_w = pad[:, norm] / p
            norm_acc = ksum.kadd(
                norm_acc, (norm_w * mw).reshape(block, wb).sum(axis=1))

            vis_user = jnp.sum(
                jnp.abs(weights * pad[:, :n] * r[None, :n]) / p[:, None] * mw,
                axis=0)
            vis_norm = jnp.sum(r[norm] * norm_w * mw)[None]
            visited_acc = ksum.kadd(visited_acc,
                                    jnp.concatenate([vis_user, vis_norm]))

            return (pools, weights, pad, p, obs_acc, norm_acc, visited_acc,
                    hists, prop_cnt, acc_cnt, base_key), None

        params_ref = [None]  # closed-over mutable cell, set per trace below

        def run_all(params, key):
            params_ref[0] = params
            init_key = jax.random.fold_in(key, 0)
            pools = spec.draw_all(params, init_key, (W,))
            weights = jax.vmap(eval_fn)(pools)
            slotp = spec.slot_probs(pools)
            pad = paddings(slotp)
            p = joint_probability(params, weights, pad)

            carry = (
                pools, weights, pad, p,
                ksum.tree_kzeros(jax.tree_util.tree_map(
                    lambda x: jnp.zeros((block,) + x.shape, x.dtype), obs_zero)),
                ksum.kzeros((block,)),
                ksum.kzeros((nd,)),
                zero_hists(spec),
                jnp.zeros((nvar,), jnp.float32),
                jnp.zeros((nvar,), jnp.float32),
                jax.random.fold_in(key, 1),
            )
            carry, _ = jax.lax.scan(step, carry, jnp.arange(self.nsteps))
            (_, _, _, _, obs_acc, norm_acc, visited_acc, hists,
             prop_cnt, acc_cnt, _) = carry
            return (encode_complex(ksum.tree_kvalue(obs_acc)), norm_acc.value,
                    visited_acc.value, hists, prop_cnt, acc_cnt)

        if mesh is not None and np.prod([mesh.shape[a] for a in mesh.axis_names]) > 1:
            axis = mesh.axis_names[0]

            def sharded(params, kd):
                def local(params, kd):
                    key0 = jax.random.wrap_key_data(kd[0])
                    obs_b, norm_b, visited, hists, pc, ac = run_all(params, key0)
                    visited = ordered_psum(visited, axis)
                    hists = [ordered_psum(h, axis) for h in hists]
                    pc = ordered_psum(pc, axis)
                    ac = ordered_psum(ac, axis)
                    return obs_b, norm_b, visited, hists, pc, ac

                return jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=(P(axis), P(axis), P(), P(), P(), P()),
                    check_vma=False,
                )(params, kd)

            self.raw_fn = sharded
            self._fn = jax.jit(sharded)
            self._ndev = ndev
        else:
            self.raw_fn = lambda params, kd: run_all(
                params, jax.random.wrap_key_data(kd[0]))
            self._fn = jax.jit(self.raw_fn)
            self._ndev = 1

    def reset_state(self):
        """Kernel-cache hook (main._KERNEL_CACHE): no run-to-run state."""
        return None

    def run(self, params, key):
        nrows = (self._pallas_rows if self.backend == "pallas"
                 else self._ndev)
        hist_remap = None
        if self._shadow is not None and self.backend == "pallas":
            # pow2 shadow maps (engine.pow2_shadow): rebuild the affected
            # leaves' tables from THIS call's live grids, remap histograms
            params, hist_remap = self._shadow(self.spec, params)
        kd = np.asarray(jax.random.key_data(jax.random.split(key, nrows)))
        keys = distribute_rows(self.mesh if self._ndev > 1 else None, kd)
        obs_b, norm_b, visited, hists, prop_cnt, acc_cnt = fetch_stats(
            self._fn(params, keys))
        if hist_remap is not None:
            hists = hist_remap(hists)
        obs_b = jax.tree_util.tree_map(gather_rows, obs_b)
        if getattr(self, "_pallas_cplx", False):
            # kernel component layout: [.., 2i] = Re w_i, [.., 2i+1] = Im w_i
            ob = np.asarray(obs_b, dtype=np.float64)
            obs_b = ob[:, 0::2] + 1j * ob[:, 1::2]
        else:
            obs_b = decode_complex_numpy(obs_b)
        norm_b = gather_rows(norm_b).astype(np.float64)
        spec = self.spec
        nd = spec.N + 1
        nvar = spec.nvar
        propose = np.zeros((3, nd, max(nd, nvar)))
        accept = np.zeros((3, nd, max(nd, nvar)))
        propose[1, 0, :nvar] = np.asarray(prop_cnt, dtype=np.float64)
        accept[1, 0, :nvar] = np.asarray(acc_cnt, dtype=np.float64)
        return {
            "obs_blocks": obs_b,
            "norm_blocks": norm_b,
            "visited": np.asarray(visited, dtype=np.float64),
            "hists": [np.asarray(h, dtype=np.float64)[: li.nhist]
                      for h, li in zip(hists, self.spec.leaves)],
            "propose": propose,
            "accept": accept,
            "neval": self.neval,
        }


def _b(mask, ref):
    """Broadcast a [W] bool mask against a pool array [W, ...]."""
    return mask.reshape(mask.shape + (1,) * (ref.ndim - 1))


def _bsel(mask, ref):
    """Broadcast a [W] bool mask against a slot value [W(, D)]."""
    return mask.reshape(mask.shape + (1,) * (ref.ndim - 1))
