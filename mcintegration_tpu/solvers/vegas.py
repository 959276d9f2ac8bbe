"""The :vegas solver — classic Vegas importance sampling, batched.

Reference semantics (src/vegas/montecarlo.jl:72-191): every step redraws ALL
``maxdof`` slots through the learned maps, computes jac = prod 1/prob,
evaluates the full weight vector once, accumulates
``obs[i] += w[i] * padding_probability[i] * jac`` and per-slot histogram
weight ``(|w[i]|*jac)^2``; ``normalization`` counts measured samples.  No
Metropolis accept/reject: every sample counts.

TPU design: samples are iid, so the whole iteration is one jitted
``vmap(blocks) x scan(chunks) x vmap(samples)`` pipeline.  Each of the
``block`` independent estimates (reference error-bar discipline,
src/main.jl:296-320) is a vmapped lane; chunked `lax.scan` bounds memory;
Kahan-compensated float32 accumulators carry the block sums (ops/ksum.py).
Across devices the block axis is sharded with `shard_map`; the per-leaf
histograms take one `psum` — the reference's entire MPI wire protocol
(SURVEY.md §5) collapsed into a single collective.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import ksum
from .engine import (Spec, accumulate_hists, decode_complex_numpy,
                     encode_complex, pack_weights, zero_hists)


def _tree_sum0(tree):
    return jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), tree)


class VegasIteration:
    """One compiled per-iteration kernel for the :vegas solver."""

    def __init__(self, spec: Spec, integrand: Callable, *, measure=None,
                 inplace=False, measurefreq=1, block=16, nevalperblock=10000,
                 mesh=None, max_chunk=16384, weight_dtype=jnp.float32,
                 obs_proto=None):
        self.spec = spec
        self.block = block
        self.mesh = mesh
        nchunks = max(1, -(-nevalperblock // max_chunk))
        self.chunk = -(-nevalperblock // nchunks)
        self.nchunks = nchunks
        self.nevalperblock = self.chunk * nchunks
        self.measurefreq = measurefreq
        self.weight_dtype = weight_dtype

        eval_fn = spec.make_eval(integrand, inplace, weight_dtype)
        n = spec.N
        mf = measurefreq
        c = self.chunk

        if measure is None:
            obs_zero = jnp.zeros((n,), weight_dtype)
            def measure_contrib(pools, relw):
                return relw  # default: obs[i] += relative weight (montecarlo.jl:151-153)
        else:
            obs_zero = jax.tree_util.tree_map(
                lambda x: jnp.zeros(np.shape(x), weight_dtype), obs_proto)
            uc = spec.uconfig
            def measure_contrib(pools, relw):
                v = spec.view(pools)
                return measure(v, relw, uc)

        def run_block(params, block_key):
            def chunk_body(carry, t):
                obs_acc, norm_acc, hists = carry
                key_t = jax.random.fold_in(block_key, t)
                pools = spec.draw_all(params, key_t, (c,))
                slotp = spec.slot_probs(pools)                      # [c, nvar, mm]
                jac = 1.0 / spec.total_probability(slotp)           # [c]
                weights = jax.vmap(eval_fn)(
                    jax.tree_util.tree_map(lambda x: x, pools))     # [c, n]
                pad = jnp.stack(
                    [spec.padding_probability(slotp, i) for i in range(n)],
                    axis=-1)                                        # [c, n]
                relw = weights * (pad * jac[:, None]).astype(weights.dtype)

                # measurement gate: ne % measurefreq == 0 (montecarlo.jl:148)
                if mf > 1:
                    ne = t * c + jnp.arange(c) + 1
                    msk = (ne % mf) == 0
                    mw = msk.astype(relw.real.dtype)
                    relw_m = relw * mw[:, None]
                    count = jnp.sum(mw)
                else:
                    relw_m = relw
                    count = jnp.asarray(float(c), jnp.float32)

                contrib = jax.vmap(measure_contrib)(pools, relw_m)
                obs_acc = ksum.tree_kadd(obs_acc, _tree_sum0(contrib))
                norm_acc = ksum.kadd(norm_acc, count)

                # histogram weight (|w_i| * jac)^2 per used slot
                # (vegas/montecarlo.jl:170-185)
                wj2 = (jnp.abs(weights) * jac[:, None]) ** 2        # [c, n]
                mask = spec.mask_used[:n].astype(wj2.dtype)         # [n, nvar, mm]
                slot_w = jnp.einsum("cn,nvm->cvm", wj2, mask)
                hists = accumulate_hists(spec, hists, pools, slot_w)
                return (obs_acc, norm_acc, hists), None

            obs0 = ksum.tree_kzeros(obs_zero)
            norm0 = ksum.kzeros(())
            hists0 = zero_hists(spec)
            (obs_acc, norm_acc, hists), _ = jax.lax.scan(
                chunk_body, (obs0, norm0, hists0), jnp.arange(self.nchunks))
            # complex observables leave the kernel as real pairs (engine.py)
            return (encode_complex(ksum.tree_kvalue(obs_acc)),
                    norm_acc.value, hists)

        def run_all(params, block_keys):
            obs_b, norm_b, hists_b = jax.vmap(run_block, in_axes=(None, 0))(
                params, block_keys)
            hists = [jnp.sum(h, axis=0) for h in hists_b]
            return obs_b, norm_b, hists

        if mesh is not None and np.prod([mesh.shape[a] for a in mesh.axis_names]) > 1:
            axis = mesh.axis_names[0]

            def sharded(params, block_keys):
                def local(params, keys):
                    obs_b, norm_b, hists = run_all(params, keys)
                    hists = [jax.lax.psum(h, axis) for h in hists]
                    return obs_b, norm_b, hists

                return jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=(P(axis), P(axis), P()),
                    check_vma=False,
                )(params, block_keys)

            self.raw_fn = sharded
            self._fn = jax.jit(sharded)
        else:
            self.raw_fn = run_all
            self._fn = jax.jit(run_all)

    def run(self, params, key):
        """Execute one iteration; returns host-side numpy statistics."""
        block_keys = jax.random.split(key, self.block)
        obs_b, norm_b, hists = self._fn(params, block_keys)
        obs_b = decode_complex_numpy(obs_b)
        norm_b = np.asarray(norm_b, dtype=np.float64)
        hists = [np.asarray(h, dtype=np.float64)[: li.nhist]
                 for h, li in zip(hists, self.spec.leaves)]
        neval = self.block * self.nevalperblock
        return {
            "obs_blocks": obs_b,      # pytree with leading [block] axis
            "norm_blocks": norm_b,    # [block] measured-sample counts
            "hists": hists,           # per-leaf histogram sums
            "neval": neval,
        }
