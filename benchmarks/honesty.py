"""Error-bar honesty of the :vegasmc fused chain kernel at production scale.

Over N seeds, compares the empirical seed-to-seed spread of the estimate
with the mean reported stderr (block-spread error bars, the same statistic
Result reports).  Honest errors give ratio r ~= 1 +- 1/sqrt(2N).  The
lattice-roll proposal correlates walkers within a block, which inflates
the TRUE spread at short chains — the reported error must track it
(documented in BENCHMARKS.md; CI gate: tests/test_honesty.py).

Run: python benchmarks/honesty.py [nseeds]
Reference statistic being validated: block error bars,
/root/reference/src/vegas_mc/montecarlo.jl:233-241 + src/statistics.jl.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mcintegration_tpu.platform import apply_env_platform

apply_env_platform()

import numpy as np
import jax
import jax.numpy as jnp

from mcintegration_tpu.configuration import Configuration
from mcintegration_tpu.models.variable import Continuous
from mcintegration_tpu.solvers.engine import Spec
from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

EXACT = np.pi / 4


def _pi(x, c):
    return jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)


def honesty(nsteps: int, nseeds: int, nwalkers: int = 8192, block: int = 8):
    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1)
    spec = Spec(cfg)
    it = VegasMCIteration(spec, _pi, block=block,
                          nevalperblock=nwalkers * nsteps // block,
                          backend="pallas", nwalkers=nwalkers)
    assert it.backend == "pallas", "chain kernel not eligible on this config"
    means, errs = [], []
    t0 = time.time()
    for seed in range(nseeds):
        st = it.run(spec.device_params(), jax.random.key(1000 + seed))
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        means.append(float(m.mean()))
        errs.append(float(m.std(ddof=1) / np.sqrt(len(m))))
    dt = time.time() - t0
    means, errs = np.asarray(means), np.asarray(errs)
    z = (means - EXACT) / errs
    r = np.sqrt(means.var(ddof=1) / np.mean(errs ** 2))
    return {
        "steps_per_walker": nsteps,
        "spread": float(means.std(ddof=1)),
        "reported": float(np.mean(errs)),
        "ratio": float(r),
        "max_abs_z": float(np.max(np.abs(z))),
        "evals_per_s": nseeds * it.neval / dt,
    }


def main():
    nseeds = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"{nseeds} seeds, 8192 walkers, :vegasmc Pallas chain kernel, "
          f"2-D pi integrand (exact {EXACT:.6f})")
    print(f"{'steps/walker':>13s} {'spread':>10s} {'reported':>10s} "
          f"{'ratio':>7s} {'max|z|':>7s} {'Mevals/s':>9s}")
    for nsteps in (512, 4096, 32768):
        h = honesty(nsteps, nseeds)
        print(f"{h['steps_per_walker']:13d} {h['spread']:10.2e} "
              f"{h['reported']:10.2e} {h['ratio']:7.2f} "
              f"{h['max_abs_z']:7.2f} {h['evals_per_s'] / 1e6:9.0f}")
    print("honest errors: ratio ~= 1 +- %.2f (1/sqrt(2N))" %
          (1 / np.sqrt(2 * nseeds)))


if __name__ == "__main__":
    main()
