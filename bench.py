"""Headline benchmark: integrand evals/s/chip on the 2-D unit-circle pi integral.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 1e9 evals/s/chip, the driver-supplied north-star target
(BASELINE.md; the reference's measured single-core rate is ~0.4-4.5e6
evals/s, see /root/reference/example/benchmark/cuba/benchmark.jl:146-158).

Run on whatever backend is attached (TPU under axon, CPU otherwise).
Also sanity-checks the estimate against pi/4 at 5 sigma before reporting.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mcintegration_tpu.configuration import Configuration
    from mcintegration_tpu.models.variable import Continuous
    from mcintegration_tpu.solvers.engine import Spec
    from mcintegration_tpu.solvers.vegas import VegasIteration

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    block = 16
    # big enough to amortize the per-dispatch host/runtime latency
    # (~25-100 ms through the axon tunnel): measures the sustained rate
    neval = int(float(sys.argv[1])) if len(sys.argv) > 1 else (
        2 ** 34 if on_tpu else 2 ** 22)
    nevalperblock = neval // block

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=20260817)
    spec = Spec(cfg)
    it = VegasIteration(
        spec, lambda x, c: jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0),
        block=block, nevalperblock=nevalperblock, mesh=None,
        max_chunk=min(nevalperblock, 2 ** 17))
    params = spec.device_params()

    # warmup / compile
    stats = it.run(params, jax.random.key(0))
    total = it.block * it.nevalperblock

    # timed runs
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        stats = it.run(params, jax.random.key(rep + 1))
        dt = time.perf_counter() - t0
        best = max(best, total / dt)

    # accuracy sanity check
    m_b = stats["obs_blocks"][:, 0] / stats["norm_blocks"]
    mean = m_b.mean()
    err = m_b.std(ddof=1) / np.sqrt(block)
    assert abs(mean - np.pi / 4) < 5 * max(err, 1e-9), (mean, err)

    print(json.dumps({
        "metric": "pi2d_integrand_evals_per_sec_per_chip",
        "value": best,
        "unit": "evals/s",
        "vs_baseline": best / 1e9,
    }))


if __name__ == "__main__":
    main()
