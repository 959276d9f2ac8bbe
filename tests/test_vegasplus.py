"""Tests for the :vegasplus solver (adaptive hypercube stratification)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcintegration_tpu import Continuous, Discrete, integrate
from conftest import check


def test_pi4():
    res = integrate(lambda x, c: jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0),
                    var=Continuous(0.0, 1.0), dof=[[2]], neval=1e5, niter=10,
                    solver="vegasplus", verbose=-2, seed=8)
    check(res, np.pi / 4)
    # hypercube stratification should beat plain vegas by a lot here
    assert float(np.asarray(res.stdev[0])) < 5e-4


def test_singular_3d_nonseparable():
    # the integrand family plain (separable) vegas struggles with
    def f(x, c):
        ca, cb = jnp.cos(x[0]), jnp.cos(x[1])
        s2a = 2 * jnp.sin(x[0] / 2) ** 2
        s2b = 2 * jnp.sin(x[1] / 2) ** 2
        s2c = 2 * jnp.sin(x[2] / 2) ** 2
        return 1.0 / (s2a + ca * s2b + ca * cb * s2c) / np.pi**3

    res = integrate(f, var=Continuous(0.0, np.pi), dof=[[3]], neval=2e5,
                    niter=10, solver="vegas+", verbose=-2, seed=9)
    check(res, 1.3932039)


def test_multi_integrand():
    def f(x, c):
        return x[0] ** 2 + x[1] ** 2, x[0] * x[1]

    res = integrate(f, var=Continuous(0.0, 1.0), dof=[[2], [2]], neval=5e4,
                    niter=8, solver="vegasplus", verbose=-2, seed=10)
    check(res, [2.0 / 3.0, 0.25])


def test_counts_adapt():
    from mcintegration_tpu.configuration import Configuration
    from mcintegration_tpu.solvers.engine import Spec
    from mcintegration_tpu.solvers.vegasplus import VegasPlusIteration
    import jax

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=2)
    spec = Spec(cfg)
    it = VegasPlusIteration(
        spec, lambda x, c: jnp.exp(-50 * ((x[0] - 0.3) ** 2 + (x[1] - 0.7) ** 2)),
        block=8, nevalperblock=40000, mesh=None)
    params = spec.device_params()
    c0 = it.counts.copy()
    it.run(params, jax.random.key(0))
    assert it.counts.sum() == c0.sum()
    assert not np.array_equal(it.counts, c0), "counts should adapt"
    assert it.counts.min() >= 2


def test_rejects_pure_discrete():
    # no Continuous slot -> nothing to stratify (use :vegas instead)
    with pytest.raises(NotImplementedError):
        integrate(lambda x, c: 1.0, var=Discrete(1, 3), dof=[[1]],
                  neval=1e4, solver="vegasplus", verbose=-2, seed=3)


def test_padding_multi_dof():
    """dof < maxdof through the padding algebra (round 2): the estimator
    w_i * pad_i / p is unbiased under the stratification-coupled joint p."""
    def f(x, c):
        return x[0], jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)

    res = integrate(f, var=Continuous(0.0, 1.0), dof=[[1], [2]], neval=1e5,
                    niter=8, solver="vegasplus", verbose=-2, seed=4)
    check(res, [0.5, np.pi / 4])


def test_discrete_passenger():
    """Discrete pools ride along as non-stratified dims (round 2)."""
    def f(x, c):
        t, d = x
        return t[0] * t[1] * d[0].astype(jnp.float32)

    res = integrate(f, var=(Continuous(0.0, 1.0), Discrete(1, 4)),
                    dof=[[2, 1]], neval=2e5, niter=8,
                    solver="vegasplus", verbose=-2, seed=6)
    # sum_d (int t dt)^2 * d = 0.25 * (1+2+3+4) = 2.5
    check(res, 2.5)


# ---- fused Pallas fast path (round 3, ops/pallas_vplus.py) ----
# backend="pallas" on CPU runs the kernel under the TPU interpreter with
# the counter-hash RNG — every kernel line except hardware PRNG.


def test_pallas_pi4():
    res = integrate(lambda x, c: jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0),
                    var=Continuous(0.0, 1.0), dof=[[2]], neval=1e5, niter=5,
                    solver="vegasplus", verbose=-2, seed=21, backend="pallas")
    check(res, np.pi / 4)


def test_pallas_singular_matches_xla():
    """The D=1 singular anchor (R=1, lanes subsume the map) vs exact."""
    def f(x, c):
        return jnp.log(x[0]) / jnp.sqrt(x[0])

    res = integrate(f, var=Continuous(0.0, 1.0), dof=[[1]], neval=1e5,
                    niter=6, solver="vegasplus", verbose=-2, seed=22,
                    backend="pallas")
    check(res, -4.0)


def test_pallas_padding_multi_dof():
    """dof < maxdof through the fused kernel's padding algebra."""
    def f(x, c):
        return x[0], jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)

    res = integrate(f, var=Continuous(0.0, 1.0), dof=[[1], [2]], neval=1e5,
                    niter=5, solver="vegasplus", verbose=-2, seed=23,
                    backend="pallas")
    check(res, [0.5, np.pi / 4])


def test_pallas_lane_reallocation():
    """Neyman reallocation moves lanes toward the peaked region."""
    from mcintegration_tpu.configuration import Configuration
    from mcintegration_tpu.solvers.engine import Spec
    from mcintegration_tpu.solvers.vegasplus import VegasPlusIteration
    import jax

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=31)
    spec = Spec(cfg)
    it = VegasPlusIteration(
        spec, lambda x, c: jnp.exp(-50 * ((x[0] - 0.3) ** 2 + (x[1] - 0.7) ** 2)),
        block=4, nevalperblock=40000, backend="pallas")
    assert it.backend == "pallas"
    params = spec.device_params()
    l0 = it.lanes.copy()
    it.run(params, jax.random.key(0))
    assert it.lanes.sum() == l0.sum()
    assert not np.array_equal(it.lanes, l0), "lanes should adapt"
    assert it.lanes.min() >= 1 and it.lanes.max() > it.lanes.min()


def test_pallas_fallbacks():
    """Specs the fused kernel cannot serve run the XLA pipeline."""
    from mcintegration_tpu.configuration import Configuration
    from mcintegration_tpu.solvers.engine import Spec
    from mcintegration_tpu.solvers.vegasplus import VegasPlusIteration

    def build(var, dof, **kw):
        cfg = Configuration(var=var, dof=dof, seed=5, **kw)
        return Configuration, Spec(cfg)

    # Discrete passenger -> XLA
    _, spec = build((Continuous(0.0, 1.0), Discrete(1, 4)), [[2, 1]])
    it = VegasPlusIteration(spec, lambda x, c: x[0][0], block=4,
                            nevalperblock=40000, backend="pallas")
    assert it.backend == "xla"
    # custom measure -> XLA
    _, spec = build(Continuous(0.0, 1.0), [[2]])
    it = VegasPlusIteration(spec, lambda x, c: x[0], block=4,
                            nevalperblock=40000, backend="pallas",
                            measure=lambda v, rw, c: rw,
                            obs_proto=np.zeros(1, np.float32))
    assert it.backend == "xla"
    # budget too small for any stratification (8 * 2^D > nevalperblock)
    _, spec = build(Continuous(0.0, 1.0), [[2]])
    it = VegasPlusIteration(spec, lambda x, c: x[0], block=4,
                            nevalperblock=16, backend="pallas")
    assert it.backend == "xla"


def test_discrete_passenger_with_padding():
    """Both round-2 features at once: the first integrand ignores the
    Discrete slot and one Continuous slot."""
    def f(x, c):
        t, d = x
        return t[0], t[0] * t[1] * d[0].astype(jnp.float32)

    res = integrate(f, var=(Continuous(0.0, 1.0), Discrete(1, 4)),
                    dof=[[1, 0], [2, 1]], neval=2e5, niter=8,
                    solver="vegasplus", verbose=-2, seed=7)
    check(res, [0.5, 2.5])


def test_vplus_pow2_shadow_nonpow2_ninc():
    """Non-pow2 (and >1024) Continuous grids stratify at full resolution
    through the pow2 shadow resample (round 5): ninc=1000 previously
    limited nstrat to the pow2 divisors of 1000 (max 8), collapsing the
    cube budget; now the kernel stratifies the resampled 1024-increment
    map and the training histogram flows back to the user's 1000 bins."""
    import jax.numpy as jnp
    import numpy as np

    from mcintegration_tpu import Continuous, integrate

    f = lambda x, c: -jnp.log(jnp.maximum(x[0], 1e-30)) \
        / jnp.sqrt(jnp.maximum(x[0], 1e-30)) / 4.0
    r = integrate(f, var=Continuous(0.0, 1.0, ninc=1000), dof=[[1]],
                  neval=2 ** 17, niter=4, solver="vegasplus",
                  backend="pallas", parallel="none", verbose=-2, seed=11)
    assert r.backend == "pallas", r.backend_reason
    g = r.config.var[0].grid
    assert len(g) - 1 == 1000                      # user resolution kept
    assert not np.allclose(g, np.linspace(0, 1, 1001))   # and adapted
    m = float(np.asarray(r.mean[0]))
    e = float(np.asarray(r.stdev[0]))
    assert abs(m - 1.0) < 10 * max(e, 1e-4), (m, e)
