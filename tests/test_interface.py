"""Interface smoke tests (mirrors reference test/interface_tests.jl)."""

import numpy as np
import jax.numpy as jnp

from mcintegration_tpu import Continuous, integrate


def test_unknown_kwargs_swallowed():
    # unknown kwargs flow into Configuration(**kwargs) and are ignored
    # (reference test/interface_tests.jl:1-6)
    res = integrate(lambda x, c: x[0], neval=2048, niter=2, verbose=-2,
                    solver="vegas", vars=Continuous(0.0, 1.0), seed=1)
    assert np.isfinite(float(np.asarray(res.mean[0])))


def test_userdata_passthrough():
    res = integrate(lambda x, c: x[0] * c.userdata, neval=4096, niter=3,
                    var=Continuous(0.0, 1.0), dof=[[1]], userdata=2.0,
                    solver="vegas", verbose=-2, seed=2)
    assert abs(float(np.asarray(res.mean[0])) - 1.0) < 0.05


def test_result_indexing_and_repr():
    res = integrate(lambda x, c: x[0], neval=4096, niter=3,
                    var=Continuous(0.0, 1.0), dof=[[1]],
                    solver="vegas", verbose=-2, seed=3)
    m, e, c = res[0]
    assert np.isfinite(float(np.asarray(m)))
    assert "Integral" in repr(res)
    assert res.neval > 0


def test_solver_symbol_colon_prefix():
    # accept ':vegas' spelling for familiarity with the reference API
    res = integrate(lambda x, c: x[0], neval=2048, niter=2,
                    var=Continuous(0.0, 1.0), dof=[[1]],
                    solver=":vegas", verbose=-2, seed=4)
    assert np.isfinite(float(np.asarray(res.mean[0])))
