"""Unit tests for the complex-to-real-pairs transform (ops/realify.py).

The transform lets fused Mosaic kernels (no complex element type on TPU)
serve the reference's complex physics integrands; correctness contract:
realified evaluation == complex evaluation to f32 rounding, and a clean
RealifyError (-> XLA fallback) for complex primitives without a rule.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcintegration_tpu.ops.realify import RealifyError, realify


def _as_complex(p):
    return (p[0] + 1j * p[1]) if isinstance(p, tuple) else p


def _check(fn, *args, tol=3e-5):
    """fn must return a flat tuple of outputs (complex ones come back as
    (re, im) pairs — a 2-tuple of arrays, distinguishable here because the
    test functions never return nested containers)."""
    exact = fn(*args)
    got = realify(fn)(*args)
    if not isinstance(exact, tuple):
        exact, got = (exact,), (got,)
    assert len(exact) == len(got)
    for e, g in zip(exact, got):
        np.testing.assert_allclose(np.asarray(_as_complex(g)),
                                   np.asarray(e), rtol=tol, atol=tol)


X = jnp.linspace(0.1, 2.0, 16, dtype=jnp.float32)


def test_arithmetic_and_transcendentals():
    def f(x):
        z = jnp.exp(1j * x) * (2.0 + x)
        w = z / (1.0 + 1j * x ** 2)
        return (jnp.abs(w), w, jnp.real(w * jnp.conj(w)),
                jnp.sqrt(w), jnp.log(w + 2.0), w ** 3,
                jnp.sin(w) + jnp.cos(w), -w, w - z)

    _check(f, X)


def test_select_and_shapes():
    def f(x):
        z = jnp.where(x > 1.0, jnp.exp(1j * x), 1.0 + 0j)
        return jnp.sum(jnp.reshape(z, (4, 4)), axis=0), z[None, :]

    _check(f, X)


def test_real_only_passthrough():
    def f(x):
        return jnp.sin(x) * jnp.sqrt(x) + x ** 2

    _check(f, X)


def test_under_jit_and_vmap():
    fn = realify(lambda t: jnp.exp(1j * t))
    out = jax.jit(jax.vmap(lambda t: fn(t)[0]))(X)
    np.testing.assert_allclose(np.asarray(out), np.cos(np.asarray(X)),
                               rtol=1e-5, atol=1e-6)


def test_unsupported_primitive_raises():
    with pytest.raises(RealifyError):
        realify(lambda t: jnp.fft.fft(t + 0j))(X)
