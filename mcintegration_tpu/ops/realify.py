"""Complex-to-real-pairs jaxpr interpreter (``realify``).

Mosaic (Pallas TPU) has no complex element type, but the reference's
oscillatory physics integrands are complex-valued
(src/statistics.jl:24-55 treats re/im as independent channels, and the
docs recommend the Markov solvers for oscillatory integrands).  To serve
complex integrands inside fused kernels, ``realify`` re-evaluates a traced
user function with every complex intermediate represented as an
``(re, im)`` float32 pair, using explicit rewrite rules for the primitives
complex physics integrands use (mul/div/exp/sin/cos/log/sqrt/abs/...).

The transform is exact in structure (same operations, re/im arithmetic
written out) — results match the complex evaluation to f32 rounding, and
the solver proves that numerically with a jitted probe before enabling a
fused path (falling back to the XLA pipeline on any mismatch or on a
complex primitive without a rule).

Usage::

    fn_pairs = realify(fn)          # same signature, real args
    out = fn_pairs(*args)           # complex outputs become (re, im) tuples
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.extend import core as jcore


class RealifyError(NotImplementedError):
    """A complex-valued primitive without a realify rule was encountered."""


def _is_cpx_aval(aval) -> bool:
    return jnp.issubdtype(aval.dtype, jnp.complexfloating)


def _pair(x):
    """Promote a real array to an (re, im) pair."""
    if isinstance(x, tuple):
        return x
    return (x, jnp.zeros_like(x))


def _mul(a, b):
    ar, ai = a
    br, bi = b
    return (ar * br - ai * bi, ar * bi + ai * br)


def _div(a, b):
    ar, ai = a
    br, bi = b
    d = br * br + bi * bi
    return ((ar * br + ai * bi) / d, (ai * br - ar * bi) / d)


def _exp(a):
    ar, ai = a
    e = jnp.exp(ar)
    return (e * jnp.cos(ai), e * jnp.sin(ai))


def _abs2(a):
    ar, ai = a
    return ar * ar + ai * ai


def _eval_realified(jaxpr: jcore.Jaxpr, consts, *args):
    env = {}

    def read(v):
        if isinstance(v, jcore.Literal):
            val = v.val
            if np.iscomplexobj(val):
                return (jnp.asarray(np.real(val), jnp.float32),
                        jnp.asarray(np.imag(val), jnp.float32))
            return val
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        if np.iscomplexobj(c):
            c = np.asarray(c)
            write(v, (jnp.asarray(c.real, jnp.float32),
                      jnp.asarray(c.imag, jnp.float32)))
        else:
            write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        invals = [read(v) for v in eqn.invars]
        has_pair = any(isinstance(x, tuple) for x in invals)
        out_cpx = any(_is_cpx_aval(ov.aval) for ov in eqn.outvars)

        # nested jaxprs: recurse with the same environment convention
        if name in ("jit", "pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint",
                    "custom_vjp_call_jaxpr"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is None:
                raise RealifyError(f"call primitive {name} without jaxpr")
            if isinstance(inner, jcore.ClosedJaxpr):
                outs = _eval_realified(inner.jaxpr, inner.consts, *invals)
            else:
                outs = _eval_realified(inner, (), *invals)
            for ov, out in zip(eqn.outvars, outs):
                write(ov, out)
            continue

        if not has_pair and not out_cpx:
            outs = eqn.primitive.bind(*invals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
            for ov, out in zip(eqn.outvars, outs):
                write(ov, out)
            continue

        # ---- complex rules ----
        if name == "convert_element_type":
            x = invals[0]
            ndt = eqn.params["new_dtype"]
            if jnp.issubdtype(ndt, jnp.complexfloating):
                xr, xi = _pair(x) if isinstance(x, tuple) else (x, None)
                if xi is None:
                    out = (jnp.asarray(x, jnp.float32),
                           jnp.zeros_like(x, jnp.float32))
                else:
                    out = (jnp.asarray(xr, jnp.float32),
                           jnp.asarray(xi, jnp.float32))
            elif isinstance(x, tuple):
                raise RealifyError("complex->real convert (use .real)")
            else:
                out = eqn.primitive.bind(x, **eqn.params)
        elif name == "complex":
            out = (invals[0], invals[1])
        elif name == "real":
            out = invals[0][0]
        elif name == "imag":
            out = invals[0][1]
        elif name == "conj":
            xr, xi = _pair(invals[0])
            out = (xr, -xi)
        elif name == "abs":
            out = jnp.sqrt(_abs2(_pair(invals[0])))
        elif name == "add":
            a, b = _pair(invals[0]), _pair(invals[1])
            out = (a[0] + b[0], a[1] + b[1])
        elif name == "sub":
            a, b = _pair(invals[0]), _pair(invals[1])
            out = (a[0] - b[0], a[1] - b[1])
        elif name == "neg":
            xr, xi = _pair(invals[0])
            out = (-xr, -xi)
        elif name == "mul":
            out = _mul(_pair(invals[0]), _pair(invals[1]))
        elif name == "div":
            a, b = invals
            if not isinstance(b, tuple):       # complex / real: elementwise
                ar, ai = _pair(a)
                out = (ar / b, ai / b)
            else:
                out = _div(_pair(a), _pair(b))
        elif name == "exp":
            out = _exp(_pair(invals[0]))
        elif name == "log":
            xr, xi = _pair(invals[0])
            out = (0.5 * jnp.log(xr * xr + xi * xi), jnp.arctan2(xi, xr))
        elif name == "sqrt":
            # principal branch via polar form
            xr, xi = _pair(invals[0])
            r = jnp.sqrt(jnp.sqrt(xr * xr + xi * xi))
            th = 0.5 * jnp.arctan2(xi, xr)
            out = (r * jnp.cos(th), r * jnp.sin(th))
        elif name == "sin":
            xr, xi = _pair(invals[0])
            out = (jnp.sin(xr) * jnp.cosh(xi), jnp.cos(xr) * jnp.sinh(xi))
        elif name == "cos":
            xr, xi = _pair(invals[0])
            out = (jnp.cos(xr) * jnp.cosh(xi), -jnp.sin(xr) * jnp.sinh(xi))
        elif name == "integer_pow":
            y = eqn.params["y"]
            if y < 0 or y > 8:
                raise RealifyError(f"complex integer_pow y={y}")
            acc = None
            base = _pair(invals[0])
            for _ in range(y):
                acc = base if acc is None else _mul(acc, base)
            out = acc if acc is not None else (
                jnp.ones_like(base[0]), jnp.zeros_like(base[0]))
        elif name == "select_n":
            pred = invals[0]
            cases = [_pair(x) for x in invals[1:]]
            out = (jax.lax.select_n(pred, *[c[0] for c in cases]),
                   jax.lax.select_n(pred, *[c[1] for c in cases]))
        elif name in ("broadcast_in_dim", "reshape", "transpose", "squeeze",
                      "expand_dims", "slice", "rev", "copy"):
            xr, xi = _pair(invals[0])
            out = (eqn.primitive.bind(xr, **eqn.params),
                   eqn.primitive.bind(xi, **eqn.params))
        elif name == "concatenate":
            pairs = [_pair(x) for x in invals]
            out = (eqn.primitive.bind(*[p[0] for p in pairs], **eqn.params),
                   eqn.primitive.bind(*[p[1] for p in pairs], **eqn.params))
        elif name == "reduce_sum":
            xr, xi = _pair(invals[0])
            out = (eqn.primitive.bind(xr, **eqn.params),
                   eqn.primitive.bind(xi, **eqn.params))
        else:
            raise RealifyError(f"no realify rule for primitive {name!r}")

        if not eqn.primitive.multiple_results:
            write(eqn.outvars[0], out)
        else:
            raise RealifyError(f"multi-result complex primitive {name!r}")

    return [read(v) for v in jaxpr.outvars]


def realify(fn):
    """Wrap ``fn`` so complex intermediates evaluate as (re, im) f32 pairs.

    The wrapped function takes the same (real) arguments; complex outputs
    come back as (re, im) tuples, real outputs unchanged.  Raises
    :class:`RealifyError` at trace time for unsupported complex primitives
    — callers catch it and fall back to the XLA pipeline.
    """
    def wrapped(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)
        closed = jax.make_jaxpr(
            lambda *fargs: fn(*jax.tree_util.tree_unflatten(in_tree, fargs))
        )(*flat)
        outs = _eval_realified(closed.jaxpr, closed.consts, *flat)
        # rebuild the output pytree: complex leaves became pair tuples
        out_avals = closed.out_avals
        rebuilt = [tuple(o) if _is_cpx_aval(a) else o
                   for o, a in zip(outs, out_avals)]
        # out_tree of the original fn: recover via eval_shape
        shape_out = jax.eval_shape(
            lambda *fargs: fn(*jax.tree_util.tree_unflatten(in_tree, fargs)),
            *flat)
        _, out_tree = jax.tree_util.tree_flatten(shape_out)
        return jax.tree_util.tree_unflatten(out_tree, rebuilt)

    return wrapped
