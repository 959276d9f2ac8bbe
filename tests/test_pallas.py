"""Pallas fast-path tests (ops/pallas_vegas.py), run in TPU-interpret mode.

On CPU the interpret path substitutes a counter-hash RNG for the hardware
PRNG (see ops/pallas_vegas.py:_make_rng), so these tests exercise every
kernel line except the hardware prng primitive itself.  Real-chip accuracy
is covered by bench.py's 5-sigma sanity gate and benchmarks/suite.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcintegration_tpu.configuration import Configuration
from mcintegration_tpu.models.variable import Continuous, Discrete
from mcintegration_tpu.solvers.engine import Spec
from mcintegration_tpu.solvers.vegas import VegasIteration


def _pi(x, c):
    return jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)


def _run(it, seed=3):
    st = it.run(it.spec.device_params(), jax.random.key(seed))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    return st, m.mean(), m.std(ddof=1) / np.sqrt(len(m))


def test_pallas_pi_statistical():
    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1)
    spec = Spec(cfg)
    it = VegasIteration(spec, _pi, block=8, nevalperblock=2 ** 15,
                        backend="pallas")
    assert it.backend == "pallas"
    st, mean, err = _run(it)
    assert abs(mean - np.pi / 4) < 7 * max(err, 1e-9)
    # histogram collected for training
    assert st["hists"][0].sum() > 0


def test_pallas_matches_xla_statistically():
    res = {}
    for be in ("xla", "pallas"):
        cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=5)
        spec = Spec(cfg)
        it = VegasIteration(spec, _pi, block=8, nevalperblock=2 ** 15,
                            backend=be)
        _, mean, err = _run(it)
        res[be] = (mean, err)
    d = abs(res["xla"][0] - res["pallas"][0])
    s = np.hypot(res["xla"][1], res["pallas"][1])
    assert d < 7 * max(s, 1e-9)


def test_pallas_deterministic_same_seed():
    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1)
    spec = Spec(cfg)
    it = VegasIteration(spec, _pi, block=4, nevalperblock=2 ** 14,
                        backend="pallas")
    p = spec.device_params()
    a = it.run(p, jax.random.key(9))
    b = it.run(p, jax.random.key(9))
    assert np.array_equal(a["obs_blocks"], b["obs_blocks"])


def test_pallas_padding_multi_integrand():
    # two integrands with different dof: exercises the padding factors
    def f(x, c):
        return (x[0], jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0))

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[1], [2]], seed=2)
    spec = Spec(cfg)
    it = VegasIteration(spec, f, block=8, nevalperblock=2 ** 15,
                        backend="pallas")
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(4))
    m0 = st["obs_blocks"][:, 0] / st["norm_blocks"]
    m1 = st["obs_blocks"][:, 1] / st["norm_blocks"]
    e0 = m0.std(ddof=1) / np.sqrt(8)
    e1 = m1.std(ddof=1) / np.sqrt(8)
    assert abs(m0.mean() - 0.5) < 7 * max(e0, 1e-9)
    assert abs(m1.mean() - np.pi / 4) < 7 * max(e1, 1e-9)


def test_pallas_fallbacks_to_xla():
    # Discrete leaf cannot stratify -> xla
    cfg = Configuration(var=(Continuous(0.0, 1.0), Discrete(1, 10)),
                        dof=[[1, 1]], seed=1)
    spec = Spec(cfg)
    it = VegasIteration(spec, lambda x, c: x[0][0] * 1.0, block=4,
                        nevalperblock=2 ** 12, backend="auto")
    assert it.backend == "xla"

    # measurefreq > 1 -> xla
    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1)
    spec = Spec(cfg)
    it = VegasIteration(spec, _pi, block=4, nevalperblock=2 ** 12,
                        measurefreq=2, backend="auto")
    assert it.backend == "xla"

    # non-elementwise integrand (couples samples) -> caught by the
    # validate_batched equivalence probe -> xla
    def bad(x, c):
        return x[0] * jnp.mean(x)  # mean over slots per sample vs global

    spec = Spec(Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1))
    it = VegasIteration(spec, bad, block=4, nevalperblock=2 ** 12,
                        backend="pallas")
    assert it.backend == "xla"


def test_pallas_integrate_end_to_end():
    """Full adaptive run through integrate() with the pallas backend."""
    from mcintegration_tpu.main import integrate

    res = integrate(lambda x, c: -jnp.log(jnp.maximum(x[0], 1e-30))
                    / jnp.sqrt(jnp.maximum(x[0], 1e-30)) / 4.0,
                    var=Continuous(0.0, 1.0), dof=[[1]], neval=2 ** 16,
                    niter=4, block=8, verbose=-2, seed=11,
                    solver="vegas", backend="pallas")
    mean = float(np.asarray(res.mean[0]))
    err = float(np.asarray(res.stdev[0]))
    assert abs(mean - 1.0) < 10 * max(err, 1e-9)


# ---------------------------------------------------------------------------
# :vegasmc fused chain kernel (ops/pallas_chain.py)
# ---------------------------------------------------------------------------

def test_chain_matches_xla_statistically():
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    res = {}
    for be in ("xla", "pallas"):
        cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=5)
        spec = Spec(cfg)
        it = VegasMCIteration(spec, _pi, block=4, nevalperblock=2 ** 15,
                              backend=be, nwalkers=8192)
        assert it.backend == be
        st = it.run(spec.device_params(), jax.random.key(3))
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        acc = st["accept"][1, 0, 0] / max(st["propose"][1, 0, 0], 1)
        res[be] = (m.mean(), m.std(ddof=1) / 2, acc)
    d = abs(res["xla"][0] - res["pallas"][0])
    s = np.hypot(res["xla"][1], res["pallas"][1])
    assert d < 7 * max(s, 1e-9)
    # chain law parity: acceptance rates agree closely
    assert abs(res["xla"][2] - res["pallas"][2]) < 0.02


def test_chain_fallbacks():
    from mcintegration_tpu.models.variable import FermiK
    from mcintegration_tpu.solvers.mcmc import MCMCIteration

    # non-power-of-two ninc is served FUSED since round 5 through the
    # pow2 shadow resample (engine.pow2_shadow; test_pow2_shadow_*)
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration
    cfg = Configuration(var=Continuous(0.0, 1.0, ninc=1000), dof=[[2]],
                        seed=1)
    spec = Spec(cfg)
    it = VegasMCIteration(spec, _pi, block=4, nevalperblock=2 ** 12,
                          backend="pallas", nwalkers=4096)
    assert it.backend == "pallas"

    # per-sample-style measure that cannot broadcast -> caught by the
    # measure equivalence probe -> xla
    def meas(v, relw, c):
        return [jnp.stack([relw[0], relw[0] ** 2])]   # shape (2,) per sample

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1,
                        obs=[np.zeros(2)])
    spec = Spec(cfg)
    it = VegasMCIteration(spec, _pi, block=4, nevalperblock=2 ** 12,
                          backend="pallas", measure=meas,
                          obs_proto=[np.zeros(2)])
    assert it.backend == "xla"


def test_chain_discrete_pool_statistical():
    """Discrete pools now run inside the chain kernel (CDF inversion)."""
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    def f(x, c):
        t, d = x
        return t[0] * d[0].astype(jnp.float32)

    cfg = Configuration(var=(Continuous(0.0, 1.0), Discrete(1, 4)),
                        dof=[[1, 1]], seed=3)
    spec = Spec(cfg)
    it = VegasMCIteration(spec, f, block=4, nevalperblock=2 ** 15,
                          backend="pallas", nwalkers=8192)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(6))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    # sum_d int t*d dt = 0.5*(1+2+3+4) = 5
    assert abs(m.mean() - 5.0) < 10 * max(err, 0.05), (m.mean(), err)


def test_wide_discrete_draw_exact_law():
    """The two-level threshold-count draw (pallas_chain.wide_discrete_draw)
    reproduces the exact inverse-CDF law gidx = #{k: u >= cdf[k+1]}
    (sampler.jl:13-22) and the matching bin probability, for nbin both at
    a block boundary and ragged."""
    from mcintegration_tpu.ops.pallas_chain import (
        wide_discrete_draw, wide_discrete_tables)

    rng = np.random.default_rng(7)
    S, LN = 8, 128
    for nbin in (100, 128, 33, 1024):
        w = rng.dirichlet(np.ones(nbin) * 0.2)     # skewed distribution
        cdf = jnp.asarray(np.concatenate([[0.0], np.cumsum(w)]), jnp.float32)
        ccdf, cf, df = wide_discrete_tables(cdf, nbin)
        u = jnp.asarray(rng.uniform(0, 1, (S, LN)), jnp.float32)
        gidx, prob = wide_discrete_draw(u, ccdf, cf, df, nbin, S, LN)
        cdf_np = np.asarray(cdf)
        want = (np.asarray(u)[..., None] >= cdf_np[None, None, 1:]).sum(-1)
        assert np.array_equal(np.asarray(gidx), want), nbin
        dist_np = cdf_np[1:] - cdf_np[:-1]
        assert np.allclose(np.asarray(prob), dist_np[want], rtol=1e-6), nbin


def test_wide_discrete_draw_clamps_into_last_real_bin():
    """u >= f32(cdf[nbin]) must land in the last REAL bin, never a zero-
    probability pad bin.  f32 rounding of the cumulative sum can leave
    cdf[nbin] < 1, and before the round-4 clamp a u drawn above it walked
    into the pad region (prob 0 -> divide-by-zero in the chain acceptance,
    measured as a +5 sigma bias on the wide-Discrete pi-series on-chip).
    Reference semantics: `locate` bisection returns the last bin for
    u >= cdf[end] (common.jl:8-36)."""
    from mcintegration_tpu.ops.pallas_chain import (
        wide_discrete_draw, wide_discrete_tables)

    nbin = 100
    # a cdf whose f32 top entry sits strictly below 1.0 (what f32 rounding
    # of a cumulative sum can produce)
    top32 = np.nextafter(np.float32(1.0), np.float32(0.0))
    cdf32 = np.linspace(0.0, 1.0, nbin + 1).astype(np.float32)
    cdf32[-1] = top32
    cdf = jnp.asarray(cdf32, jnp.float32)
    assert float(cdf32[-1]) < 1.0
    S, LN = 8, 128
    u = jnp.full((S, LN), np.nextafter(np.float32(1.0), np.float32(0.0)),
                 jnp.float32)                      # largest u below 1
    ccdf, cf, df = wide_discrete_tables(cdf, nbin)
    gidx, prob = wide_discrete_draw(u, ccdf, cf, df, nbin, S, LN)
    assert int(np.asarray(gidx).max()) == nbin - 1
    assert float(np.asarray(prob).min()) > 0.0


def test_kahan_add_compensates_long_sums():
    """kahan_add keeps f32 running sums exact where the naive sum drifts
    systematically — the mechanism behind the -11 sigma mcmc bias at
    neval=2^32 fixed in round 4 (constant-magnitude increments produce a
    drifting rounding pattern at 2^16 adds; the reference accumulates in
    f64, montecarlo.jl:158-170)."""
    from mcintegration_tpu.ops.pallas_chain import kahan_add

    inc = jnp.float32(1.0 / 3.0)          # full-mantissa constant increment
    n = 1 << 16

    def step(_, c):
        (s, comp), naive = c
        s, comp = kahan_add(s, comp, inc)
        return (s, comp), naive + inc

    (s, _), naive = jax.lax.fori_loop(
        0, n, step, ((jnp.float32(0.0), jnp.float32(0.0)), jnp.float32(0.0)))
    exact = n / 3.0
    kahan_err = abs(float(s) - exact)
    naive_err = abs(float(naive) - exact)
    assert kahan_err < 1e-2, kahan_err               # O(1 ulp of the total)
    assert naive_err > 10 * max(kahan_err, 1e-3), (naive_err, kahan_err)


def test_chain_wide_discrete_pi_series():
    """The BASELINE config 'Discrete(1,100) pi Taylor series' rides the
    fused path: MAX_DISCRETE_NBIN lifted 32 -> 1024 via the two-level
    threshold-count draw (round-3 verdict item 5b)."""
    from mcintegration_tpu.main import integrate
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    NB = 100

    def f(x, c):
        n = x[0].astype(jnp.float32)
        return 4.0 * jnp.where(jnp.mod(n, 2.0) == 1.0, 1.0, -1.0) \
            / (2.0 * n - 1.0)

    exact = float(sum(4 * (-1) ** (k + 1) / (2 * k - 1)
                      for k in range(1, NB + 1)))  # ~3.13159
    cfg = Configuration(var=Discrete(1, NB), dof=[[1]], seed=3)
    spec = Spec(cfg)
    # 256 steps/walker + 25% warmup: signed 100-bin chains need room to
    # equilibrate before the ratio estimator is trustworthy (the same
    # short-chain bias exists on the XLA path — measured 1.4 vs 3.13 at
    # 64 steps with zero warmup, either backend)
    it = VegasMCIteration(spec, f, block=2, nevalperblock=2 ** 18,
                          backend="pallas", nwalkers=2048, warmup=0.25)
    assert it.backend == "pallas"          # eligibility flip: was XLA-only
    st = it.run(spec.device_params(), jax.random.key(6))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    # sum_n f(n): the Discrete pool integrates the series directly
    assert abs(m.mean() - exact) < 10 * max(err, 0.05), (m.mean(), err)

    # nbin beyond the lifted cap still routes to XLA
    cfg = Configuration(var=Discrete(1, 2000), dof=[[1]], seed=3)
    it = VegasMCIteration(Spec(cfg), f, block=2, nevalperblock=2 ** 16,
                          backend="pallas", nwalkers=2048)
    assert it.backend == "xla"


def test_mcmc_wide_discrete_pi_series():
    """Same BASELINE config through the fused :mcmc kernel (the solver the
    baseline names), with adaptive reweight via integrate()."""
    from mcintegration_tpu.main import integrate

    NB = 100
    exact = float(sum(4 * (-1) ** (k + 1) / (2 * k - 1)
                      for k in range(1, NB + 1)))

    def f(i, x, c):
        n = x[0].astype(jnp.float32)
        return 4.0 * jnp.where(jnp.mod(n, 2.0) == 1.0, 1.0, -1.0) \
            / (2.0 * n - 1.0)

    res = integrate(f, var=Discrete(1, NB), dof=[[1]], neval=600_000,
                    niter=4, block=2, verbose=-2, seed=5, solver="mcmc",
                    backend="pallas", nwalkers=2048)
    mean = float(np.asarray(res.mean[0]))
    err = float(np.asarray(res.stdev[0]))
    assert abs(mean - exact) < 10 * max(err, 0.05), (mean, err)


def test_chain_custom_measure_vector_obs():
    """Broadcast-friendly vector measure runs inside the chain kernel —
    the bubble-shaped spec (Continuous + Discrete external index)."""
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    Q = 3

    def f(x, c):
        t, d = x
        return t[0] + 0.1 * d[0].astype(jnp.float32)

    def meas(v, relw, c):
        t, d = v
        onehot = (jnp.arange(1, Q + 1).reshape(Q, 1, 1) ==
                  d[0][None]).astype(relw.dtype)
        return [onehot * relw[0][None]]

    obs = [np.zeros(Q)]
    cfg = Configuration(var=(Continuous(0.0, 1.0), Discrete(1, Q)),
                        dof=[[1, 1]], seed=4, obs=obs)
    spec = Spec(cfg)
    it = VegasMCIteration(spec, f, block=4, nevalperblock=2 ** 15,
                          backend="pallas", nwalkers=8192,
                          measure=meas, obs_proto=obs)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(8))
    nb = st["norm_blocks"]
    ob = st["obs_blocks"][0]          # [block, Q]
    for q in range(Q):
        m = ob[:, q] / nb
        err = m.std(ddof=1) / np.sqrt(len(m))
        exact = 0.5 + 0.1 * (q + 1)   # int (t + 0.1 d) dt at d = q+1
        assert abs(m.mean() - exact) < 10 * max(err, 0.02), (q, m.mean(), err)


def test_chain_measurefreq():
    """measurefreq > 1 runs on the chain kernel (VERDICT item 2)."""
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=5)
    spec = Spec(cfg)
    it = VegasMCIteration(spec, _pi, block=4, nevalperblock=2 ** 15,
                          backend="pallas", nwalkers=8192, measurefreq=3)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(3))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    assert abs(m.mean() - np.pi / 4) < 10 * max(err, 5e-3)


def test_chain_complex_statistical():
    """Complex integrands run fused as (re, im) f32 pairs (ops/realify.py);
    kernel matches the XLA pipeline and the exact quarter-disc phase
    integral.  Reference complex handling: src/statistics.jl:24-55."""
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    def fc(x, c):
        inside = jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)
        return inside * jnp.exp(1j * (x[0] + x[1]))

    # dblquad of e^{i(x+y)} over the quarter disc
    EXACT = 0.4930385477642199 + 0.5622057316603964j
    res = {}
    for be in ("xla", "pallas"):
        cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=5,
                            type=complex)
        spec = Spec(cfg)
        it = VegasMCIteration(spec, fc, block=4, nevalperblock=2 ** 15,
                              backend=be, nwalkers=8192,
                              weight_dtype=jnp.complex64)
        assert it.backend == be
        st = it.run(spec.device_params(), jax.random.key(3))
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        mean = m.mean()
        err = (m.real.std(ddof=1) + 1j * m.imag.std(ddof=1)) / 2
        res[be] = (mean, err)
        assert abs(mean.real - EXACT.real) < 10 * max(err.real, 1e-9)
        assert abs(mean.imag - EXACT.imag) < 10 * max(err.imag, 1e-9)
    d = res["xla"][0] - res["pallas"][0]
    s = np.hypot(abs(res["xla"][1]), abs(res["pallas"][1]))
    assert abs(d) < 7 * max(s, 1e-9)


def test_chain_complex_custom_measure():
    """Complex custom measures run inside the chain kernel: the measure is
    lifted through realify with (re, im) pair relative weights, complex
    observable components accumulate as separate re/im channels and come
    back as one complex vector observable (the oscillatory bubble shape:
    Continuous time + Discrete external index)."""
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    Q = 3

    def f(x, c):
        t, d = x
        return jnp.exp(1j * t[0])

    def meas(v, relw, c):
        t, d = v
        onehot = (jnp.arange(1, Q + 1).reshape(Q, 1, 1) ==
                  d[0][None]).astype(jnp.float32)
        return [onehot * relw[0][None]]

    # per external index q: int_0^1 e^{it} dt = sin(1) + i(1 - cos(1))
    exact = np.sin(1.0) + 1j * (1.0 - np.cos(1.0))
    obs = [np.zeros(Q, np.complex64)]
    cfg = Configuration(var=(Continuous(0.0, 1.0), Discrete(1, Q)),
                        dof=[[1, 1]], seed=4, obs=obs, type=complex)
    spec = Spec(cfg)
    it = VegasMCIteration(spec, f, block=4, nevalperblock=2 ** 15,
                          backend="pallas", nwalkers=8192,
                          weight_dtype=jnp.complex64,
                          measure=meas, obs_proto=obs)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(8))
    nb = st["norm_blocks"]
    ob = st["obs_blocks"][0]          # [block, Q] complex
    assert np.iscomplexobj(ob)
    for q in range(Q):
        m = ob[:, q] / nb
        er = m.real.std(ddof=1) / np.sqrt(len(m))
        ei = m.imag.std(ddof=1) / np.sqrt(len(m))
        assert abs(m.mean().real - exact.real) < 10 * max(er, 0.02), (q, m)
        assert abs(m.mean().imag - exact.imag) < 10 * max(ei, 0.02), (q, m)


def test_chain_integrate_adaptive():
    from mcintegration_tpu.main import integrate

    res = integrate(lambda x, c: -jnp.log(jnp.maximum(x[0], 1e-30))
                    / jnp.sqrt(jnp.maximum(x[0], 1e-30)) / 4.0,
                    var=Continuous(0.0, 1.0), dof=[[1]], neval=2 ** 16,
                    niter=4, block=4, verbose=-2, seed=11,
                    solver="vegasmc", backend="pallas", nwalkers=4096)
    mean = float(np.asarray(res.mean[0]))
    err = float(np.asarray(res.stdev[0]))
    assert abs(mean - 1.0) < 10 * max(err, 1e-9)


def test_pallas_sharded_over_mesh():
    """Both Pallas kernels compose with shard_map over the CPU mesh."""
    from mcintegration_tpu.parallel.mesh import make_mesh
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(ndev)

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1)
    spec = Spec(cfg)
    it = VegasIteration(spec, _pi, block=2 * ndev, nevalperblock=2 ** 14,
                        mesh=mesh, backend="pallas")
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(3))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    assert abs(m.mean() - np.pi / 4) < 7 * max(err, 1e-9)

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=2)
    spec = Spec(cfg)
    it = VegasMCIteration(spec, _pi, block=ndev, nevalperblock=2 ** 15,
                          mesh=mesh, backend="pallas", nwalkers=ndev * 2048)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(4))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    assert abs(m.mean() - np.pi / 4) < 10 * max(err, 1e-9)


# ---------------------------------------------------------------------------
# :mcmc fused kernel (ops/pallas_mcmc.py)
# ---------------------------------------------------------------------------

def _mk_mcmc(integrand, *, dof, seed, neval, backend="pallas", ninc=128,
             var=None, nwalkers=2048, thermal=0.3, **kw):
    from mcintegration_tpu.solvers.mcmc import MCMCIteration

    cfg = Configuration(var=var if var is not None
                        else Continuous(0.0, 1.0, ninc=ninc),
                        dof=dof, seed=seed)
    spec = Spec(cfg)
    it = MCMCIteration(spec, integrand, block=2, nevalperblock=neval // 2,
                       backend=backend, nwalkers=nwalkers,
                       thermal_ratio=thermal, **kw)
    return spec, it


def _f2(i, x, c):
    r2 = x[0] ** 2 + x[1] ** 2
    return jnp.where(i == 0, jnp.where(r2 < 1.0, 1.0, 0.0),
                     jnp.where(r2 + x[2] ** 2 < 1.0, 1.0, 0.0))


def test_mcmc_pallas_multi_integrand_statistical():
    """Two integrands with different dof: exercises changeIntegrand
    create/remove, the norm-coin, CV and swap in the fused kernel."""
    spec, it = _mk_mcmc(_f2, dof=[[2], [3]], seed=11, neval=1_500_000)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(2))
    nb = st["norm_blocks"]
    for i, exact in ((0, np.pi / 4), (1, np.pi / 6)):
        m = st["obs_blocks"][:, i] / nb
        err = m.std(ddof=1) / np.sqrt(len(m))
        assert abs(m.mean() - exact) < 10 * max(err, 5e-3), (i, m.mean(), err)
    assert st["visited"].sum() > 0
    assert st["hists"][0].sum() > 0


def test_mcmc_pallas_matches_xla_statistically():
    res = {}
    for be in ("xla", "pallas"):
        spec, it = _mk_mcmc(
            lambda i, x, c: jnp.where(x[0] ** 2 + x[1] ** 2 < 1, 1.0, 0.0),
            dof=[[2]], seed=5, neval=1_000_000, backend=be)
        assert it.backend == be
        st = it.run(spec.device_params(), jax.random.key(3))
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        res[be] = (m.mean(), m.std(ddof=1) / np.sqrt(len(m)))
    for be in res:
        assert abs(res[be][0] - np.pi / 4) < 10 * max(res[be][1], 5e-3), res


def test_mcmc_pallas_discrete_pool():
    """Discrete pools run in-kernel via threshold-count CDF inversion."""
    from mcintegration_tpu.models.variable import Discrete as D

    def f(i, x, c):
        t, d = x
        return t[0] * d[0]          # E over uniform d in {1..4}: 2.5 * 0.5

    spec, it = _mk_mcmc(f, dof=[[1, 1]], seed=7, neval=1_000_000,
                        var=(Continuous(0.0, 1.0, ninc=128), D(1, 4)))
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(5))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    # E[t*d] integrated over t in [0,1], summed over d: 0.5*(1+2+3+4) = 5
    assert abs(m.mean() - 5.0) < 10 * max(err, 0.1), (m.mean(), err)


def test_mcmc_pallas_complex_statistical():
    """Complex integrands run fused as (re, im) f32 pairs (ops/realify.py);
    kernel matches the XLA scan path and the exact quarter-disc phase
    integral.  Reference complex handling: src/statistics.jl:207-214."""

    def fc(i, x, c):
        inside = jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)
        return inside * jnp.exp(1j * (x[0] + x[1]))

    EXACT = 0.4930147 + 0.5621625j   # dblquad over the quarter disc
    res = {}
    for be in ("xla", "pallas"):
        spec, it = _mk_mcmc(fc, dof=[[2]], seed=7, neval=1_200_000,
                            backend=be, weight_dtype=jnp.complex64)
        assert it.backend == be
        st = it.run(spec.device_params(), jax.random.key(5))
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        mean = m.mean()
        err = (m.real.std(ddof=1) + 1j * m.imag.std(ddof=1)) / 2
        res[be] = (mean, err)
        assert abs(mean.real - EXACT.real) < 10 * max(err.real, 1e-3)
        assert abs(mean.imag - EXACT.imag) < 10 * max(err.imag, 1e-3)
    d = res["xla"][0] - res["pallas"][0]
    s = np.hypot(abs(res["xla"][1]), abs(res["pallas"][1]))
    assert abs(d) < 7 * max(s, 1e-3)


def test_mcmc_pallas_complex_multi_integrand():
    """Two complex sectors: exercises the scheduled per-sector pair eval
    (the (2, S, 128) scratch dispatch) plus changeIntegrand jumps between
    complex-weighted sectors."""

    def fc(i, x, c):
        inside = jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)
        return jnp.where(i == 0, inside * jnp.exp(1j * (x[0] + x[1])),
                         inside * jnp.exp(2j * x[0]))

    EXACTS = (0.4930147 + 0.5621625j, 0.4529586 + 0.5079670j)
    spec, it = _mk_mcmc(fc, dof=[[2], [2]], seed=9, neval=2_000_000,
                        weight_dtype=jnp.complex64)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(6))
    nb = st["norm_blocks"]
    for i, exact in enumerate(EXACTS):
        m = st["obs_blocks"][:, i] / nb
        err = (m.real.std(ddof=1) + 1j * m.imag.std(ddof=1)) / 2
        assert abs(m.mean().real - exact.real) < 10 * max(err.real, 5e-3), i
        assert abs(m.mean().imag - exact.imag) < 10 * max(err.imag, 5e-3), i


def test_mcmc_pallas_deterministic_same_seed():
    spec, it = _mk_mcmc(
        lambda i, x, c: jnp.where(x[0] ** 2 + x[1] ** 2 < 1, 1.0, 0.0),
        dof=[[2]], seed=1, neval=300_000)
    p = spec.device_params()
    a = it.run(p, jax.random.key(9))
    b = it.run(p, jax.random.key(9))
    assert np.array_equal(a["obs_blocks"], b["obs_blocks"])


def test_mcmc_pallas_fallbacks():
    from mcintegration_tpu.models.variable import FermiK
    from mcintegration_tpu.solvers.mcmc import MCMCIteration

    # FermiK is served in-kernel since round 3 (shell x angle draws)
    cfg = Configuration(var=(Continuous(0.0, 1.0), FermiK(3, 1.0, 0.2, 10.0)),
                        dof=[[1, 1]], seed=1)
    it = MCMCIteration(Spec(cfg), lambda i, x, c: 1.0, block=2,
                       nevalperblock=2 ** 19, backend="pallas", nwalkers=2048)
    assert it.backend == "pallas"

    # broadcast-safe custom measures are served in-kernel since round 3
    from mcintegration_tpu import onehot

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1,
                        obs=[np.zeros(3)])
    it = MCMCIteration(Spec(cfg),
                       lambda i, x, c: 1.0,
                       measure=lambda i, x, w, c: [
                           onehot(i, 0, 2, w.dtype, like=w) * w],
                       obs_proto=[np.zeros(3)], block=2,
                       nevalperblock=2 ** 19, backend="pallas", nwalkers=2048)
    assert it.backend == "pallas"

    # a measure that fails the batched-equivalence probe -> xla
    def bad_measure(i, x, w, c):
        # silently collapses the sample axes: NOT per-sample equivalent
        return [jnp.full((3,), jnp.sum(w))]

    it = MCMCIteration(Spec(cfg),
                       lambda i, x, c: 1.0, measure=bad_measure,
                       obs_proto=[np.zeros(3)], block=2,
                       nevalperblock=2 ** 19, backend="pallas", nwalkers=2048)
    assert it.backend == "xla"

    # complex weights are served in-kernel since round 4 as (re, im)
    # f32 pairs (ops/realify.py); reference treats complex uniformly in
    # all solvers (src/statistics.jl:207-214)
    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1)
    it = MCMCIteration(Spec(cfg),
                       lambda i, x, c: jnp.exp(1j * x[0]), block=2,
                       nevalperblock=2 ** 19, backend="pallas",
                       nwalkers=2048, weight_dtype=jnp.complex64)
    assert it.backend == "pallas"
    assert it._pallas_cplx

    # complex + custom measure is served in-kernel since round 5 through
    # the realified pair measure path (make_measure_batched_idx_pairs) —
    # the last complex-uniformity hole on any fast path is closed
    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=1,
                        obs=[np.zeros(2)], type=complex)
    it = MCMCIteration(Spec(cfg),
                       lambda i, x, c: jnp.exp(1j * x[0]),
                       measure=lambda i, x, w, c: [
                           onehot(i, 0, 1, w.dtype, like=w) * w],
                       obs_proto=[np.zeros(2, np.complex64)], block=2,
                       nevalperblock=2 ** 19, backend="pallas",
                       nwalkers=2048, weight_dtype=jnp.complex64)
    assert it.backend == "pallas"
    assert not it._pallas_cplx     # marker-dict layout, decoded generically

    # short chains (auto walker budget, tiny neval) -> xla
    it = MCMCIteration(Spec(cfg),
                       lambda i, x, c: 1.0, block=2, nevalperblock=2 ** 12,
                       backend="auto")
    assert it.backend == "xla"


def test_mcmc_pallas_full_tally_tables():
    """The fused kernel reports the same per-(kind, sector, target)
    propose/accept tables as the XLA path (configuration.jl:345-465):
    same shape, same occupied cells, acceptance ratios within a few %."""
    out = {}
    for be in ("xla", "pallas"):
        spec, it = _mk_mcmc(
            lambda i, x, c: jnp.where(x[0] ** 2 + x[1] ** 2 < 1, 1.0, 0.0),
            dof=[[2]], seed=5, neval=1_000_000, backend=be)
        assert it.backend == be
        out[be] = it.run(spec.device_params(), jax.random.key(3))
    px, ax_ = out["xla"]["propose"], out["xla"]["accept"]
    pp, ap = out["pallas"]["propose"], out["pallas"]["accept"]
    assert px.shape == pp.shape and ax_.shape == ap.shape
    # same sparsity pattern (which (kind, sector, target) cells are active)
    thresh = 1.0
    assert np.array_equal(px > thresh, pp > thresh), (px, pp)
    # acceptance ratios agree cell-by-cell where proposals happened
    rx = ax_ / np.maximum(px, 1e-9)
    rp = ap / np.maximum(pp, 1e-9)
    mask = px > 100
    assert np.all(np.abs(rx[mask] - rp[mask]) < 0.05), (rx, rp)


def test_mcmc_pallas_fermik_statistical():
    """FermiK shell sampling in-kernel: k^2 over the 3-D Fermi shell times
    exp(-tau), checked against quadrature and against the XLA path."""
    from mcintegration_tpu.models.variable import FermiK

    kF, dk = 1.0, 0.2

    def f(i, x, c):
        K, T = x
        k2 = K[0][0] ** 2 + K[0][1] ** 2 + K[0][2] ** 2
        k = jnp.sqrt(k2)
        inside = (k > kF - dk) & (k < kF + dk)
        return jnp.where(inside, k2 * jnp.exp(-T[0]), 0.0)

    # int_{kF-dk}^{kF+dk} 4 pi k^4 dk * (1 - 1/e)
    exact = (4 * np.pi / 5 * ((kF + dk) ** 5 - (kF - dk) ** 5)
             * (1 - np.exp(-1.0)))
    res = {}
    for be in ("xla", "pallas"):
        spec, it = _mk_mcmc(f, dof=[[1, 1]], seed=21, neval=1_000_000,
                            backend=be,
                            var=(FermiK(3, kF, dk, 10.0),
                                 Continuous(0.0, 1.0, ninc=128)))
        assert it.backend == be
        st = it.run(spec.device_params(), jax.random.key(6))
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        res[be] = (m.mean(), m.std(ddof=1) / np.sqrt(len(m)))
    for be, (mean, err) in res.items():
        assert abs(mean - exact) < 10 * max(err, 5e-3), (be, mean, err, exact)


def test_mcmc_pallas_fermik_2d_statistical():
    """2-D FermiK (no polar angle): shell area element is 2 pi k dk."""
    from mcintegration_tpu.models.variable import FermiK

    kF, dk = 1.0, 0.3

    def f(i, x, c):
        K = x
        k2 = K[0][0] ** 2 + K[0][1] ** 2
        k = jnp.sqrt(k2)
        inside = (k > kF - dk) & (k < kF + dk)
        return jnp.where(inside, k2, 0.0)

    # int 2 pi k^3 dk over the shell
    exact = 2 * np.pi / 4 * ((kF + dk) ** 4 - (kF - dk) ** 4)
    spec, it = _mk_mcmc(f, dof=[[1]], seed=23, neval=800_000,
                        var=FermiK(2, kF, dk, 10.0))
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(8))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    assert abs(m.mean() - exact) < 10 * max(err, 5e-3), (m.mean(), err, exact)


def test_mcmc_pallas_measure_statistical():
    """Custom vector measure in-kernel: one-hot scatter by a Discrete
    external index (the bubble.jl observable shape), vs the XLA path."""
    from mcintegration_tpu.models.variable import Discrete as D

    def f(i, x, c):
        t, d = x
        return t[0] * d[0]

    from mcintegration_tpu import onehot

    def meas(i, x, w, c):
        t, d = x
        return [onehot(d[0], 1, 4, w.dtype) * w]

    res = {}
    for be in ("xla", "pallas"):
        spec, it = _mk_mcmc(f, dof=[[1, 1]], seed=31, neval=1_200_000,
                            backend=be, measure=meas,
                            obs_proto=[np.zeros(4)],
                            var=(Continuous(0.0, 1.0, ninc=128), D(1, 4)))
        assert it.backend == be
        st = it.run(spec.device_params(), jax.random.key(12))
        ob = np.asarray(st["obs_blocks"][0])    # [block, 4]
        nb = np.asarray(st["norm_blocks"])[:, None]
        m = ob / nb
        res[be] = (m.mean(axis=0), m.std(axis=0, ddof=1) / np.sqrt(len(m)))
    # integral of t*d per external bin d: d/2
    exact = np.arange(1, 5) / 2.0
    for be, (mean, err) in res.items():
        for k in range(4):
            assert abs(mean[k] - exact[k]) < 10 * max(err[k], 2e-2), (
                be, k, mean[k], err[k], exact[k])


def test_mcmc_pallas_complex_custom_measure():
    """Complex custom measures run inside the fused :mcmc kernel (round 5:
    the last complex-uniformity hole on any fast path): the measure is
    lifted through realify with an (re, im) pair relative weight, complex
    observable components accumulate as consecutive re/im channels, and
    the result matches both the exact value and the XLA path."""
    from mcintegration_tpu.models.variable import Discrete as D

    Q = 3

    def f(i, x, c):
        t, d = x
        return jnp.exp(1j * t[0])

    from mcintegration_tpu import onehot

    def meas(i, x, w, c):
        t, d = x
        return [onehot(d[0], 1, Q, w.dtype) * w]

    # per external index q: int_0^1 e^{it} dt = sin(1) + i(1 - cos(1))
    exact = np.sin(1.0) + 1j * (1.0 - np.cos(1.0))
    res = {}
    for be in ("xla", "pallas"):
        obs = [np.zeros(Q, np.complex64)]
        cfg = Configuration(var=(Continuous(0.0, 1.0), D(1, Q)),
                            dof=[[1, 1]], seed=31, obs=obs, type=complex)
        spec = Spec(cfg)
        from mcintegration_tpu.solvers.mcmc import MCMCIteration
        it = MCMCIteration(spec, f, measure=meas, obs_proto=obs,
                           block=4, nevalperblock=2 ** 15, backend=be,
                           nwalkers=8192, thermal_ratio=0.3,
                           weight_dtype=jnp.complex64)
        assert it.backend == be
        st = it.run(spec.device_params(), jax.random.key(12))
        ob = np.asarray(st["obs_blocks"][0])    # [block, Q] complex
        assert np.iscomplexobj(ob)
        nb = np.asarray(st["norm_blocks"])[:, None]
        m = ob / nb
        err = (m.real.std(axis=0, ddof=1)
               + 1j * m.imag.std(axis=0, ddof=1)) / np.sqrt(len(m))
        res[be] = (m.mean(axis=0), err)
        for q in range(Q):
            mu, er = m.mean(axis=0)[q], err[q]
            assert abs(mu.real - exact.real) < 10 * max(er.real, 2e-2), \
                (be, q, mu, er)
            assert abs(mu.imag - exact.imag) < 10 * max(er.imag, 2e-2), \
                (be, q, mu, er)
    for q in range(Q):
        d = res["xla"][0][q] - res["pallas"][0][q]
        s = np.hypot(abs(res["xla"][1][q]), abs(res["pallas"][1][q]))
        assert abs(d) < 7 * max(s, 2e-2), (q, d, s)


def test_mcmc_pallas_sharded_over_mesh():
    from mcintegration_tpu.parallel.mesh import make_mesh
    from mcintegration_tpu.solvers.mcmc import MCMCIteration

    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(ndev)
    cfg = Configuration(var=Continuous(0.0, 1.0, ninc=128), dof=[[2]], seed=3)
    spec = Spec(cfg)
    it = MCMCIteration(spec,
                       lambda i, x, c: jnp.where(
                           x[0] ** 2 + x[1] ** 2 < 1, 1.0, 0.0),
                       block=ndev, nevalperblock=400_000, mesh=mesh,
                       backend="pallas", nwalkers=ndev * 1024,
                       thermal_ratio=0.3)
    assert it.backend == "pallas"
    st = it.run(spec.device_params(), jax.random.key(4))
    m = st["obs_blocks"][:, 0] / st["norm_blocks"]
    err = m.std(ddof=1) / np.sqrt(len(m))
    assert abs(m.mean() - np.pi / 4) < 10 * max(err, 5e-3)


def test_pow2_shadow_serves_any_ninc():
    """Non-power-of-two (and >1024) Continuous grids run FUSED through an
    unbiased power-of-two resample of the live map (engine.pow2_shadow,
    round 5): the reference's default 999-increment grid no longer routes
    the whole problem to the XLA scan.  Checks chain-kernel engagement,
    statistical parity vs XLA, user-resolution histograms, and that
    adaptation still reshapes the user grid."""
    from mcintegration_tpu.solvers.engine import (Spec, _overlap_matrix,
                                                  _resample_grid)
    from mcintegration_tpu.solvers.vegasmc import VegasMCIteration

    # unit properties of the resample/remap machinery
    rng = np.random.default_rng(7)
    grid = np.cumsum(rng.uniform(0.5, 1.5, 999))
    grid = np.concatenate([[0.0], grid / grid[-1]])
    gk = _resample_grid(grid, 1024)
    assert len(gk) == 1025 and (np.diff(gk) > 0).all()
    assert gk[0] == grid[0] and gk[-1] == grid[-1]
    M = _overlap_matrix(gk, grid)
    assert M.shape == (999, 1024)
    np.testing.assert_allclose(M.sum(axis=0), 1.0, atol=1e-9)

    f = lambda x, c: -jnp.log(jnp.maximum(x[0], 1e-30)) \
        / jnp.sqrt(jnp.maximum(x[0], 1e-30)) / 4.0
    res = {}
    for ninc, be in ((1000, "pallas"), (2048, "pallas"), (1000, "xla")):
        cfg = Configuration(var=Continuous(0.0, 1.0, ninc=ninc),
                            dof=[[1]], seed=5)
        spec = Spec(cfg)
        it = VegasMCIteration(spec, f, block=4, nevalperblock=2 ** 15,
                              backend=be, nwalkers=8192)
        assert it.backend == be, it.backend_reason
        st = it.run(spec.device_params(), jax.random.key(3))
        # histograms come back at USER resolution
        assert st["hists"][0].shape == (ninc,)
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        res[(ninc, be)] = (m.mean(), m.std(ddof=1) / 2)
    d = abs(res[(1000, "pallas")][0] - res[(1000, "xla")][0])
    s = np.hypot(res[(1000, "pallas")][1], res[(1000, "xla")][1])
    assert d < 7 * max(s, 1e-3), (d, s, res)

    # end-to-end: the user's 1000-increment grid adapts through the remap
    from mcintegration_tpu import integrate

    r = integrate(f, var=Continuous(0.0, 1.0, ninc=1000), dof=[[1]],
                  neval=2 ** 17, niter=4, solver="vegasmc",
                  backend="pallas", nwalkers=8192, parallel="none",
                  block=4, verbose=-2, seed=11)
    assert r.backend == "pallas", r.backend_reason
    g = r.config.var[0].grid
    assert len(g) - 1 == 1000
    assert not np.allclose(g, np.linspace(0, 1, 1001))
    m = float(np.asarray(r.mean[0]))
    e = float(np.asarray(r.stdev[0]))
    assert abs(m - 1.0) < 12 * max(e, 2e-3), (m, e)


def test_pow2_shadow_mcmc():
    """The :mcmc scheduled kernel serves non-pow2 ninc through the same
    shadow machinery, with XLA statistical parity."""
    from mcintegration_tpu.solvers.mcmc import MCMCIteration

    def fi(i, x, c):
        return jnp.where(x[0] ** 2 + x[1] ** 2 < 1.0, 1.0, 0.0)

    res = {}
    for be in ("xla", "pallas"):
        cfg = Configuration(var=Continuous(0.0, 1.0, ninc=1000),
                            dof=[[2]], seed=5)
        spec = Spec(cfg)
        it = MCMCIteration(spec, fi, block=4, nevalperblock=2 ** 16,
                           backend=be, nwalkers=4096, thermal_ratio=0.3)
        assert it.backend == be, it.backend_reason
        st = it.run(spec.device_params(), jax.random.key(3))
        assert st["hists"][0].shape == (1000,)
        m = st["obs_blocks"][:, 0] / st["norm_blocks"]
        res[be] = (m.mean(), m.std(ddof=1) / 2)
        assert abs(m.mean() - np.pi / 4) < 10 * max(m.std(ddof=1) / 2, 5e-3)
    d = abs(res["xla"][0] - res["pallas"][0])
    s = np.hypot(res["xla"][1], res["pallas"][1])
    assert d < 7 * max(s, 5e-3), (d, s)


def test_vegas_pallas_custom_measure():
    """Real custom measures run inside the fused :vegas kernel (round 5):
    one batched measure call per chunk on the relative weights
    w_i*pad_i*jac, padded strata rows masked out of every component;
    vector observable binned by a quartile index vs exact + XLA parity."""
    from mcintegration_tpu import onehot

    def f(x, c):
        return x[0] * x[1]

    def meas(v, relw, c):
        q = jnp.clip((v[0] * 4).astype(jnp.int32), 0, 3)
        return [onehot(q, 0, 3, relw[0].dtype) * relw[0]]

    exact = np.array([(2 * k + 1) / 64.0 for k in range(4)])
    res = {}
    for be in ("xla", "pallas"):
        cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=5,
                            obs=[np.zeros(4)])
        spec = Spec(cfg)
        it = VegasIteration(spec, f, block=8, nevalperblock=2 ** 15,
                            backend=be, measure=meas,
                            obs_proto=[np.zeros(4)])
        assert it.backend == be, it.backend_reason
        st = it.run(spec.device_params(), jax.random.key(3))
        ob = np.asarray(st["obs_blocks"][0])
        nb = np.asarray(st["norm_blocks"])[:, None]
        m = ob / nb
        mean, err = m.mean(axis=0), m.std(axis=0, ddof=1) / np.sqrt(len(m))
        res[be] = (mean, err)
        for k in range(4):
            assert abs(mean[k] - exact[k]) < 10 * max(err[k], 1e-4), \
                (be, k, mean[k], exact[k], err[k])
    d = np.abs(res["xla"][0] - res["pallas"][0])
    s = np.hypot(res["xla"][1], res["pallas"][1])
    assert (d < 7 * np.maximum(s, 1e-4)).all(), (d, s)

    # a measure that fails the equivalence probe still routes to XLA
    def bad(v, relw, c):
        return [jnp.full((4,), jnp.sum(relw[0]))]

    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=5,
                        obs=[np.zeros(4)])
    spec = Spec(cfg)
    it = VegasIteration(spec, f, block=8, nevalperblock=2 ** 15,
                        backend="pallas", measure=bad,
                        obs_proto=[np.zeros(4)])
    assert it.backend == "xla"
    assert "measure" in it.backend_reason
