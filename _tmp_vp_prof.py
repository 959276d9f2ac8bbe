import time
import numpy as np
import jax, jax.numpy as jnp
from mcintegration_tpu.configuration import Configuration
from mcintegration_tpu.models.variable import Continuous
from mcintegration_tpu.solvers.engine import Spec
from mcintegration_tpu.solvers.vegasplus import VegasPlusIteration

def f(x, c):
    return jnp.exp(-50 * ((x[0] - 0.3) ** 2 + (x[1] - 0.7) ** 2))

for max_cubes, max_chunk in ((16384, 131072), (16384, 524288), (4096, 524288), (1024, 524288), (16384, 2097152)):
    cfg = Configuration(var=Continuous(0.0, 1.0), dof=[[2]], seed=2)
    spec = Spec(cfg)
    it = VegasPlusIteration(spec, f, block=16, nevalperblock=2**21,
                            max_cubes=max_cubes, max_chunk=max_chunk)
    p = spec.device_params()
    it.run(p, jax.random.key(0))
    t0 = time.time(); it.run(p, jax.random.key(1)); dt = time.time() - t0
    ne = it.block * it.nevalperblock if hasattr(it, 'block') else 16 * it.nevalperblock
    print(f"cubes={it.ncubes:6d} chunk={it.chunk:8d} nchunks={it.nchunks}: "
          f"{ne/dt/1e9:.2f} G evals/s [{dt:.2f}s]")
