"""Backend selection helper.

Some TPU runtime plugins force themselves as the jax platform at import
time, overriding the ``JAX_PLATFORMS`` environment variable.  The reliable
switch is ``jax.config.update`` before backends initialize; this helper
honors two env vars for scripts/benchmarks:

- ``MCI_PLATFORM=cpu|tpu|axon`` — force a backend;
- ``MCI_CPU_DEVICES=N`` — virtual CPU device count (sharding tests).
"""

import os


def apply_env_platform():
    plat = os.environ.get("MCI_PLATFORM")
    ndev = os.environ.get("MCI_CPU_DEVICES")
    if not plat and not ndev:
        return
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    if ndev:
        jax.config.update("jax_num_cpu_devices", int(ndev))
