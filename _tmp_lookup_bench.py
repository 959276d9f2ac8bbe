import time
import numpy as np, jax, jax.numpy as jnp
from mcintegration_tpu.ops.lookup import two_level_take, onehot_accumulate, padded_hist_size

c = 131072
R = 200
tab = jnp.asarray(np.random.rand(32, 64), jnp.float32)
idx0 = jnp.asarray(np.random.randint(0, 1024, c), jnp.int32)
w = jnp.asarray(np.random.rand(c), jnp.float32)
flat = jnp.asarray(np.random.rand(1024, 2), jnp.float32)

def loop(f, init):
    def body(i, acc):
        return f(i, acc)
    return jax.jit(lambda x: jax.lax.fori_loop(0, R, body, x))

f1 = loop(lambda i, acc: acc + two_level_take(tab, (idx0 + i) % 1024, 2).sum(), jnp.zeros(()))
f2 = loop(lambda i, acc: acc + jnp.take(flat, (idx0 + i) % 1024, axis=0).sum(), jnp.zeros(()))
f4 = loop(lambda i, acc: onehot_accumulate(acc, (idx0 + i) % 1024, w), jnp.zeros(padded_hist_size(1024), jnp.float32))
f5 = loop(lambda i, acc: acc.at[(idx0 + i) % 1024].add(w), jnp.zeros(1024, jnp.float32))

for name, f, init in (("two_level_take", f1, None), ("jnp.take", f2, None),
                      ("onehot_accum", f4, None), ("at[].add", f5, None)):
    r = jax.block_until_ready(f.__wrapped__(jnp.zeros(())) if False else None) if False else None
    # compile + run
    try:
        if name in ("onehot_accum",):
            x0 = jnp.zeros(padded_hist_size(1024), jnp.float32)
        elif name == "at[].add":
            x0 = jnp.zeros(1024, jnp.float32)
        else:
            x0 = jnp.zeros(())
        jax.block_until_ready(f(x0))
        t0 = time.time(); jax.block_until_ready(f(x0)); dt = time.time() - t0
        print(f"{name:15s}: {dt/R*1e6:8.1f} us/op  ({c/(dt/R)/1e9:.2f} G elts/s)")
    except Exception as e:
        print(name, "failed:", str(e)[:80])
