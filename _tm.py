import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rows, W = 80, 768
PLANES = 64

def mk(which):
    def _box5_y_roll(x):
        h = x.shape[0]
        return (x + pltpu.roll(x, 1, axis=0) + pltpu.roll(x, h-1, axis=0)
                + pltpu.roll(x, 2, axis=0) + pltpu.roll(x, h-2, axis=0))
    def kernel(a_ref, b_ref, o_ref):
        ii = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        Bm = (jnp.abs(ii - jj) <= 2).astype(jnp.float32)
        acc = jnp.zeros((rows, W), jnp.float32)
        a = a_ref[:]
        b = b_ref[:]
        for k in range(PLANES):
            x = a * (0.99 + 0.001 * k) + b
            if which == "roll":
                s = _box5_y_roll(x)
                s2 = _box5_y_roll(x * x)
                s3 = _box5_y_roll(x * b)
            else:
                s = jnp.dot(Bm, x, preferred_element_type=jnp.float32)
                s2 = jnp.dot(Bm, x * x, preferred_element_type=jnp.float32)
                s3 = jnp.dot(Bm, x * b, preferred_element_type=jnp.float32)
            acc = acc + s * 0.1 + s2 * 0.01 + s3 * 0.05
        o_ref[:] = acc
    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(8,),
            out_shape=jax.ShapeDtypeStruct((8 * rows, W), jnp.float32),
            in_specs=[pl.BlockSpec((rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(a, b)
    return run

key = jax.random.PRNGKey(0)
a = jax.random.uniform(key, (8 * rows, W), jnp.float32)
b = jax.random.uniform(key, (8 * rows, W), jnp.float32)

for which in ("roll", "mxu"):
    f = mk(which)
    r = f(a, b); ok = float(jnp.sum(r))
    def run(k):
        t0 = time.perf_counter()
        acc = None
        for i in range(k):
            r = f(a + i * 1e-6, b)
            acc = r if acc is None else acc + r
        float(jnp.sum(acc)); return time.perf_counter() - t0
    t1 = min(run(1) for _ in range(3)); tn = min(run(12) for _ in range(2))
    print(f"{which}: {(tn-t1)/11*1e3:.2f} ms/call")
# numeric agreement
r1 = mk("roll")(a, b); r2 = mk("mxu")(a, b)
# note: roll version wraps at band edges, mxu version zero-pads — interior only
d = np.abs(np.asarray(r1) - np.asarray(r2)).reshape(8, rows, W)[:, 3:-3, :]
print("interior max diff:", d.max())
