"""Raw bandwidth probes: XLA copy, pallas copy, various block shapes."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 8
def sync(x): return float(jnp.sum(x[..., ::64, ::64] if x.ndim else x))
def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters / REPS

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((4, 375, 60, 450), np.float32))   # 161MB
nbytes = x.size * 4

def chain(fn):
    def f(v):
        for _ in range(REPS): v = fn(v)
        return v
    return jax.jit(f)

t = bench(chain(lambda v: v * 1.0001), x)
print(f"XLA elementwise mul : {t*1e3:7.2f} ms  -> {2*nbytes/t/1e9:6.0f} GB/s")

def copy_kern(i_ref, o_ref):
    o_ref[:] = i_ref[:] * 1.0001

def pallas_copy(v, block):
    g, h, d_, w = v.shape
    def cdiv(a,b): return -(-a//b)
    bs = block
    grid = tuple(cdiv(s, b) for s, b in zip(v.shape, bs))
    spec = pl.BlockSpec(bs, lambda *i: i, memory_space=pltpu.VMEM)
    return pl.pallas_call(copy_kern, grid=grid, in_specs=[spec], out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype))(v)

for block in [(4, 8, 60, 256), (1, 8, 64, 512), (4, 24, 64, 128), (1, 375, 60, 450)]:
    try:
        t = bench(chain(lambda v, b=block: pallas_copy(v, b)), x)
        print(f"pallas copy {str(block):20s}: {t*1e3:7.2f} ms -> {2*nbytes/t/1e9:6.0f} GB/s")
    except Exception as e:
        print(f"pallas copy {block}: FAIL {str(e)[:80]}")
