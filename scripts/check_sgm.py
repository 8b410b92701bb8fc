"""Verify + time the Pallas SGM scan vs the lax.scan formulation on TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
from mystereomatching_tpu.ops import sgm as S
from mystereomatching_tpu.ops import pallas_kernels as pk

D, H, W, REPS = 60, 375, 450, 6

def sync(x): return float(jnp.sum(x))

def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
imgL = jnp.asarray(rng.integers(0, 255, (H, W, 3)), jnp.float32)
imgR = jnp.roll(imgL, 3, axis=1)
volL = jnp.asarray(rng.random((D, H, W), np.float32))
volR = jnp.roll(volL, 1, axis=2)

# correctness vs per-direction scan_direction (the oracle-tested path), 8 dirs
for ndir in (4, 8):
    ref = jax.jit(lambda v, im: sum(
        S.scan_direction(v, im, rv, ru, 1.0, 3.0, 15, 4.0)
        for rv, ru in S.DIRECTIONS_8[:ndir]))(volL, imgL)
    got = jax.jit(lambda v, im: S.sgm(v, im, ndir))(volL, imgL)
    err = float(jnp.max(jnp.abs(ref - got)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"ndir={ndir}: max|diff|={err:.3e} (rel {rel:.1e})")
    assert rel < 1e-5, rel

def multi(vl, vr, il, ir, ndir):
    r = S.sgm_multi([vl, vr], [il, ir], ndir)
    return r[0] + r[1] * 0.5

# chained timing
def chain(fn):
    def f(vl, vr):
        x, y = vl, vr
        for _ in range(REPS):
            x = fn(x, y) * 1e-2
        return x
    return jax.jit(f)

for ndir in (4, 8):
    t_new = bench(chain(lambda x, y: multi(x, y, imgL, imgR, ndir)), volL, volR)
    print(f"sgm_multi x2vol ndir={ndir}: {t_new/REPS*1e3:7.2f} ms")
