"""A/B: SGM row loop with [D,Hc,Wt] blocks (sublane-row writes) vs
[Hc,D,Wt] blocks (aligned full-slab row writes)."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, D, H, W, REPS = 4, 60, 375, 450, 6

def _cdiv(a, b): return -(-a // b)
def sync(x): return float(jnp.sum(x))
def bench(fn, *args, iters=3):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn(*args))
    return (time.perf_counter() - t0) / iters / REPS

def kern_hdw(vol_ref, ps_ref, out_ref, carry, *, p1, p2):
    # blocks: vol/out [1, hc, D, wt]; ps [1, hc, wt]; carry [D, wt]
    hc, d_, wt = vol_ref.shape[1:]
    big = jnp.asarray(jnp.finfo(vol_ref.dtype).max, vol_ref.dtype)
    big_row = jnp.full((1, wt), big, vol_ref.dtype)

    @pl.when(pl.program_id(2) == 0)
    def _(): carry[:] = jnp.zeros_like(carry)

    def row(r, prev):
        c = vol_ref[0, r]                                  # [D, wt]
        ps = ps_ref[0, pl.ds(r, 1), :]
        min_l = jnp.min(prev, axis=0, keepdims=True)
        up = jnp.concatenate([big_row, prev[:-1]], 0)
        dn = jnp.concatenate([prev[1:], big_row], 0)
        best = jnp.minimum(jnp.minimum(prev, min_l + p2 * ps),
                           jnp.minimum(up, dn) + p1 * ps)
        l = c + best - min_l
        out_ref[0, r] = l
        return l

    carry[:] = jax.lax.fori_loop(0, hc, row, carry[:])

def scan_hdw(vol, ps, p1=1.0, p2=3.0):
    # vol [G, H, D, W]
    g, h, d_, w = vol.shape
    wt = min(_cdiv(w, 128) * 128, 1280)
    hc = max(8, min(h, (10 * 1024 * 1024) // (16 * d_ * wt) // 8 * 8))
    grid = (g, _cdiv(w, wt), _cdiv(h, hc))
    vs = pl.BlockSpec((1, hc, d_, wt), lambda gi, wi, hi: (gi, hi, 0, wi), memory_space=pltpu.VMEM)
    is_ = pl.BlockSpec((1, hc, wt), lambda gi, wi, hi: (gi, hi, wi), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kern_hdw, p1=p1, p2=p2),
        grid=grid, in_specs=[vs, is_], out_specs=vs,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((d_, wt), vol.dtype)],
    )(vol, ps)

rng = np.random.default_rng(0)
vol4 = jnp.asarray(rng.random((G, D, H, W), np.float32))
ps4 = jnp.asarray(rng.random((G, H, W), np.float32))
volT = jnp.swapaxes(vol4, 1, 2)  # [G, H, D, W]

def chain(fn):
    def f(x, *a):
        for _ in range(REPS): x = fn(x, *a) * 1e-2
        return x
    return jax.jit(f)

from mystereomatching_tpu.ops import pallas_kernels as pk
t0 = bench(chain(lambda v, p: pk.sgm_scan_pallas(v, p)), vol4, ps4)
print(f"current [D,H,W] blocks: {t0*1e3:7.2f} ms")

# correctness
a = pk.sgm_scan_pallas(vol4, ps4)
b = jnp.swapaxes(scan_hdw(volT, ps4), 1, 2)
print("diff:", float(jnp.max(jnp.abs(a - b))))

t1 = bench(chain(lambda v, p: scan_hdw(v, p)), volT, ps4)
print(f"HDW layout kernel:      {t1*1e3:7.2f} ms")
t2 = bench(chain(lambda v, p: jnp.swapaxes(scan_hdw(jnp.swapaxes(v, 1, 2), p), 1, 2)), vol4, ps4)
print(f"HDW + transposes:       {t2*1e3:7.2f} ms")
