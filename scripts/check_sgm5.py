"""Isolate SGM kernel cost: trivial row loop vs full recurrence."""
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

def make(body_kind):
    def kern(vol_ref, ps_ref, out_ref, carry):
        g, hc, d_, wt = vol_ref.shape
        big = jnp.asarray(3.4e38, vol_ref.dtype)
        big_row = jnp.full((g, 1, wt), big, vol_ref.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _(): carry[:] = jnp.zeros_like(carry)

        def row(r, prev):
            c = vol_ref[:, r]
            if body_kind == "copy":
                l = c * 1.01
            elif body_kind == "prev":
                l = c + prev * 0.5
            else:
                ps = ps_ref[:, pl.ds(r, 1), :]
                min_l = jnp.min(prev, axis=1, keepdims=True)
                up = jnp.concatenate([big_row, prev[:, :-1]], 1)
                dn = jnp.concatenate([prev[:, 1:], big_row], 1)
                best = jnp.minimum(jnp.minimum(prev, min_l + 3.0 * ps),
                                   jnp.minimum(up, dn) + 1.0 * ps)
                l = c + best - min_l
            out_ref[:, r] = l
            return l

        carry[:] = jax.lax.fori_loop(0, hc, row, carry[:])
    return kern

def scan(vol, ps, kind):
    g, h, d_, w = vol.shape[0], vol.shape[1], vol.shape[2], vol.shape[3]
    wt = 256
    hc = max(8, min(h, (9 * 1024 * 1024) // (16 * g * d_ * wt) // 8 * 8))
    grid = (_cdiv(w, wt), _cdiv(h, hc))
    vs = pl.BlockSpec((g, hc, d_, wt), lambda wi, hi: (0, hi, 0, wi), memory_space=pltpu.VMEM)
    is_ = pl.BlockSpec((g, hc, wt), lambda wi, hi: (0, hi, wi), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make(kind), grid=grid, in_specs=[vs, is_], out_specs=vs,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((g, d_, wt), vol.dtype)],
    )(vol, ps)

rng = np.random.default_rng(0)
volT = jnp.asarray(rng.random((G, H, D, W), np.float32))
ps4 = jnp.asarray(rng.random((G, H, W), np.float32))

def chain(fn):
    def f(x, *a):
        for _ in range(REPS): x = fn(x, *a) * 1e-2
        return x
    return jax.jit(f)

for kind in ("copy", "prev", "full"):
    t = bench(chain(lambda v, p, k=kind: scan(v, p, k)), volT, ps4)
    print(f"{kind:5s}: {t*1e3:7.2f} ms")

# --- unrolled static-row variant ---
def make_unrolled(body_kind):
    def kern(vol_ref, ps_ref, out_ref, carry):
        g, hc, d_, wt = vol_ref.shape
        big = jnp.asarray(3.4e38, vol_ref.dtype)
        big_row = jnp.full((g, 1, wt), big, vol_ref.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _(): carry[:] = jnp.zeros_like(carry)

        prev = carry[:]
        for r in range(hc):                 # STATIC row index
            c = vol_ref[:, r]
            if body_kind == "copy":
                l = c * 1.01
            else:
                ps = ps_ref[:, r:r+1, :]
                min_l = jnp.min(prev, axis=1, keepdims=True)
                up = jnp.concatenate([big_row, prev[:, :-1]], 1)
                dn = jnp.concatenate([prev[:, 1:], big_row], 1)
                best = jnp.minimum(jnp.minimum(prev, min_l + 3.0 * ps),
                                   jnp.minimum(up, dn) + 1.0 * ps)
                l = c + best - min_l
            out_ref[:, r] = l
            prev = l
        carry[:] = prev
    return kern

def scan_u(vol, ps, kind):
    g, h, d_, w = vol.shape
    wt = 256
    hc = max(8, min(h, (9 * 1024 * 1024) // (16 * g * d_ * wt) // 8 * 8))
    grid = (_cdiv(w, wt), _cdiv(h, hc))
    vs = pl.BlockSpec((g, hc, d_, wt), lambda wi, hi: (0, hi, 0, wi), memory_space=pltpu.VMEM)
    is_ = pl.BlockSpec((g, hc, wt), lambda wi, hi: (0, hi, wi), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_unrolled(kind), grid=grid, in_specs=[vs, is_], out_specs=vs,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((g, d_, wt), vol.dtype)],
    )(vol, ps)

for kind in ("copy", "full"):
    t = bench(chain(lambda v, p, k=kind: scan_u(v, p, k)), volT, ps4)
    print(f"unrolled {kind:5s}: {t*1e3:7.2f} ms")

# correctness vs current
from mystereomatching_tpu.ops import pallas_kernels as pk
vol4 = jnp.swapaxes(volT, 1, 2)
a = pk.sgm_scan_pallas(vol4, ps4)
b = jnp.swapaxes(scan_u(volT, ps4, "full"), 1, 2)
print("unrolled diff:", float(jnp.max(jnp.abs(a - b))))
