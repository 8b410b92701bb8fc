import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 375, 450

def k_gather_sub(x_ref, idx_ref, o_ref):
    # gather along sublanes: o[a,b] = x[idx[a,b], b]
    x = x_ref[:]
    idx = idx_ref[:]
    o_ref[:] = jnp.take_along_axis(x, idx, axis=0)

def k_gather_lane(x_ref, idx_ref, o_ref):
    x = x_ref[:]
    idx = idx_ref[:]
    o_ref[:] = jnp.take_along_axis(x, idx, axis=1)

def k_cumsum_sub(x_ref, o_ref):
    o_ref[:] = jnp.cumsum(x_ref[:], axis=0)

def k_cumsum_lane(x_ref, o_ref):
    o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((H, W), np.float32))
idx_s = jnp.asarray(rng.integers(0, H, (H, W)), jnp.int32)
idx_l = jnp.asarray(rng.integers(0, W, (H, W)), jnp.int32)

for name, kern, args in (
    ("gather_sublane", k_gather_sub, (x, idx_s)),
    ("gather_lane", k_gather_lane, (x, idx_l)),
    ("cumsum_sublane", k_cumsum_sub, (x,)),
    ("cumsum_lane", k_cumsum_lane, (x,)),
):
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        if name.startswith("gather"):
            ax = 0 if name.endswith("sublane") else 1
            ref = jnp.take_along_axis(x, args[1], axis=ax)
        else:
            ax = 0 if name.endswith("sublane") else 1
            ref = jnp.cumsum(x, axis=ax)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{name}: OK diff {err:.1e}")
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:150]}")
