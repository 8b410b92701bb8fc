"""Row-halo exchange over the 'row' mesh axis (inside shard_map).

Windowed kernels (census, arms, CBCA, region vote, medians) need up to
``halo`` rows from the neighboring bands. Each exchange is two ``ppermute``
shifts over ICI; the sharded kernels compute on the halo-extended band and
crop back. At the physical image borders the halo is filled with the same
border handling the dense kernels use (the caller's pad mode), implemented
by edge-padding the outermost bands.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _shift_from(x: jnp.ndarray, axis_name: str, direction: int) -> jnp.ndarray:
    """Receive x from the neighbor at index (i - direction) (i.e. shift
    values toward +direction along the axis). Non-periodic: the first
    receiver gets its own x back (callers overwrite border bands anyway)."""
    n = lax.axis_size(axis_name)
    perm = [(i, i + direction) for i in range(n) if 0 <= i + direction < n]
    return lax.ppermute(x, axis_name, perm)


def exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = "row",
                  row_axis: int = 0, pad_mode: str = "edge") -> jnp.ndarray:
    """Return x extended with ``halo`` rows from each neighbor band.

    x: local band [..., H_local, ...] with rows on ``row_axis``. Border
    bands pad with ``pad_mode`` ('edge' or 'zero') so downstream window
    kernels see the same values the dense path's jnp.pad would produce.
    """
    if halo == 0:
        return x
    from mystereomatching_tpu.parallel.counters import note_halo

    note_halo(x, halo, row_axis)
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    def take(a, sl):
        ix = [slice(None)] * a.ndim
        ix[row_axis] = sl
        return a[tuple(ix)]

    top_send = take(x, slice(0, halo))            # my top rows -> neighbor above
    bot_send = take(x, slice(-halo, None))        # my bottom rows -> below

    from_above = _shift_from(bot_send, axis_name, +1)   # neighbor above's bottom
    from_below = _shift_from(top_send, axis_name, -1)   # neighbor below's top

    # physical-border fill, matching the dense kernel's own padding mode
    if pad_mode == "edge":
        top_fill = jnp.repeat(take(x, slice(0, 1)), halo, axis=row_axis)
        bot_fill = jnp.repeat(take(x, slice(-1, None)), halo, axis=row_axis)
    elif pad_mode == "reflect101":
        # virtual row -k = row k; virtual row H-1+k = row H-1-k
        top_fill = jnp.flip(take(x, slice(1, halo + 1)), axis=row_axis)
        bot_fill = jnp.flip(take(x, slice(-halo - 1, -1)), axis=row_axis)
    elif pad_mode == "zero":
        top_fill = jnp.zeros_like(from_above)
        bot_fill = jnp.zeros_like(from_below)
    elif isinstance(pad_mode, (int, float)):
        top_fill = jnp.full_like(from_above, pad_mode)
        bot_fill = jnp.full_like(from_below, pad_mode)
    else:
        raise ValueError(f"unknown pad_mode {pad_mode!r}")

    from_above = jnp.where(_expand(idx == 0, x.ndim), top_fill, from_above)
    from_below = jnp.where(_expand(idx == n - 1, x.ndim), bot_fill, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=row_axis)


def crop_rows(x: jnp.ndarray, halo: int, row_axis: int = 0) -> jnp.ndarray:
    if halo == 0:
        return x
    ix = [slice(None)] * x.ndim
    ix[row_axis] = slice(halo, x.shape[row_axis] - halo)
    return x[tuple(ix)]


def _expand(pred, ndim):
    return jnp.reshape(pred, (1,) * ndim)
