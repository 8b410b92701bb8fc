"""FIF: full-image recursive cost-volume filtering.

Re-design of the reference FIF (stereoMatching.cpp:4541-4705) and
FIF_Improve (cpp:4707-4890, the live variant at cpp:1012):

  * edge weights w = exp(-||dI||^2 / 0.08^2) on the [0,1]-scaled color
    image, between horizontal / vertical neighbor pixels,
  * forward + backward first-order recursions along W, combined as
    fwd + bwd - C, then the same along H on the combined result,
  * FIF plain: y[u] = C[u] + w[u-1]*y[u-1] — a LINEAR recurrence, computed
    with ``lax.associative_scan`` (log-depth, fully parallel over D x H),
  * FIF_Improve: y[u][d] = C[u][d] + w[u-1]*min(y[u-1][d], y[u-1][d+-1]+Pn)
    — min-plus with SGM-like transitions, computed with a ``lax.scan``
    carrying the [D, H] plane (like the SGM core).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _edge_weights(image: jnp.ndarray, sigma: float = 0.08):
    """w_h[v,u] between (v,u)-(v,u+1); w_v[v,u] between (v,u)-(v+1,u)
    (cpp:4556-4580). Last column/row entries are unused by the scans."""
    img = image.astype(jnp.float32) / 255.0
    dh = jnp.sum((jnp.roll(img, -1, 1) - img) ** 2, axis=-1)
    dv = jnp.sum((jnp.roll(img, -1, 0) - img) ** 2, axis=-1)
    wh = jnp.exp(-dh / (sigma * sigma))
    wv = jnp.exp(-dv / (sigma * sigma))
    return wh, wv


def _linear_recur(c: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """y[..., k] = c[..., k] + w[..., k-1] * y[..., k-1] via associative scan
    over the last axis. w[..., k] couples k -> k+1."""
    a = jnp.concatenate([jnp.zeros_like(w[..., :1]), w[..., :-1]], axis=-1)

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 * a1, a2 * b1 + b2

    _, out = lax.associative_scan(combine, (a, c), axis=-1)
    return out


def fif(vol: jnp.ndarray, image: jnp.ndarray, sigma: float = 0.08,
        pn: float = 2.0) -> jnp.ndarray:
    """Plain FIF (cpp:4541-4705). vol: [D,H,W]; image: [H,W,3]."""
    wh, wv = _edge_weights(image, sigma)

    def axis_pass(x, w_edge):
        # fwd uses w[u-1], bwd uses w[u] (cpp:4603, 4618)
        fwd = _linear_recur(x, w_edge[None])
        bwd = _linear_recur(x[..., ::-1], _rev_w(w_edge)[None])[..., ::-1]
        return fwd + bwd - x

    hres = axis_pass(vol, wh)
    hres_t = jnp.swapaxes(hres, 1, 2)            # [D, W, H]
    out_t = axis_pass(hres_t, jnp.swapaxes(wv, 0, 1))
    return jnp.swapaxes(out_t, 1, 2)


def _rev_w(w: jnp.ndarray) -> jnp.ndarray:
    """Edge weights for the reversed axis: reversing x[k] makes the edge
    coupling k<->k+1 appear at reversed index (n-2-k), i.e. the reversed
    weight sequence shifted by one: w_rev[k] = w[n-2-k]."""
    n = w.shape[-1]
    idx = jnp.clip(n - 2 - jnp.arange(n), 0, n - 1)
    return jnp.take(w, idx, axis=-1)


def fif_improve(vol: jnp.ndarray, image: jnp.ndarray, sigma: float = 0.08,
                pn: float = 2.0) -> jnp.ndarray:
    """FIF_Improve (cpp:4707-4890): SGM-like +-1 disparity transitions with
    penalty pn inside the recursion; same fwd+bwd-C / H-then-V structure."""
    wh, wv = _edge_weights(image, sigma)

    def axis_pass(x, w_edge):
        fwd = _mp(x, w_edge, pn)
        bwd = _mp(x[..., ::-1], _rev_w(w_edge), pn)[..., ::-1]
        return fwd + bwd - x

    hres = axis_pass(vol, wh)
    hres_t = jnp.swapaxes(hres, 1, 2)
    out_t = axis_pass(hres_t, jnp.swapaxes(wv, 0, 1))
    return jnp.swapaxes(out_t, 1, 2)


def _mp(vol: jnp.ndarray, w_edge: jnp.ndarray, pn: float) -> jnp.ndarray:
    """Min-plus forward recursion along the last axis of [D, H, W]."""
    d_, h, w = vol.shape
    vol_t = jnp.moveaxis(vol, 2, 0)              # [W, D, H]
    a = jnp.concatenate([jnp.zeros((h, 1), vol.dtype), w_edge[:, :-1]], axis=1)
    a_t = a.T[:, None, :]                        # [W, 1, H]
    big = jnp.asarray(3.4e38, vol.dtype)

    def step(y_prev, inp):
        c, aw = inp
        up = jnp.concatenate([jnp.full((1, h), big, vol.dtype), y_prev[:-1]], 0)
        dn = jnp.concatenate([y_prev[1:], jnp.full((1, h), big, vol.dtype)], 0)
        m = jnp.minimum(y_prev, jnp.minimum(up, dn) + pn)
        y = c + aw * m
        return y, y

    # init derived from the input (not a fresh constant) so the carry is
    # "varying" over any enclosing shard_map axes like the body output
    _, out = lax.scan(step, vol_t[0] * 0, (vol_t, a_t))
    return jnp.moveaxis(out, 0, 2)
