"""Oracle tests for FIF / FIF_Improve full-image filtering.

Direct NumPy transcriptions of FIF (cpp:4541-4705: linear forward/backward
recursions, fwd+bwd-C, horizontal then vertical) and FIF_Improve
(cpp:4707-4890: min-plus with +-1 disparity transitions penalized by Pn
before the edge-weight multiply).
"""
import numpy as np


def _weights(img, eps=0.08):
    I = img.astype(np.float64) / 255.0
    wh = np.exp(-np.sum((I[:, 1:] - I[:, :-1]) ** 2, -1) / (eps * eps))
    wv = np.exp(-np.sum((I[1:, :] - I[:-1, :]) ** 2, -1) / (eps * eps))
    return wh, wv  # wh: [H, W-1], wv: [H-1, W]


def oracle_fif(vol, img, eps=0.08):
    d_, h, w = vol.shape
    wh, wv = _weights(img, eps)
    x = vol.astype(np.float64)

    c1 = x.copy()
    for u in range(1, w):
        c1[:, :, u] = x[:, :, u] + c1[:, :, u - 1] * wh[None, :, u - 1]
    c2 = x.copy()
    for u in range(w - 2, -1, -1):
        c2[:, :, u] = x[:, :, u] + c2[:, :, u + 1] * wh[None, :, u]
    hres = c1 + c2 - x

    c1 = hres.copy()
    for v in range(1, h):
        c1[:, v] = hres[:, v] + c1[:, v - 1] * wv[None, v - 1]
    c2 = hres.copy()
    for v in range(h - 2, -1, -1):
        c2[:, v] = hres[:, v] + c2[:, v + 1] * wv[None, v]
    return c1 + c2 - hres


def _mp_step(prev, c, w, pn):
    """min-plus: out[d] = c[d] + min(prev[d], prev[d-1]+pn, prev[d+1]+pn)*w."""
    big = np.inf
    up = np.concatenate([np.full_like(prev[:1], big), prev[:-1]]) + pn
    dn = np.concatenate([prev[1:], np.full_like(prev[:1], big)]) + pn
    return c + np.minimum(prev, np.minimum(up, dn)) * w


def oracle_fif_improve(vol, img, eps=0.08, pn=2.0):
    d_, h, w = vol.shape
    wh, wv = _weights(img, eps)
    x = vol.astype(np.float64)

    c1 = x.copy()
    for u in range(1, w):
        c1[:, :, u] = _mp_step(c1[:, :, u - 1], x[:, :, u],
                               wh[None, :, u - 1], pn)
    c2 = x.copy()
    for u in range(w - 2, -1, -1):
        c2[:, :, u] = _mp_step(c2[:, :, u + 1], x[:, :, u],
                               wh[None, :, u], pn)
    hres = c1 + c2 - x

    c1 = hres.copy()
    for v in range(1, h):
        c1[:, v] = _mp_step(c1[:, v - 1], hres[:, v], wv[None, v - 1], pn)
    c2 = hres.copy()
    for v in range(h - 2, -1, -1):
        c2[:, v] = _mp_step(c2[:, v + 1], hres[:, v], wv[None, v], pn)
    return c1 + c2 - hres


def _case(seed=0, d=6, h=14, w=18):
    rng = np.random.default_rng(seed)
    vol = rng.random((d, h, w)).astype(np.float32)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    return vol, img


def test_fif_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.fif import fif

    vol, img = _case(0)
    ours = np.asarray(fif(jnp.asarray(vol), jnp.asarray(img)))
    exp = oracle_fif(vol, img)
    np.testing.assert_allclose(ours, exp, rtol=2e-4, atol=2e-4 * exp.max())


def test_fif_improve_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.fif import fif_improve

    vol, img = _case(1)
    ours = np.asarray(fif_improve(jnp.asarray(vol), jnp.asarray(img)))
    exp = oracle_fif_improve(vol, img)
    np.testing.assert_allclose(ours, exp, rtol=2e-4, atol=2e-4 * exp.max())
