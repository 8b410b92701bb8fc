"""Oracle test for cross-scale fusion (SolveAll, cpp:2142-2208):
per-pixel transcription of the regularization-inverse weighting and the
curY/=2, curX/=2, curD=(curD+1)/2 coarse index chain."""
import numpy as np


def oracle_solve_all(volumes, reg_lambda):
    n = len(volumes)
    m = np.zeros((n, n))
    for s in range(n):
        if s == 0:
            m[s, s] = 1 + reg_lambda
            if n > 1:
                m[s, s + 1] = -reg_lambda
        elif s == n - 1:
            m[s, s] = 1 + reg_lambda
            m[s, s - 1] = -reg_lambda
        else:
            m[s, s] = 1 + 2 * reg_lambda
            m[s, s - 1] = -reg_lambda
            m[s, s + 1] = -reg_lambda
    inv_wgt = np.linalg.inv(m)[0].astype(np.float32)

    d0, h0, w0 = volumes[0].shape
    out = np.zeros((d0, h0, w0), np.float32)
    for y in range(h0):
        for x in range(w0):
            for d in range(d0):
                cy, cx, cd = y, x, d
                s_ = 0.0
                for s in range(n):
                    s_ += inv_wgt[s] * volumes[s][cd, cy, cx]
                    cy //= 2
                    cx //= 2
                    cd = (cd + 1) // 2
                out[d, y, x] = s_
    return out


def test_solve_all_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.crossscale import solve_all

    rng = np.random.default_rng(0)
    h, w, d = 16, 20, 8
    vols = []
    hh, ww, dd = h, w, d
    for s in range(3):
        vols.append(rng.random((dd, hh, ww)).astype(np.float32))
        hh, ww = (hh + 1) // 2, (ww + 1) // 2
        dd = dd // 2 + 1
    ours = np.asarray(solve_all([jnp.asarray(v) for v in vols], 0.3))
    exp = oracle_solve_all(vols, 0.3)
    np.testing.assert_allclose(ours, exp, rtol=1e-5, atol=1e-6)


def test_pyr_down_is_cv_like():
    """pyrDown: [1,4,6,4,1]/16 separable blur, reflect-101, even decimate."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.crossscale import pyr_down

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (11, 13)).astype(np.float32)
    k = np.array([1, 4, 6, 4, 1], np.float64) / 16
    pad = np.pad(img.astype(np.float64), 2, mode="reflect")
    blur = np.zeros_like(img, np.float64)
    for v in range(11):
        for u in range(13):
            win = pad[v: v + 5, u: u + 5]
            blur[v, u] = k @ win @ k
    exp = blur[::2, ::2]
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    np.testing.assert_allclose(ours, exp, rtol=1e-5, atol=1e-4)
