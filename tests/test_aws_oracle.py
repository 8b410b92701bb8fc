"""Oracle test for AWS adaptive support-weight aggregation.

Per-pixel NumPy transcription of genWeight_AWS (h:1472-1493), calW4_AWS
(h:1533-1548) and calvm_AWS (h:1306-1350): joint left/right Lab weights
over the window, numer/denom normalization, out-of-range disparities keep
the original cost, reflect-101 borders. The Lab planes are taken from our
rgb_to_lab (uint8-rounded) so the test pins the aggregation semantics;
OpenCV's fixed-point Lab tables may differ by the odd LSB (documented in
ops/aws.py).
"""
import numpy as np


def oracle_aws(vol, lab_l, lab_r, r, gamma, lor):
    d_, h, w = vol.shape

    def pad_reflect(x):
        pw = [(r, r), (r, r)] + [(0, 0)] * (x.ndim - 2)
        return np.pad(x, pw, mode="reflect")

    labs = [pad_reflect(lab_l), pad_reflect(lab_r)]
    vol_p = np.pad(vol, ((0, 0), (r, r), (r, r)), mode="reflect")

    def weight(lab, v, u, dv, du):
        p = lab[v + r, u + r]
        q = lab[v + r + dv, u + r + du]
        d = p - q
        dist = np.sqrt(d[0] * d[0] * 0.153787 + d[1] * d[1] + d[2] * d[2])
        return np.exp(-dist / gamma)

    lc = 0 if lor == 0 else 1
    rc = -1 if lor == 0 else 0
    out = vol.astype(np.float64).copy()
    for v in range(h):
        for u in range(w):
            for d in range(d_):
                u1 = u + d * lc
                u2 = u + d * rc
                if not (u1 < w and u2 >= 0):
                    continue
                numer = denom = 0.0
                for dv in range(-r, r + 1):
                    for du in range(-r, r + 1):
                        ele = (weight(labs[0], v, u1, dv, du)
                               * weight(labs[1], v, u2, dv, du))
                        denom += ele
                        numer += ele * vol_p[d, v + r + dv, u + r + du]
                out[d, v, u] = numer / denom
    return out


def test_aws_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.config import MatchConfig
    from mystereomatching_tpu.ops.aws import aws_aggregate, rgb_to_lab

    rng = np.random.default_rng(0)
    h, w, d = 10, 14, 4
    il = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    ir = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    vol = rng.random((d, h, w)).astype(np.float32)
    cfg = MatchConfig(max_disp=d - 1, aws_win=3, aws_gamma=5.0)

    lab_l = np.asarray(rgb_to_lab(jnp.asarray(il)), np.float64)
    lab_r = np.asarray(rgb_to_lab(jnp.asarray(ir)), np.float64)
    for lor in (0, 1):
        ours = np.asarray(aws_aggregate(jnp.asarray(vol), jnp.asarray(il),
                                        cfg, jnp.asarray(ir), lor))
        exp = oracle_aws(vol, np.moveaxis(lab_l, -1, -1), lab_r, 3, 5.0, lor)
        np.testing.assert_allclose(ours, exp, rtol=3e-5, atol=3e-5)


def test_jbf_matches_direct():
    """jbf_volume against a direct dense NumPy evaluation of the JBF
    weight formula (the reference's ximgproc jointBilateralFilter path,
    cpp:5694-5709, radius 35/sigmas 5, 17.5 — here small for test size)."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.aws import jbf_volume

    rng = np.random.default_rng(1)
    h, w, d, r = 10, 12, 3, 2
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    vol = rng.random((d, h, w)).astype(np.float32)
    sc, ss = 25.0, 9.0

    imgp = np.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    volp = np.pad(vol, ((0, 0), (r, r), (r, r)), mode="reflect")
    exp = np.zeros_like(vol, np.float64)
    for v in range(h):
        for u in range(w):
            num = np.zeros(d)
            den = 0.0
            for dv in range(-r, r + 1):
                for du in range(-r, r + 1):
                    dc = np.sum((imgp[v + r + dv, u + r + du].astype(np.float64)
                                 - img[v, u]) ** 2)
                    wgt = np.exp(-dc / (2 * sc * sc)
                                 - (dv * dv + du * du) / (2 * ss * ss))
                    den += wgt
                    num += wgt * volp[:, v + r + dv, u + r + du]
            exp[:, v, u] = num / den
    ours = np.asarray(jbf_volume(jnp.asarray(vol), jnp.asarray(img), r, sc, ss))
    np.testing.assert_allclose(ours, exp, rtol=3e-5, atol=3e-5)
