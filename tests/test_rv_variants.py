"""Oracle tests for the region-vote / background-fill variant family.

Per-pixel NumPy transcriptions of cal_histogram_for_HV (cpp:6830-6862),
cal_histogram_for_Tile (cpp:6864-6911), compareArmL (cpp:6913-6923),
regionVoteForWholeDispImg (cpp:6949-6962), backgroundInterpolateCore
(cpp:7010-7044) and backgroundInterpolateCore_ (cpp:7045-7144), and
RV_combine_BG (cpp:7146-7216), checked against the vectorized ops.
"""
import numpy as np
import pytest


def _rand_case(seed=0, h=18, w=24, num_disp=8, invalid_frac=0.35):
    rng = np.random.default_rng(seed)
    disp = rng.integers(0, num_disp, (h, w)).astype(np.int32)
    inval = rng.random((h, w)) < invalid_frac
    # sprinkle OCC/MIS sentinels like a classifying LRC would
    sent = np.where(rng.random((h, w)) < 0.5, -32, -48)
    disp = np.where(inval, sent, disp)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)

    def arms_for(dirs):
        a = np.zeros((4, h, w), np.int32)
        for i, (dv, du) in enumerate(dirs):
            raw = rng.integers(0, 5, (h, w))
            for v in range(h):
                for u in range(w):
                    lim = 10 ** 9
                    if dv < 0:
                        lim = min(lim, v)
                    if dv > 0:
                        lim = min(lim, h - 1 - v)
                    if du < 0:
                        lim = min(lim, u)
                    if du > 0:
                        lim = min(lim, w - 1 - u)
                    a[i, v, u] = min(raw[v, u], lim)
        return a

    hv = arms_for(((0, -1), (0, 1), (-1, 0), (1, 0)))
    tilt = arms_for(((-1, -1), (1, 1), (-1, 1), (1, -1)))
    return disp, img, hv, tilt


def oracle_vote_hv(disp, arms, num_disp, s_thres, h_ratio):
    h, w = disp.shape
    out = np.full((h, w), -1, np.int32)
    for v in range(h):
        for u in range(w):
            hist = np.zeros(num_disp, np.int64)
            n = 0
            for vn in range(v - arms[2, v, u], v + arms[3, v, u] + 1):
                for un in range(u - arms[0, vn, u], u + arms[1, vn, u] + 1):
                    if disp[vn, un] >= 0:
                        hist[disp[vn, un]] += 1
                        n += 1
            if n <= s_thres:
                continue
            most = int(np.argmax(hist))
            if np.float32(hist[most]) / np.float32(n) > np.float32(h_ratio):
                out[v, u] = most
    return out


def oracle_vote_tilt(disp, tilt, num_disp, s_thres, h_ratio):
    h, w = disp.shape
    out = np.full((h, w), -1, np.int32)
    for v in range(h):
        for u in range(w):
            hist = np.zeros(num_disp, np.int64)
            n = 0
            for m in range(-tilt[2, v, u], tilt[3, v, u] + 1):
                vm, um = v + m, u - m
                for b in range(-tilt[0, vm, um], tilt[1, vm, um] + 1):
                    vb, ub = vm + b, um + b
                    if 0 <= vb < h and 0 <= ub < w and disp[vb, ub] >= 0:
                        hist[disp[vb, ub]] += 1
                        n += 1
            if n <= s_thres:
                continue
            most = int(np.argmax(hist))
            if np.float32(hist[most]) / np.float32(n) > np.float32(h_ratio):
                out[v, u] = most
    return out


def oracle_bg_2dir(disp, v, u, depth):
    h, w = disp.shape
    vec = [-1, -1]
    for i, step in enumerate((1, -1)):         # right first (cpp:7016)
        for d in range(1, depth + 1):
            un = u + d * step
            if not (0 <= un < w):
                break
            if disp[v, un] >= 0:
                vec[i] = disp[v, un]
                break
    if vec[0] != -1 and vec[1] == -1:
        return vec[0]
    if vec[0] == -1 and vec[1] != -1:
        return vec[1]
    return vec[0] if vec[0] < vec[1] else vec[1]


def oracle_bg_4dir(disp, img, v, u, depth):
    h, w = disp.shape
    dv = (0, 0, -1, 1)
    du = (-1, 1, 0, 0)
    cand = [(-1.0, -1.0)] * 4
    for k in range(4):
        for dep in range(1, depth + 1):
            vn, un = v + dep * dv[k], u + dep * du[k]
            if not (0 <= vn < h and 0 <= un < w):
                break
            if disp[vn, un] >= 0:
                dif = float(np.max(np.abs(img[vn, un] - img[v, u])))
                cand[k] = (float(disp[vn, un]), dif)
                break
    j, dn = -1, 10000.0
    for i in range(4):
        if cand[i][0] >= 0 and cand[i][0] < dn:
            dn = cand[i][0]
            j = i
    if j >= 2:
        z, dz = j, 10000.0
        for i in range(2):
            if cand[i][0] >= 0 and cand[i][0] < dz:
                z, dz = i, cand[i][0]
        if cand[z][1] < cand[j][1]:
            j = z
    return -1 if j == -1 else int(cand[j][0])


def test_vote_hv_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import vote_hv

    disp, _, hv, _ = _rand_case(seed=1)
    ours = np.asarray(vote_hv(jnp.asarray(disp), jnp.asarray(hv), 8, 3, 0.4,
                              max_arm=6))
    np.testing.assert_array_equal(ours, oracle_vote_hv(disp, hv, 8, 3, 0.4))


def test_vote_tilt_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import vote_tilt

    disp, _, _, tilt = _rand_case(seed=2)
    ours = np.asarray(vote_tilt(jnp.asarray(disp), jnp.asarray(tilt), 8, 3,
                                0.4, max_arm=6))
    np.testing.assert_array_equal(ours,
                                  oracle_vote_tilt(disp, tilt, 8, 3, 0.4))


def test_whole_image_vote_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import region_vote_whole_image

    disp, _, hv, _ = _rand_case(seed=3)
    ours = np.asarray(region_vote_whole_image(jnp.asarray(disp),
                                              jnp.asarray(hv), 8, max_arm=6))
    np.testing.assert_array_equal(ours, oracle_vote_hv(disp, hv, 8, 0, 0.0))


@pytest.mark.parametrize("depth", [3, 1000])
def test_bg_2dir_matches_oracle(depth):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import bg_fill_2dir

    disp, _, _, _ = _rand_case(seed=4)
    fill, _ = bg_fill_2dir(jnp.asarray(disp), depth, 8)
    fill = np.asarray(fill)
    for v in range(disp.shape[0]):
        for u in range(disp.shape[1]):
            assert fill[v, u] == oracle_bg_2dir(disp, v, u, depth), (v, u)


@pytest.mark.parametrize("depth", [4, 1000])
def test_bg_4dir_matches_oracle(depth):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import bg_fill_4dir

    disp, img, _, _ = _rand_case(seed=5)
    fill = np.asarray(bg_fill_4dir(jnp.asarray(disp), jnp.asarray(img),
                                   depth))
    for v in range(disp.shape[0]):
        for u in range(disp.shape[1]):
            assert fill[v, u] == oracle_bg_4dir(disp, img, v, u, depth), (v, u)


@pytest.mark.parametrize("itype", [0, 1, 2, 3])
def test_rv_combine_bg_matches_oracle(itype):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import rv_combine_bg

    disp, img, hv, tilt = _rand_case(seed=6 + itype)
    ours = np.asarray(rv_combine_bg(
        jnp.asarray(disp), jnp.asarray(hv), jnp.asarray(tilt),
        jnp.asarray(img), 8, s_thres=2, h_ratio=0.4,
        interpolate_type=itype, reg_vote_type=0, bg_depth=1000, bg_dirs=2,
        max_arm=6))

    rv = oracle_vote_hv(disp, hv, 8, 2, 0.4)
    h, w = disp.shape
    exp = disp.copy()
    for v in range(h):
        for u in range(w):
            if disp[v, u] >= 0:
                continue
            dp = -1
            if itype == 0:
                dp = rv[v, u]
            elif itype == 1:
                dp = oracle_bg_2dir(disp, v, u, 1000)
            elif itype == 2:
                if disp[v, u] == -32:
                    dp = oracle_bg_2dir(disp, v, u, 1000)
                elif disp[v, u] == -48:
                    dp = rv[v, u]
            else:
                if disp[v, u] == -32:
                    bg = oracle_bg_2dir(disp, v, u, 1000)
                    r = rv[v, u]
                    if bg >= 0 and r < 0:
                        dp = bg
                    elif bg < 0 and r >= 0:
                        dp = r
                    elif bg >= 0 and r >= 0:
                        dp = r if r <= bg else bg
                elif disp[v, u] == -48:
                    dp = rv[v, u]
            if dp >= 0:
                exp[v, u] = dp
    np.testing.assert_array_equal(ours, exp)


def test_region_vote_core_gate():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import (region_vote_core, vote_hv,
                                                 vote_tilt)

    disp, _, hv, tilt = _rand_case(seed=11)
    got = np.asarray(region_vote_core(jnp.asarray(disp), jnp.asarray(hv),
                                      jnp.asarray(tilt), 8, 2, 0.4,
                                      reg_vote_type=2, max_arm=6))
    v_hv = np.asarray(vote_hv(jnp.asarray(disp), jnp.asarray(hv), 8, 2, 0.4,
                              max_arm=6))
    v_tl = np.asarray(vote_tilt(jnp.asarray(disp), jnp.asarray(tilt), 8, 2,
                                0.4, max_arm=6))
    exp = np.where(hv[:4].sum(0) > tilt[:4].sum(0), v_hv, v_tl)
    np.testing.assert_array_equal(got, exp)


def test_fill_surrounding():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import fill_surrounding

    disp = np.arange(11 * 13, dtype=np.int32).reshape(11, 13)
    got = np.asarray(fill_surrounding(jnp.asarray(disp), 3, 4, -16))
    exp = disp.copy()
    exp[:3] = -16
    exp[-3:] = -16
    exp[3:-3, :4] = -16
    exp[3:-3, -4:] = -16
    np.testing.assert_array_equal(got, exp)


def test_pipeline_rv_combine_bg_runs():
    import jax.numpy as jnp
    from mystereomatching_tpu.config import MatchConfig
    from mystereomatching_tpu.pipeline import StereoPipeline
    from mystereomatching_tpu.data import make_synthetic_pair

    p = make_synthetic_pair(h=48, w=64, max_disp=7, seed=0)
    cfg = MatchConfig(max_disp=7, lrc_classify=True, rv_use_combine_bg=True,
                      interpolate_type=3, reg_vote_type=2,
                      do_fill_surrounding=True,
                      do_rv_whole_image=True).validate()
    out = StereoPipeline(cfg)(p.left, p.right)
    d = np.asarray(out["disparity"])
    assert d.shape == (48, 64)
    assert np.isfinite(d).all()
