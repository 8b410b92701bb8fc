"""Refinement passes vs NumPy oracles."""

import numpy as np
import pytest

import oracle


@pytest.fixture(scope="module")
def disp_pair():
    r = np.random.default_rng(21)
    h, w, d = 16, 24, 8
    d1 = r.integers(0, d, (h, w)).astype(np.int32)
    d2 = r.integers(0, d, (h, w)).astype(np.int32)
    # plant some consistent pixels
    for v in range(h):
        for u in range(w):
            if r.random() < 0.6 and u - d1[v, u] >= 0:
                d2[v, u - d1[v, u]] = d1[v, u]
    return d1, d2


def test_lrc_matches_oracle(disp_pair):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import lr_consistency

    d1, d2 = disp_pair
    got = np.asarray(lr_consistency(jnp.asarray(d1), jnp.asarray(d2), 0))
    want = oracle.lr_consistency(d1, d2, 0)
    np.testing.assert_array_equal(got, want)


def test_region_vote_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import region_vote

    r = np.random.default_rng(2)
    h, w, nd = 18, 22, 6
    disp = r.integers(0, nd, (h, w)).astype(np.int32)
    disp[r.random((h, w)) < 0.3] = -1
    # constant-ish region so "all agree" can fire
    disp[4:12, 4:16] = 3
    disp[6, 8] = -1
    arms = np.zeros((4, h, w), np.int32)
    v = np.arange(h)[:, None]
    u = np.arange(w)[None, :]
    arms[0] = np.minimum(3, u)
    arms[1] = np.minimum(3, w - 1 - u)
    arms[2] = np.minimum(3, v)
    arms[3] = np.minimum(3, h - 1 - v)

    for quirk in (True, False):
        got = np.asarray(region_vote(jnp.asarray(disp), jnp.asarray(arms), nd,
                                     s_thres=5, h_ratio=0.4, int_ratio_quirk=quirk))
        want = oracle.region_vote(disp, arms, nd, s_thres=5, int_quirk=quirk,
                                  ratio=0.4)
        np.testing.assert_array_equal(got, want)


def test_proper_interpolation_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import proper_interpolation

    r = np.random.default_rng(4)
    h, w = 20, 26
    disp = r.integers(0, 8, (h, w)).astype(np.int32)
    disp[r.random((h, w)) < 0.4] = -1
    disp[5:9, 5:12] = -32  # occlusion-coded block
    img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)

    got = np.asarray(proper_interpolation(jnp.asarray(disp),
                                          jnp.asarray(img, jnp.float32), 20, -32))
    want = oracle.proper_interpolation(disp, img, 20, -32)
    np.testing.assert_array_equal(got, want)


def test_bg_interpolation_takes_background():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import bg_interpolation

    d = np.array([[5, -1, -1, 2, -1]], np.int32)
    got = np.asarray(bg_interpolation(jnp.asarray(d)))
    np.testing.assert_array_equal(got, [[5, 2, 2, 2, 2]])


def test_median_small_matches_numpy():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.median import median_small

    r = np.random.default_rng(9)
    x = r.integers(0, 100, (12, 15)).astype(np.int32)
    got = np.asarray(median_small(jnp.asarray(x), 3))
    pad = np.pad(x, 1, mode="edge")
    want = np.empty_like(x)
    for v in range(12):
        for u in range(15):
            want[v, u] = np.median(pad[v:v + 3, u:u + 3])
    np.testing.assert_array_equal(got, want)


def test_subpixel_enhance_quadratic():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import subpixel_enhance

    vol = np.full((5, 1, 1), 10.0, np.float32)
    vol[1, 0, 0], vol[2, 0, 0], vol[3, 0, 0] = 4.0, 2.0, 4.0  # symmetric: offset 0
    disp = np.array([[2]], np.int32)
    got = float(np.asarray(subpixel_enhance(jnp.asarray(disp), jnp.asarray(vol)))[0, 0])
    assert abs(got - 2.0) < 1e-6

    vol[3, 0, 0] = 2.5  # skew right -> subpixel > 2
    got = float(np.asarray(subpixel_enhance(jnp.asarray(disp), jnp.asarray(vol)))[0, 0])
    assert 2.0 < got < 3.0


def test_lrc_classify_occ_vs_mis():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.refine import lr_consistency_classify

    d1 = np.array([[3, 0]], np.int32)
    d2 = np.array([[1, 9]], np.int32)
    got = np.asarray(lr_consistency_classify(jnp.asarray(d1), jnp.asarray(d2),
                                             num_disp=10))
    # pixel 0: d=3, u-d<0 -> fail; exists x=0: 0+d2[0]=1 -> marks col 1 not 0 -> OCC
    assert got[0, 0] == -32
    # pixel 1: d=0, d2[1]=9 mismatch -> fail; x=0 maps to 0+1=1 == u but d2[0]=1 < 10 -> MIS
    assert got[0, 1] == -48
