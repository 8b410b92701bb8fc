"""Kernel unit tests for L1 cost volumes vs NumPy oracles."""

import numpy as np
import pytest

import oracle


@pytest.fixture(scope="module")
def imgs(rng=None):
    r = np.random.default_rng(7)
    h, w = 14, 22
    left = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
    right = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
    return left, right


@pytest.mark.parametrize("lor", [0, 1])
@pytest.mark.parametrize("squared", [False, True])
def test_ad_matches_oracle(imgs, lor, squared):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import ad_volume

    left, right = imgs
    d = 6
    got = np.asarray(ad_volume(jnp.asarray(left, jnp.float32),
                               jnp.asarray(right, jnp.float32), d, lor,
                               trunc=1e9, squared=squared))
    want = oracle.ad_volume(left, right, d, lor, trunc=1e9, squared=squared)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("lor", [0, 1])
def test_census_ncsur_matches_oracle(imgs, lor):
    import jax.numpy as jnp
    from mystereomatching_tpu.data import rgb_to_gray
    from mystereomatching_tpu.ops.census import (
        census_code_ncsur, hamming_volume, ncsur_code_length)

    left, right = imgs
    gl, gr = rgb_to_gray(left), rgb_to_gray(right)
    rv, ru = 2, 3
    d = 5
    n = ncsur_code_length(rv, ru)

    cl = census_code_ncsur(jnp.asarray(gl), rv, ru)
    cr = census_code_ncsur(jnp.asarray(gr), rv, ru)
    got = np.asarray(hamming_volume(cl, cr, d, lor, n))

    bl = oracle.census_bits_ncsur(gl, rv, ru)
    br = oracle.census_bits_ncsur(gr, rv, ru)
    want = oracle.census_hamming_volume(bl, br, d, lor, n)
    np.testing.assert_allclose(got, want)


def test_bt_symmetric_zero_on_identical(imgs):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import bt_volume

    left, _ = imgs
    g = jnp.asarray(left[..., 0], jnp.float32)
    vol = np.asarray(bt_volume(g, g, 4, 0))
    # at d=0 identical images match exactly
    np.testing.assert_allclose(vol[0], 0.0, atol=1e-5)


def test_grad_volume_shapes_and_default(imgs):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import grad_volume, central_gradient

    left, right = imgs
    gl = jnp.asarray(left[..., 0], jnp.float32)
    gr = jnp.asarray(right[..., 0], jnp.float32)
    vol = np.asarray(grad_volume(gl, gr, 5, 0, trunc=500.0,
                                 use_2dir=True, adaptive_weight=False))
    assert vol.shape == (5, 14, 22)
    # invalid region (u < d) takes sqrt(2*T^2)
    assert np.allclose(vol[4, :, :4], np.sqrt(2 * 500.0 ** 2))

    # central gradient endpoints are one-sided (calGrad cpp:284-286)
    g = np.asarray(central_gradient(gl, 1))
    gn = np.asarray(gl)
    np.testing.assert_allclose(g[:, 0], gn[:, 1] - gn[:, 0])
    np.testing.assert_allclose(g[:, -1], gn[:, -1] - gn[:, -2])
    np.testing.assert_allclose(g[:, 5], 0.5 * (gn[:, 6] - gn[:, 4]))


def test_zncc_identical_images_zero_cost(imgs):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import zncc_volume

    left, _ = imgs
    g = jnp.asarray(left[..., 1], jnp.float32)
    vol = np.asarray(zncc_volume(g, g, 3, 0, rv=2, ru=2))
    # The reference's asymmetric-window numerator (gen_NCC_vm cpp:2455-2458,
    # dv/du upper bound exclusive) makes NCC<1 even for identical images, so
    # cost at d=0 is not exactly 0 — but it must still be the per-pixel
    # minimum over disparities in the interior.
    interior = vol[:, 3:-3, 5:-5]
    assert (interior.argmin(0) == 0).mean() > 0.95


def test_exp_fusion_formula():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import exp_fuse2

    a = jnp.asarray([[1.0]])
    b = jnp.asarray([[2.0]])
    got = float(exp_fuse2(a, b, 13.0, 1.0)[0, 0])
    want = 2 - np.exp(-1 / 13.0) - np.exp(-2.0)
    assert abs(got - want) < 1e-6


def test_grad_mag_phase_volume_zero_at_true_shift(rng):
    """mag+phase gradient cost (cpp:466-534): zero at the true disparity of
    a pure horizontal translation (interior), positive elsewhere."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops.cost import grad_mag_phase_volume

    g = jnp.asarray(rng.random((24, 40)) * 255, jnp.float32)
    gr = jnp.roll(g, -3, axis=1)        # right image: left shifted by d=3
    vol = np.asarray(grad_mag_phase_volume(g, gr, 8, 0))
    inner = vol[:, 2:-2, 6:-6]
    assert np.allclose(inner[3], 0.0, atol=1e-4)
    assert inner[0].mean() > 0.01
