"""Cross arms + CBCA aggregation vs NumPy oracles."""

import numpy as np
import pytest

import oracle


@pytest.fixture(scope="module")
def img():
    r = np.random.default_rng(11)
    # piecewise-smooth image so arms have interesting lengths
    h, w = 16, 20
    base = r.integers(0, 5, (4, 5, 3))
    img = np.kron(base, np.ones((4, 4, 1))) * 40 + r.integers(0, 12, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_cross_arms_match_oracle(img):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import cross_arms

    got = np.asarray(cross_arms(jnp.asarray(img, jnp.float32),
                                l_in=4, l_out=8, c_in=20, c_out=6, min_arm=1))
    want = oracle.cross_arms(img, 4, 8, 20, 6, 1)
    np.testing.assert_array_equal(got, want)


def test_intersect_arms_match_oracle(img):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import cross_arms, intersect_arms

    r = np.random.default_rng(5)
    img2 = np.clip(img.astype(int) + r.integers(-10, 10, img.shape), 0, 255).astype(np.uint8)
    a0 = oracle.cross_arms(img, 4, 8, 20, 6, 1)
    a1 = oracle.cross_arms(img2, 4, 8, 20, 6, 1)
    for lor in (0, 1):
        got = np.asarray(intersect_arms(jnp.asarray(a0), jnp.asarray(a1), 5, lor))
        want = oracle.intersect_arms(a0, a1, 5, lor)
        np.testing.assert_array_equal(got, want)


def test_arm_bounded_sum_simple():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import arm_bounded_sum

    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 1, 10)
    a1 = jnp.full((1, 1, 10), 1, jnp.int32)
    a2 = jnp.full((1, 1, 10), 2, jnp.int32)
    # clamp-safe interior check: sum over [u-1, u+2]
    got = np.asarray(arm_bounded_sum(x, a1, a2, axis=2))[0, 0]
    assert got[3] == 2 + 3 + 4 + 5


def test_cbca_matches_oracle(img):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import cross_arms, intersect_arms
    from mystereomatching_tpu.ops.aggregation import cbca

    r = np.random.default_rng(3)
    d = 4
    vol = r.random((d, *img.shape[:2])).astype(np.float32)
    img2 = np.clip(img.astype(int) + r.integers(-8, 8, img.shape), 0, 255).astype(np.uint8)

    a0 = oracle.cross_arms(img, 4, 8, 20, 6, 1)
    a1 = oracle.cross_arms(img2, 4, 8, 20, 6, 1)
    ai = oracle.intersect_arms(a0, a1, d, 0)

    got = np.asarray(cbca(jnp.asarray(vol), jnp.asarray(ai), iterations=2))
    want = oracle.cbca(vol, ai, iterations=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_intersect_arms_block_matches_dense(rng):
    """D-streaming arm intersection == the dense intersect_arms slice."""
    import jax.numpy as jnp

    from mystereomatching_tpu.ops import arms as A

    h, w, nd = 20, 30, 12
    al = jnp.asarray(rng.integers(0, 8, (4, h, w)), jnp.int32)
    ar = jnp.asarray(rng.integers(0, 8, (4, h, w)), jnp.int32)
    for lor in (0, 1):
        dense = A.intersect_arms(al, ar, nd, lor)
        for d0, db in ((0, 4), (4, 4), (8, 4)):
            ds = d0 + jnp.arange(db, dtype=jnp.int32)
            blk = A.intersect_arms_block(al, ar, ds, lor)
            np.testing.assert_array_equal(np.asarray(blk),
                                          np.asarray(dense[:, d0:d0 + db]))
