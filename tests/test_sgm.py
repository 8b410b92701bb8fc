"""SGM scan kernels vs the NumPy oracle (updateCost/costScan semantics)."""

import numpy as np
import pytest

import oracle


@pytest.fixture(scope="module")
def problem():
    r = np.random.default_rng(13)
    h, w, d = 10, 14, 6
    vol = (r.random((d, h, w)) * 5).astype(np.float32)
    img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
    return vol, img


@pytest.mark.parametrize("rv,ru", [(0, -1), (0, 1), (-1, 0), (1, 0),
                                   (1, -1), (1, 1), (-1, 1), (-1, -1)])
def test_single_direction_matches_oracle(problem, rv, ru):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.sgm import scan_direction

    vol, img = problem
    got = np.asarray(scan_direction(jnp.asarray(vol), jnp.asarray(img, jnp.float32),
                                    rv, ru, 1.0, 3.0, 15, 4.0))
    want = oracle.sgm_direction(vol, img, rv, ru)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_full_sgm_4dir(problem):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.sgm import sgm

    vol, img = problem
    got = np.asarray(sgm(jnp.asarray(vol), jnp.asarray(img, jnp.float32), 4))
    want = oracle.sgm(vol, img, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_full_sgm_8dir(problem):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.sgm import sgm

    vol, img = problem
    got = np.asarray(sgm(jnp.asarray(vol), jnp.asarray(img, jnp.float32), 8))
    want = oracle.sgm(vol, img, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
