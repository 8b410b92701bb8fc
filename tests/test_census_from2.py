"""Oracle test for the two-window census blend (census_from2).

NumPy per-pixel transcription of gen_cenVM_XOR_From2Code (h:983-1078,
active line h:1073 = truncated+normalized first-window cost) and
gen_cenVM_XOR_From2Code_tem (h:1080-1142, active line h:1115-1116 =
b*cost0 + a*cost1 with a = 1-exp(-0.1/(grad+1))), run against
ops.cost.census_from2_volume.
"""
import numpy as np

from tests.oracle import census_bits_ncsur, census_hamming_volume


def oracle_cal_grad(gray):
    """calGrad (cpp:271-318): x central difference, one-sided borders."""
    g = gray.astype(np.float32)
    out = np.empty_like(g)
    out[:, 1:-1] = 0.5 * (g[:, 2:] - g[:, :-2])
    out[:, 0] = g[:, 1] - g[:, 0]
    out[:, -1] = g[:, -1] - g[:, -2]
    return out


def oracle_from2_tem(gray_l, gray_r, num_disp, lor, rv0, ru0, rv1, ru1):
    """gen_cenVM_XOR_From2Code_tem: per-pixel gradient blend of two
    length-normalized (untruncated) census costs; off-image -> 1."""
    n0 = (2 * rv0 + 1) * (2 * ru0 + 1) + 8
    n1 = (2 * rv1 + 1) * (2 * ru1 + 1) + 8
    c0 = census_hamming_volume(census_bits_ncsur(gray_l, rv0, ru0),
                               census_bits_ncsur(gray_r, rv0, ru0),
                               num_disp, lor, n0, 1.0, normalize=True)
    c1 = census_hamming_volume(census_bits_ncsur(gray_l, rv1, ru1),
                               census_bits_ncsur(gray_r, rv1, ru1),
                               num_disp, lor, n1, 1.0, normalize=True)
    g = oracle_cal_grad(gray_l if lor == 0 else gray_r)
    a = 1.0 - np.exp(-0.1 / (g + 1.0))
    return (1.0 - a)[None] * c0 + a[None] * c1


def _cfg(blend, trunc=1.0):
    from mystereomatching_tpu.config import MatchConfig
    return MatchConfig(max_disp=7, cost="census_from2", census_func=3,
                       census_rv=2, census_ru=2, census_rv2=3, census_ru2=3,
                       census_trunc_ratio=trunc,
                       census_from2_blend=blend).validate()


def _pair(seed=3, h=20, w=26):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (h, w)).astype(np.float32),
            rng.integers(0, 256, (h, w)).astype(np.float32))


def test_from2_grad_blend_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import census_from2_volume

    gl, gr = _pair()
    cfg = _cfg("grad")
    for lor in (0, 1):
        ours = np.asarray(census_from2_volume(jnp.asarray(gl),
                                              jnp.asarray(gr), cfg, lor))
        ref = oracle_from2_tem(gl, gr, cfg.num_disp, lor, 2, 2, 3, 3)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_from2_first_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import census_from2_volume

    gl, gr = _pair(seed=9)
    cfg = _cfg("first", trunc=0.4)
    n0 = (2 * 2 + 1) * (2 * 2 + 1) + 8
    ref = census_hamming_volume(census_bits_ncsur(gl, 2, 2),
                                census_bits_ncsur(gr, 2, 2),
                                cfg.num_disp, 0, n0, 0.4, normalize=True)
    ours = np.asarray(census_from2_volume(jnp.asarray(gl), jnp.asarray(gr),
                                          cfg, 0))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_from2_streaming_matches_dense():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.cost import census_from2_volume

    gl, gr = _pair(seed=5)
    cfg = _cfg("grad")
    dense = census_from2_volume(jnp.asarray(gl), jnp.asarray(gr), cfg, 0)
    blk = census_from2_volume(jnp.asarray(gl), jnp.asarray(gr), cfg, 0,
                              disps=jnp.arange(2, 6))
    np.testing.assert_array_equal(np.asarray(dense)[2:6], np.asarray(blk))
