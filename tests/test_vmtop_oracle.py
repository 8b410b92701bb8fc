"""Oracle tests for vmTop decision methods 1 and 2.

NumPy transcriptions of genDispFromTopCostVm2 (stereoMatching.cpp:
1786-1817 method 1, 1819-1883 method 2) run per-pixel in raster order
exactly like the reference; the vectorized lax.scan implementations must
match on random candidate sets.
"""
import numpy as np


def oracle_method1(cand_d, count):
    m, h, w = cand_d.shape
    disp = np.zeros((h, w), np.int32)
    for v in range(h):
        for u in range(w):
            n = count[v, u]
            if u == 0 or n == 1:
                disp[v, u] = cand_d[0, v, u]
                continue
            dp_, d_ldis = -1, 10000
            for k in range(n):
                s = abs(disp[v, u - 1] - cand_d[k, v, u])
                if s < 2 and s < d_ldis:
                    d_ldis = s
                    dp_ = cand_d[k, v, u]
            disp[v, u] = cand_d[0, v, u] if dp_ == -1 else dp_
    return disp


def oracle_method2(cand_d, count, img):
    m, h, w = cand_d.shape
    disp = np.zeros((h, w), np.int32)
    for v in range(h):
        for u in range(w):
            n = count[v, u]
            if u == 0 or n == 1:
                disp[v, u] = cand_d[0, v, u]
                continue
            d_pre = disp[v, u - 1]
            d0, dif_pre = -1, 10**6
            for k in range(n):
                dif = abs(cand_d[k, v, u] - d_pre)
                if dif < 2 and dif < dif_pre:
                    dif_pre = dif
                    d0 = cand_d[k, v, u]
            d1, dif_aft = -1, 10**6
            if u < w - 1:
                d_aft = cand_d[0, v, u + 1]
                for k in range(n):
                    dif = abs(cand_d[k, v, u] - d_aft)
                    if dif < 2 and dif < dif_aft:
                        dif_aft = dif
                        d1 = cand_d[k, v, u]
            if d0 != -1 and d1 == -1:
                disp[v, u] = d0
            elif d0 == -1 and d1 != -1:
                disp[v, u] = d1
            elif d0 == -1 and d1 == -1:
                disp[v, u] = cand_d[0, v, u]
            else:
                cdif_pre = int(np.abs(img[v, u].astype(np.int64)
                                      - img[v, u - 1]).sum())
                cdif_aft = int(np.abs(img[v, u].astype(np.int64)
                                      - img[v, u + 1]).sum())
                disp[v, u] = d0 if cdif_pre <= cdif_aft else d1
    return disp


def _candidates(rng, m, h, w, num_disp):
    cand = rng.integers(0, num_disp, size=(m, h, w)).astype(np.int32)
    count = rng.integers(1, m + 1, size=(h, w)).astype(np.int32)
    return cand, count


def test_method1_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.vmtop import disp_from_top_method1

    rng = np.random.default_rng(7)
    cand, count = _candidates(rng, 4, 23, 31, 12)
    ours = np.asarray(disp_from_top_method1(jnp.asarray(cand),
                                            jnp.asarray(count)))
    np.testing.assert_array_equal(ours, oracle_method1(cand, count))


def test_method2_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.vmtop import disp_from_top_method2

    rng = np.random.default_rng(11)
    cand, count = _candidates(rng, 4, 23, 31, 12)
    img = rng.integers(0, 256, size=(23, 31, 3)).astype(np.uint8)
    ours = np.asarray(disp_from_top_method2(jnp.asarray(cand),
                                            jnp.asarray(count),
                                            jnp.asarray(img)))
    np.testing.assert_array_equal(ours, oracle_method2(cand, count, img))
