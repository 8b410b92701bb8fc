"""Oracle tests for the multi-level and adaptive cross-arm builders.

Per-pixel NumPy transcriptions of the calHorVerDis vector<int> overload
(cpp:3152-3253) and calHorVerDis2 (cpp:3255-3349), matched bit-exactly
against ops.arms.cross_arms_multilevel / cross_arms_adaptive.
"""
import numpy as np

_DIRS = ((0, -1), (0, 1), (-1, 0), (1, 0))


def _grow_oracle(img, anchor_thresh_fn, neigh_thresh, l_out, min_arm):
    h, w, _ = img.shape
    I = img.astype(np.int64)
    arms = np.zeros((4, h, w), np.int32)
    for i, (dv, du) in enumerate(_DIRS):
        for v in range(h):
            for u in range(w):
                arm = 1
                while arm <= l_out:
                    va, ua = v + arm * dv, u + arm * du
                    if not (0 <= va < h and 0 <= ua < w):
                        break
                    vp, up = v + (arm - 1) * dv, u + (arm - 1) * du
                    if np.max(np.abs(I[va, ua] - I[vp, up])) > neigh_thresh:
                        break
                    if np.max(np.abs(I[v, u] - I[va, ua])) > \
                            anchor_thresh_fn(arm):
                        break
                    arm += 1
                arm -= 1
                if arm >= min_arm:
                    arms[i, v, u] = arm
                else:
                    for ln in range(min_arm, -1, -1):
                        if (0 <= u + ln * du < w) and (0 <= v + ln * dv < h):
                            arms[i, v, u] = ln
                            break
    return arms


def test_multilevel_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import cross_arms_multilevel

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (20, 24, 3)).astype(np.float32)
    ls, ts = (4, 7, 10), (20, 30, 15)

    def thr(arm):
        for ll, tt in zip(ls, ts):
            if arm <= ll:
                return tt
        return ts[-1]

    ours = np.asarray(cross_arms_multilevel(jnp.asarray(img), ls, ts,
                                            neigh_thresh=20, min_arm=1))
    ref = _grow_oracle(img, thr, 20, ls[-1], 1)
    np.testing.assert_array_equal(ours, ref)


def test_adaptive_matches_oracle():
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import cross_arms_adaptive

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 24, 3)).astype(np.float32)
    l_in, l_out, c_in, c_out = 5, 9, 20, 6

    def thr(arm):
        # int c_d = C_D - ((float)C_D / L * arm) + 10  (cpp:3305)
        return int(c_in - c_in / l_in * arm + 10) if arm <= l_in else c_out

    ours = np.asarray(cross_arms_adaptive(jnp.asarray(img), l_in, l_out,
                                          c_in, c_out, min_arm=1))
    ref = _grow_oracle(img, thr, c_in, l_out, 1)
    np.testing.assert_array_equal(ours, ref)


def test_two_level_refactor_unchanged():
    """cross_arms now routes through the shared _grow_arms core; it must
    stay bit-identical to the oracle-locked two-threshold semantics."""
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.arms import cross_arms
    from tests.oracle import cross_arms as oracle_cross_arms

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (18, 22, 3)).astype(np.float32)
    ours = np.asarray(cross_arms(jnp.asarray(img), 4, 8, 20, 6, 1))
    ref = oracle_cross_arms(img, 4, 8, 20, 6, 1)
    np.testing.assert_array_equal(ours, ref)


def test_pipeline_arm_modes_run():
    import numpy as np
    from mystereomatching_tpu.config import MatchConfig
    from mystereomatching_tpu.pipeline import StereoPipeline
    from mystereomatching_tpu.data import make_synthetic_pair

    p = make_synthetic_pair(h=40, w=56, max_disp=7, seed=0)
    for mode in ("multilevel", "adaptive"):
        cfg = MatchConfig(max_disp=7, cbca_arm_mode=mode,
                          cbca_cross_ls=(5, 8, 12),
                          cbca_c_threshes=(20, 30, 30)).validate()
        d = np.asarray(StereoPipeline(cfg)(p.left, p.right)["disparity"])
        assert d.shape == (40, 56)
