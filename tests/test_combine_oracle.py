"""Oracle tests for the combiner family (combine2Vm/_2/_3/_4,
combine_Cross_FW, calPKR) and the double-window CBCA mode.

Each oracle is a direct per-pixel transcription of the reference loops
(stereoMatching.cpp:4087-4331, 5803-5862), run on random volumes/arms and
compared elementwise against the vectorized ops in ops/combine.py.
"""

import numpy as np
import pytest

FMAX = np.finfo(np.float32).max


# --------------------------------------------------------------------------
# NumPy oracles (naive loops, transcribed from the cpp)
# --------------------------------------------------------------------------

def pkr_mask_oracle(vm, ratio_pkr=0.1):
    """calPKR (cpp:4087-4126): mask=1 where (c2-c1)/c2 < 0.1; c2 is the
    second-smallest after masking only the FIRST occurrence of the min."""
    d_, h, w = vm.shape
    mask = np.zeros((h, w), bool)
    for v in range(h):
        for u in range(w):
            vmP = vm[:, v, u].astype(np.float32).copy()
            cost = [0.0, 0.0]
            for n in range(2):
                m, disp = FMAX, -1
                for d in range(d_):
                    if vmP[d] < m:
                        m, disp = vmP[d], d
                cost[n] = m
                vmP[disp] = FMAX
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = (cost[1] - cost[0]) / cost[1]
            mask[v, u] = bool(ratio < ratio_pkr)
    return mask


def combine2vm_oracle(vm, vm2):
    """combine2Vm (cpp:4142-4168): blend 0.3/0.7 where the PKR mask of
    THIS volume marks ambiguity."""
    out = vm.copy()
    mask = pkr_mask_oracle(vm)
    for v in range(vm.shape[1]):
        for u in range(vm.shape[2]):
            if mask[v, u]:
                out[:, v, u] = vm[:, v, u] * np.float32(0.3) \
                    + vm2[:, v, u] * np.float32(0.7)
    return out


def combine2vm_2_oracle(vm, vm2, arms, arm_limit=10):
    """combine2Vm_2 (cpp:4170-4215): blend where ALL four arms <= limit."""
    out = vm.copy()
    for v in range(vm.shape[1]):
        for u in range(vm.shape[2]):
            if all(arms[k, v, u] <= arm_limit for k in range(4)):
                out[:, v, u] = vm[:, v, u] * np.float32(0.3) \
                    + vm2[:, v, u] * np.float32(0.7)
    return out


def combine2vm_3_oracle(vm, vm2, dis_thres=0.0):
    """combine2Vm_3 (cpp:4217-4271): per-pixel blend where min(vm2) is a
    strict relative improvement over min(vm)."""
    out = vm.copy()
    for v in range(vm.shape[1]):
        for u in range(vm.shape[2]):
            c0 = float(vm[:, v, u].min())
            c1 = float(vm2[:, v, u].min())
            chose_is_small = True
            if c1 < c0:
                with np.errstate(divide="ignore", invalid="ignore"):
                    if (c0 - c1) / c0 > dis_thres:
                        chose_is_small = False
            if not chose_is_small:
                out[:, v, u] = np.float32(0.3) * vm[:, v, u] \
                    + np.float32(0.7) * vm2[:, v, u]
    return out


def combine2vm_4_oracle(vm, vm2, arms_left, arm_thres=5.0):
    """combine2Vm_4 (cpp:4273-4331): smoothed (3x3 normalized boxFilter,
    BORDER_REFLECT_101) max-arm map of the LEFT image's arms; where < 5
    take vm2 entirely (the active line is vm*0 + vm2*1, cpp:4322)."""
    h, w = arms_left.shape[1:]
    arm_lst = arms_left[:4].max(0).astype(np.float32)

    def ref(i, n):
        if n == 1:
            return 0
        period = 2 * (n - 1)
        i = abs(i) % period
        return period - i if i >= n else i

    sm = np.zeros((h, w), np.float32)
    for v in range(h):
        for u in range(w):
            s = 0.0
            for dv in (-1, 0, 1):
                for du in (-1, 0, 1):
                    s += arm_lst[ref(v + dv, h), ref(u + du, w)]
            sm[v, u] = s / 9.0
    out = vm.copy()
    for v in range(h):
        for u in range(w):
            if sm[v, u] < arm_thres:
                out[:, v, u] = vm2[:, v, u]
    return out


def combine_cross_fw_oracle(vm, vm_fw, arms_int, fw_type=4, area_is=None,
                            arm_len_limit=12, arm_l_sum=8, arm_l_single=6,
                            cost_compare=True):
    """combine_Cross_FW (cpp:5803-5862), per-disparity intersected arms."""
    d_, h, w = vm.shape
    out = vm.copy()
    for v in range(h):
        for u in range(w):
            for d in range(d_):
                arm_sum = int(arms_int[:4, d, v, u].sum())
                if fw_type == 1:
                    if arm_sum < arm_len_limit:
                        out[d, v, u] = vm_fw[d, v, u]
                elif fw_type == 3:
                    if area_is[d, v, u] < 5:
                        out[d, v, u] = vm_fw[d, v, u]
                elif fw_type == 4:
                    arm_hl = int(arms_int[0, d, v, u] + arms_int[1, d, v, u])
                    arm_vl = int(arms_int[2, d, v, u] + arms_int[3, d, v, u])
                    if (arm_sum < arm_l_sum and arm_hl < arm_l_single
                            and arm_vl < arm_l_single):
                        if cost_compare:
                            if out[d, v, u] > vm_fw[d, v, u]:
                                out[d, v, u] = vm_fw[d, v, u]
                        else:
                            out[d, v, u] = vm_fw[d, v, u]
    return out


# --------------------------------------------------------------------------
# Fixtures
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vols():
    r = np.random.default_rng(7)
    d_, h, w = 8, 13, 17
    vm = r.random((d_, h, w), np.float32) * 4.0
    vm2 = r.random((d_, h, w), np.float32) * 4.0
    # plant exact duplicate minima (calPKR's first-occurrence masking) and
    # zero-cost pixels (the C++ inf/nan division edge)
    vm[2, 3, 4] = vm[5, 3, 4] = vm[:, 3, 4].min() - 1.0
    vm[:, 6, 6] = np.abs(vm[:, 6, 6])
    vm[3, 6, 6] = 0.0
    vm[4, 6, 6] = 0.0
    arms = r.integers(0, 16, (5, h, w)).astype(np.int32)
    arms_int = r.integers(0, 5, (4, d_, h, w)).astype(np.int32)
    return vm, vm2, arms, arms_int


def test_pkr_mask_oracle(vols):
    from mystereomatching_tpu.ops.refine import pkr_mask

    vm, vm2, _, _ = vols
    got = np.asarray(pkr_mask(vm, 0.1))
    want = pkr_mask_oracle(vm, 0.1)
    assert np.array_equal(got, want)


def test_combine2vm_pkr_oracle(vols):
    from mystereomatching_tpu.ops import combine

    vm, vm2, _, _ = vols
    got = np.asarray(combine.combine2vm_pkr(vm, vm2))
    np.testing.assert_allclose(got, combine2vm_oracle(vm, vm2), rtol=1e-6)


def test_combine2vm_arm_limit_oracle(vols):
    from mystereomatching_tpu.ops import combine

    vm, vm2, arms, _ = vols
    got = np.asarray(combine.combine2vm_arm_limit(vm, vm2, arms,
                                                  arm_limit=10))
    np.testing.assert_allclose(got, combine2vm_2_oracle(vm, vm2, arms),
                               rtol=1e-6)


def test_combine2vm_min_oracle(vols):
    from mystereomatching_tpu.ops import combine

    vm, vm2, _, _ = vols
    got = np.asarray(combine.combine2vm_min(vm, vm2))
    np.testing.assert_allclose(got, combine2vm_3_oracle(vm, vm2), rtol=1e-6)


def test_combine2vm_4_oracle(vols):
    from mystereomatching_tpu.ops import combine

    vm, vm2, arms, _ = vols
    # push some arm maxima under the smoothed threshold
    arms = arms.copy()
    arms[:4, 2:6, 9:14] = 1
    got = np.asarray(combine.combine2vm_4(vm, vm2, arms))
    want = combine2vm_4_oracle(vm, vm2, arms)
    assert (want != vm).any(), "mask never fired — test is vacuous"
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("fw_type", [1, 3, 4])
def test_combine_cross_fw_oracle(vols, fw_type):
    from mystereomatching_tpu.ops import combine

    vm, vm2, _, arms_int = vols
    area = (arms_int[:4].sum(0) * 2 + 1).astype(np.int32)
    got = np.asarray(combine.combine_cross_fw(
        vm, vm2, arms_int, fw_type=fw_type, area_is=area))
    want = combine_cross_fw_oracle(vm, vm2, arms_int, fw_type=fw_type,
                                   area_is=area)
    assert (want != vm).any(), "fallback never fired — test is vacuous"
    np.testing.assert_allclose(got, want, rtol=1e-6)


# --------------------------------------------------------------------------
# Double-window CBCA end-to-end + per-aggregation penalty resolution
# --------------------------------------------------------------------------

def test_cbca_double_preset_runs(small_pair):
    import jax

    from mystereomatching_tpu import models
    from mystereomatching_tpu.pipeline import match_pair

    cfg = models.get_model("cbca_double", max_disp=11)
    single = cfg.replace(cbca_double_win=False)
    l, r = small_pair.left, small_pair.right
    out = jax.jit(lambda a, b: match_pair(a, b, cfg=cfg))(l, r)
    out1 = jax.jit(lambda a, b: match_pair(a, b, cfg=single))(l, r)
    d = np.asarray(out["disparity"])
    assert d.shape == l.shape[:2] and np.isfinite(d).all()
    # the merge is gated on small smoothed arms; on a textured synthetic
    # scene at least the RAW volumes must differ even if final disparities
    # often agree
    assert not np.array_equal(np.asarray(out["disp_left_raw"]),
                              np.asarray(out1["disp_left_raw"])) or \
        not np.array_equal(d, np.asarray(out1["disparity"]))


def test_cbca_combine_variants_run(small_pair):
    import jax

    from mystereomatching_tpu import models
    from mystereomatching_tpu.pipeline import match_pair

    l, r = small_pair.left, small_pair.right
    for variant in (1, 2, 3):
        cfg = models.get_model("cbca_double", max_disp=11,
                               cbca_combine=variant, do_refine=False,
                               do_lr_consis=False,
                               compute_both_volumes=False,
                               optimization="wta")
        out = jax.jit(lambda a, b: match_pair(a, b, cfg=cfg))(l, r)
        assert np.isfinite(np.asarray(out["disparity"])).all()


def test_sgm_penalty_resolution():
    """Constructor overrides (cpp:2088-2108): AWS -> 0.5/1.0, CBCA/GF and
    everything else -> 1.0/3.0; explicit values win."""
    from mystereomatching_tpu.config import MatchConfig

    assert MatchConfig(aggregation="cbca").sgm_p1_eff == 1.0
    assert MatchConfig(aggregation="cbca").sgm_p2_eff == 3.0
    assert MatchConfig(aggregation="aws").sgm_p1_eff == 0.5
    assert MatchConfig(aggregation="aws").sgm_p2_eff == 1.0
    assert MatchConfig(aggregation="gfnl").sgm_p1_eff == 1.0
    assert MatchConfig(aggregation="aws", sgm_p1=1.0).sgm_p1_eff == 1.0
    assert MatchConfig(aggregation="aws", sgm_p2=3.0).sgm_p2_eff == 3.0
