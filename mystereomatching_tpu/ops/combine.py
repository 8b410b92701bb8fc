"""Volume combiners & double-window CBCA fusions.

Vectorized equivalents of the reference's combiner family (SURVEY.md §2.2
"Volume combiners" / §2.3 "Double-window CBCA & fusions"):

  * gen_vm_from2vm_add / fixWgt / exp / exp3 — in ops/cost.py;
  * gen_vm_from2vm_expadpWgt (cpp:3696-3724): arm-length-adaptive
    exponential blend a = 1 - exp(-k/shortestArm);
  * cross2Vm (h:2597-2614): elementwise min; fuse_2vm (h:2577-2595):
    weighted sum;
  * combine2Vm (cpp:4142-4170): PKR-masked 0.3/0.7 blend;
  * combine2Vm_2 (cpp:4173-4228): arm-limit-masked blend;
  * combine2Vm_3 (cpp:4231-4278): min-cost selection between volumes;
  * combine_Cross_FW (cpp:5803-5862): fixed-window fallback where the
    intersected cross support is too small (type 4 default: arm-sum and
    per-axis arm thresholds, optional cost-compare);
  * combine_hv_tilt (cpp:3994-4085): choose HV- vs tilted-aggregated
    volume per pixel by total arm length (compareArmL cpp:6912-6923).
"""

from __future__ import annotations

import jax.numpy as jnp

from mystereomatching_tpu.ops.refine import pkr_mask


def exp_adaptive_fuse(vm0: jnp.ndarray, vm1: jnp.ndarray, arms: jnp.ndarray,
                      lam0: float, lam1: float, k: float = 0.5) -> jnp.ndarray:
    """gen_vm_from2vm_expadpWgt (cpp:3696-3724): per-pixel blend weight
    a = 1 - exp(-k / shortestArm); out = a(1-e^{-vm0/l0}) + (1-a)(1-e^{-vm1/l1})."""
    shortest = jnp.maximum(jnp.min(arms[:4], axis=0), 1).astype(jnp.float32)
    a = (1.0 - jnp.exp(-k / shortest))[None]
    return a * (1.0 - jnp.exp(-vm0 / lam0)) + (1.0 - a) * (1.0 - jnp.exp(-vm1 / lam1))


def min_combine(vm0: jnp.ndarray, vm1: jnp.ndarray) -> jnp.ndarray:
    """cross2Vm (h:2597-2614): elementwise min of two volumes."""
    return jnp.minimum(vm0, vm1)


def weighted_combine(vm0: jnp.ndarray, w0: float, vm1: jnp.ndarray,
                     w1: float) -> jnp.ndarray:
    """fuse_2vm (h:2577-2595)."""
    return w0 * vm0 + w1 * vm1


def combine2vm_pkr(vm: jnp.ndarray, vm2: jnp.ndarray,
                   pkr_thresh: float = 0.1,
                   w: float = 0.3) -> jnp.ndarray:
    """combine2Vm (cpp:4142-4170): where the peak ratio marks ambiguity,
    blend vm*0.3 + vm2*0.7."""
    mask = pkr_mask(vm, pkr_thresh)[None]
    return jnp.where(mask, vm * w + vm2 * (1.0 - w), vm)


def combine2vm_arm_limit(vm: jnp.ndarray, vm2: jnp.ndarray, arms: jnp.ndarray,
                         arm_limit: int = 10, w: float = 0.3) -> jnp.ndarray:
    """combine2Vm_2 (cpp:4173-4228): blend where ALL four arms <= limit."""
    small = jnp.all(arms[:4] <= arm_limit, axis=0)[None]
    return jnp.where(small, vm * w + vm2 * (1.0 - w), vm)


def combine2vm_min(vm: jnp.ndarray, vm2: jnp.ndarray,
                   dis_thres: float = 0.0, w: float = 0.3) -> jnp.ndarray:
    """combine2Vm_3 (cpp:4217-4271): per-PIXEL min-cost test, not an
    elementwise min. Where min_d vm2 < min_d vm and the relative
    improvement (min_vm - min_vm2)/min_vm exceeds disThres (=0), blend
    the whole D-vector 0.3*vm + 0.7*vm2 (cpp:4261); else keep vm.
    The C++ float division yields +inf when min_vm == 0, so a strict
    improvement always triggers the blend there too."""
    c0 = jnp.min(vm, axis=0)
    c1 = jnp.min(vm2, axis=0)
    take = (c1 < c0) & ((c0 - c1) / c0 > dis_thres)
    return jnp.where(take[None], w * vm + (1.0 - w) * vm2, vm)


def combine2vm_4(vm: jnp.ndarray, vm2: jnp.ndarray,
                 arms_left: jnp.ndarray,
                 arm_thres: float = 5.0) -> jnp.ndarray:
    """combine2Vm_4 (cpp:4273-4331), the active double-window merge
    (cpp:4354): per pixel take the LONGEST of the LEFT image's four
    small-window arms (HVL[0] — the second calArms call in CBCA()
    overwrote HVL with the window-0 arms before this runs), smooth the
    max-arm map with a normalized 3x3 boxFilter (BORDER_REFLECT_101),
    and wherever the smoothed value < 5 replace the D-vector entirely
    with vm2 (the active line is ``vm*0 + vm2*1``, cpp:4322 — the 0.3/0.7
    blend above it is commented out). The same left-derived mask is
    applied to BOTH images' volumes (the n-loop reuses arm_Lst).

    arms_left: [>=4, H, W] non-intersected arm lengths of the LEFT image
    at the small window."""
    arm_lst = jnp.max(arms_left[:4], axis=0).astype(vm.dtype)
    p = jnp.pad(arm_lst, 1, mode="reflect")      # == cv BORDER_REFLECT_101
    sm = sum(p[i:i + arm_lst.shape[0], j:j + arm_lst.shape[1]]
             for i in range(3) for j in range(3)) / 9.0
    take = sm < arm_thres
    return jnp.where(take[None], vm2, vm)


def combine_cross_fw(
    vm_cross: jnp.ndarray,
    vm_fw: jnp.ndarray,
    arms_int: jnp.ndarray,
    fw_type: int = 4,
    arm_len_limit: int = 12,
    arm_l_sum: int = 8,
    arm_l_single: int = 6,
    cost_compare: bool = True,
    area_is=None,
) -> jnp.ndarray:
    """Fixed-window fallback for tiny supports (combine_Cross_FW
    cpp:5803-5862). arms_int: [4,D,H,W] intersected arms.

    type 1: per-disparity intersected arm sum (slot 4, cpp:5826) <
    arm_len_limit -> take FW;
    type 3: aggregated intersected support AREA (areaIS, cpp:5832) < 5 ->
    take FW (pass ``area_is`` [D,H,W]);
    type 4 (default, cobineCrossFWType=4 h:291): arm sum < arm_l_sum AND
    both per-axis sums < arm_l_single -> min(cross, FW) when
    cost_compare (cpp:5847) else FW.
    """
    arm_sum = jnp.sum(arms_int[:4], axis=0)
    if fw_type == 1:
        take = arm_sum < arm_len_limit
        return jnp.where(take, vm_fw, vm_cross)
    if fw_type == 3:
        if area_is is None:
            raise ValueError("combine_Cross_FW type 3 needs area_is "
                             "(the aggregated intersected support area)")
        take = area_is < 5
        return jnp.where(take, vm_fw, vm_cross)
    if fw_type == 4:
        arm_h = arms_int[0] + arms_int[1]
        arm_v = arms_int[2] + arms_int[3]
        take = (arm_sum < arm_l_sum) & (arm_h < arm_l_single) & (arm_v < arm_l_single)
        fw = jnp.minimum(vm_cross, vm_fw) if cost_compare else vm_fw
        return jnp.where(take, fw, vm_cross)
    raise ValueError(f"unknown combine_Cross_FW type {fw_type}")


def combine_hv_tilt(vm_hv: jnp.ndarray, vm_tilt: jnp.ndarray,
                    arms_hv: jnp.ndarray, arms_tilt: jnp.ndarray) -> jnp.ndarray:
    """combine_HV_Tilt (cpp:3994-4085) with compareArmL (cpp:6912-6923):
    per pixel take the HV-aggregated volume where the HV arm total exceeds
    the tilted arm total, else the tilted one."""
    len_hv = jnp.sum(arms_hv[:4], axis=0)
    len_tilt = jnp.sum(arms_tilt[:4], axis=0)
    return jnp.where((len_hv > len_tilt)[None], vm_hv, vm_tilt)
