"""vmTop: top-K candidate extraction + neighbor-supported re-voting.

Re-design of the reference's candidate machinery:
  * ``selectTopCostFromVolumn`` (stereoMatching.h:2405-2461): up to M
    (disparity, cost) candidates per pixel within ``thres`` x best cost —
    here M rounds of masked argmin over the volume (vectorized);
  * ``genDispFromTopCostVm2`` (cpp:1514-1885), method 0: pair-consistency
    "circle" filtering (|d_i - d_j| < ts keeps both) and an 8-neighbor
    candidate vote (count, then total cost, ties to smaller disparity).
    The reference decides pixels in raster order, reading already-decided
    left/up/left-top neighbors (Gauss-Seidel); that carried dependency is
    replaced by ``n_iters`` Jacobi sweeps over the whole image — same
    fixed point on convergence, TPU-parallel;
  * methods 1/2 are exact: their only dependency is d(u-1) along the row,
    a ``lax.scan`` over columns.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from mystereomatching_tpu.config import MatchConfig
from mystereomatching_tpu.ops.refine import _shift2d


def select_top_costs(vol: jnp.ndarray, m: int, thres: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract up to m candidates per pixel (h:2405-2461).

    Returns (disp [m,H,W] int32, cost [m,H,W] f32, count [H,W] int32).
    Candidate k (k>0) only counts when cost_k < cost_0 * thres; slots past
    the break carry the last argmin values but count bounds validity.
    """
    v = vol
    disps = []
    costs = []
    count = jnp.ones(vol.shape[1:], jnp.int32)
    first = None
    alive = jnp.ones(vol.shape[1:], jnp.bool_)
    for k in range(m):
        d = jnp.argmin(v, axis=0)
        c = jnp.min(v, axis=0)
        if k == 0:
            first = c
        else:
            ok = alive & (c < first * thres)
            count = count + ok.astype(jnp.int32)
            alive = ok
        disps.append(d.astype(jnp.int32))
        costs.append(c)
        v = jnp.where(jnp.arange(vol.shape[0])[:, None, None] == d[None],
                      jnp.inf, v)
    return jnp.stack(disps), jnp.stack(costs), count


# 8-neighbor offsets: l,u,r,d,lu,rd,ru,ld (cpp:1532-1534)
_NEIGH = ((0, -1), (-1, 0), (0, 1), (1, 0), (-1, -1), (1, 1), (-1, 1), (1, -1))


def disp_from_top_method0(
    cand_d: jnp.ndarray, cand_c: jnp.ndarray, count: jnp.ndarray,
    cfg: MatchConfig, n_iters: int = 2, v_coords=None,
) -> jnp.ndarray:
    """Method 0 vote (cpp:1518-1781), Jacobi-iterated.

    cand_d/cand_c: [M,H,W]; count: [H,W] number of valid candidates.
    v_coords: optional [H] GLOBAL row indices (the sharded band path runs
    this on a halo-extended band; the first-row keep-candidate-0 rule
    follows the true image row).
    """
    m, h, w = cand_d.shape
    ts = cfg.vmtop_ts
    valid_k = jnp.arange(m)[:, None, None] < count[None]

    # pair-consistency circle (cir2): candidate i is in the container if
    # some other valid candidate j has |d_i - d_j| < ts (cpp:1577-1594)
    in_cont = jnp.zeros((m, h, w), jnp.bool_)
    for i in range(m):
        for j in range(i + 1, m):
            pair_ok = (jnp.abs(cand_d[i] - cand_d[j]) < ts) & valid_k[j] & valid_k[i]
            in_cont = in_cont.at[i].set(in_cont[i] | pair_ok)
            in_cont = in_cont.at[j].set(in_cont[j] | pair_ok)
    any_cont = jnp.any(in_cont, axis=0)

    disp = cand_d[0]
    for _ in range(n_iters):
        # --- case 2: container empty -> candidate closest to a neighbor
        # reference disparity, priority lt > left > up > rt (cpp:1598-1653)
        refs = [
            _shift2d(disp, -1, -1, -10000),     # lt (decided)
            _shift2d(disp, 0, -1, -10000),      # left (decided)
            _shift2d(disp, -1, 0, -10000),      # up (decided)
            _shift2d(disp, -1, 1, -10000),      # rt (decided)
        ]
        best_dif = [jnp.full((h, w), 1 << 30, jnp.int32) for _ in refs]
        best_d = [jnp.full((h, w), -1, jnp.int32) for _ in refs]
        for k in range(m):
            for ri, rdisp in enumerate(refs):
                dif = jnp.abs(cand_d[k] - rdisp)
                better = valid_k[k] & (dif < best_dif[ri])
                best_dif[ri] = jnp.where(better, dif, best_dif[ri])
                best_d[ri] = jnp.where(better, cand_d[k], best_d[ri])
        overall = jnp.minimum(jnp.minimum(best_dif[0], best_dif[1]),
                              jnp.minimum(best_dif[2], best_dif[3]))
        # priority on ties: lt, then left, then up, then rt (cpp:1638-1647)
        case2 = jnp.where(overall == best_dif[0], best_d[0],
                          jnp.where(overall == best_dif[1], best_d[1],
                                    jnp.where(overall == best_dif[2], best_d[2],
                                              best_d[3])))

        # --- case 3: neighbor-supported vote over container disparities
        # own candidates: count 1, cost c (cpp:1661-1670)
        vote_n = jnp.where(in_cont, 1, 0).astype(jnp.int32)      # [M,H,W]
        vote_c = jnp.where(in_cont, cand_c, 0.0)
        for dv, du in _NEIGH:
            for x in range(m):
                nd = _shift2d(cand_d[x], dv, du, -1)
                nc = _shift2d(cand_c[x], dv, du, 0.0)
                n_valid = _shift2d(valid_k[x], dv, du, False)
                for i in range(m):
                    match = in_cont[i] & n_valid & (nd == cand_d[i])
                    vote_n = vote_n.at[i].add(match.astype(jnp.int32))
                    vote_c = vote_c.at[i].add(jnp.where(match, nc, 0.0))
        # winner: max count, tie -> min total cost, tie -> smaller disp
        # (map iteration order cpp:1748-1765)
        order_key = (vote_n.astype(jnp.float32) * 1e6
                     - vote_c / (1.0 + vote_c) - cand_d.astype(jnp.float32) * 1e-3)
        kbest = jnp.argmax(jnp.where(in_cont, order_key, -jnp.inf), axis=0)
        case3 = jnp.take_along_axis(cand_d, kbest[None], 0)[0]

        multi = count > 1
        new_disp = jnp.where(multi, jnp.where(any_cont, case3, case2), cand_d[0])
        # first row/col keep candidate 0 (cpp:1541)
        vv = (jnp.arange(h) if v_coords is None else v_coords)[:, None]
        uu = jnp.arange(w)[None, :]
        disp = jnp.where((vv == 0) | (uu == 0), cand_d[0], new_disp)
    return disp


def disp_from_top_method1(cand_d: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Method 1 (cpp:1786-1817): along each row, pick the candidate within
    |d - d(u-1)| < 2 closest to the previous decision; else candidate 0.
    Exact via lax.scan over columns."""
    m, h, w = cand_d.shape
    cd = jnp.moveaxis(cand_d, 2, 0)        # [W, M, H]
    cnt = count.T                          # [W, H]

    def step(prev, inp):
        cands, n = inp                     # [M,H], [H]
        best_s = jnp.full((h,), 10000, jnp.int32)
        best_d = jnp.full((h,), -1, jnp.int32)
        for k in range(m):
            s = jnp.abs(prev - cands[k])
            ok = (k < n) & (s < 2) & (s < best_s)
            best_s = jnp.where(ok, s, best_s)
            best_d = jnp.where(ok, cands[k], best_d)
        out = jnp.where((n == 1) | (best_d < 0), cands[0], best_d)
        return out, out

    first = cd[0, 0]
    _, rest = lax.scan(step, first, (cd[1:], cnt[1:]))
    return jnp.concatenate([first[None], rest], 0).T


def disp_from_top_method2(cand_d: jnp.ndarray, count: jnp.ndarray,
                          left_image: jnp.ndarray) -> jnp.ndarray:
    """Method 2 (cpp:1819-1883): along each row pick
      d0 = candidate closest to the previous DECISION d(u-1)  (|dif| < 2),
      d1 = candidate closest to the NEXT pixel's top-1 candidate (|dif| < 2,
           u < w-1 only);
    one of each found -> that one; neither -> candidate 0; both -> whichever
    side is more color-similar (sum-abs RGB diff left vs right neighbor,
    ties to the left/d0). d1 and the color key don't depend on decisions, so
    they vectorize; only the d0 recurrence rides the lax.scan."""
    m, h, w = cand_d.shape
    valid_k = jnp.arange(m)[:, None, None] < count[None]

    # d1 per pixel (vectorized): closest candidate to cand0 at u+1
    nxt = jnp.concatenate([cand_d[0, :, 1:], jnp.full((h, 1), -10000,
                                                      cand_d.dtype)], axis=1)
    dif1 = jnp.where(valid_k, jnp.abs(cand_d - nxt[None]), 10000)
    k1 = jnp.argmin(dif1, axis=0)                    # first min wins ties
    d1_val = jnp.take_along_axis(cand_d, k1[None], 0)[0]
    d1_ok = (jnp.take_along_axis(dif1, k1[None], 0)[0] < 2) & \
        (jnp.arange(w)[None, :] < w - 1)

    # color keys: prefer d0 when sum|c(u)-c(u-1)| <= sum|c(u)-c(u+1)|
    img = left_image.astype(jnp.int32)
    cl = jnp.sum(jnp.abs(img[:, 1:] - img[:, :-1]), axis=-1)
    cdif_pre = jnp.concatenate([jnp.zeros((h, 1), jnp.int32), cl], axis=1)
    cdif_aft = jnp.concatenate([cl, jnp.zeros((h, 1), jnp.int32)], axis=1)
    prefer_d0 = cdif_pre <= cdif_aft

    cd = jnp.moveaxis(cand_d, 2, 0)                  # [W, M, H]
    vk = jnp.moveaxis(valid_k, 2, 0)                 # [W, M, H]

    def step(prev, inp):
        cands, vkc, d1v, d1ok, pref, n = inp
        dif0 = jnp.where(vkc, jnp.abs(cands - prev[None]), 10000)
        kk = jnp.argmin(dif0, axis=0)
        d0v = jnp.take_along_axis(cands, kk[None], 0)[0]
        d0ok = jnp.take_along_axis(dif0, kk[None], 0)[0] < 2
        pick = jnp.where(
            d0ok & ~d1ok, d0v,
            jnp.where(~d0ok & d1ok, d1v,
                      jnp.where(d0ok & d1ok,
                                jnp.where(pref, d0v, d1v), cands[0])))
        out = jnp.where(n == 1, cands[0], pick)
        return out, out

    first = cd[0, 0]
    _, rest = lax.scan(step, first, (cd[1:], vk[1:], d1_val.T[1:],
                                     d1_ok.T[1:], prefer_d0.T[1:],
                                     count.T[1:]))
    return jnp.concatenate([first[None], rest], 0).T


def disp_from_top(vol: jnp.ndarray, left_image: jnp.ndarray, cfg: MatchConfig,
                  method: int = 0) -> jnp.ndarray:
    """Full vmTop decision (dispOptimize cpp:1112-1126)."""
    cand_d, cand_c, count = select_top_costs(vol, max(cfg.vmtop_num, 2),
                                             cfg.vmtop_thres)
    if method == 0:
        return disp_from_top_method0(cand_d, cand_c, count, cfg)
    if method == 1:
        return disp_from_top_method1(cand_d, count)
    if method == 2:
        return disp_from_top_method2(cand_d, count, left_image)
    raise ValueError(f"vmTop method {method} not supported")
