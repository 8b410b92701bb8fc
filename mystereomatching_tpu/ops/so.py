"""Scanline optimization (SO): 1-D Viterbi DP with backtracking.

Re-design of the reference ``so`` (stereoMatching.cpp:6272-6416): the
per-row left-to-right DP becomes a ``lax.scan`` over columns carrying the
accumulated [H, D] cost plane and emitting the argmin-choice trace; the
sequential backtrace becomes a reverse ``lax.scan`` of gathers.

Transitions per pixel (cpp:6355-6385, priority order d, d-1, d+1, global):
    cost(u,d) = C(u,d) + min(A(u-1,d), A(u-1,d-1)+Pn2, A(u-1,d+1)+Pn2,
                             min_d' A(u-1,d') + Pn3)
with Pn2=1.2, Pn3=3.6 halved where the mean-channel |dI| between u and u-1
of the LEFT image exceeds 15 (cpp:6287-6296; the reference uses I[0] for
both views' volumes). Variants: so_T2D scans columns top-to-bottom
(cpp:6580-6681), so_R2L scans right-to-left (cpp:6683-6828).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mystereomatching_tpu.config import MatchConfig


def _so_core(vol: jnp.ndarray, disc: jnp.ndarray, pn2: float, pn3: float):
    """Forward DP + backtrace along the LAST axis of vol [D, H, W].

    disc: [H, W] bool discontinuity flags (halve penalties). Returns
    int32 [H, W] disparities.
    """
    d_, h, w = vol.shape
    vol_t = jnp.moveaxis(vol, 2, 0)          # [W, D, H]
    disc_t = disc.T[:, None, :]              # [W, 1, H]
    big = jnp.float32(3.4e38)

    ds = jnp.arange(d_, dtype=jnp.int32)[:, None]

    def step(carry, inp):
        acc = carry                          # [D, H] accumulated cost
        c, dsc = inp                         # [D,H], [1,H]
        scale = jnp.where(dsc, 0.5, 1.0)
        p2 = pn2 * scale
        p3 = pn3 * scale
        minv = jnp.min(acc, axis=0, keepdims=True)
        mind = jnp.argmin(acc, axis=0).astype(jnp.int32)[None]  # first min
        c_minus = jnp.concatenate([jnp.full((1, h), big), acc[:-1]], 0) + p2
        c_plus = jnp.concatenate([acc[1:], jnp.full((1, h), big)], 0) + p2
        c_glob = minv + p3

        # priority chain with strict < (cpp:6368-6385)
        cost = acc
        dmin = jnp.broadcast_to(ds, (d_, h))
        upd = c_minus < cost
        cost = jnp.where(upd, c_minus, cost)
        dmin = jnp.where(upd, ds - 1, dmin)
        upd = c_plus < cost
        cost = jnp.where(upd, c_plus, cost)
        dmin = jnp.where(upd, ds + 1, dmin)
        upd = c_glob < cost
        cost = jnp.where(upd, c_glob, cost)
        dmin = jnp.where(upd, jnp.broadcast_to(mind, (d_, h)), dmin)

        new_acc = c + cost
        return new_acc, (new_acc, dmin)

    init = vol_t[0]                          # column 0: vm unchanged (u starts at 1)
    acc_last, (accs, traces) = lax.scan(step, init, (vol_t[1:], disc_t[1:]))
    # traces[i] = choice made at column i+1, [W-1, D, H]

    d_last = jnp.argmin(acc_last, axis=0).astype(jnp.int32)   # [H]

    def back(carry, tr):
        d_cur = carry                        # [H]
        d_prev = jnp.take_along_axis(tr, d_cur[None], axis=0)[0]
        return d_prev, d_cur

    d_first, ds_rev = lax.scan(back, d_last, traces, reverse=True)
    disp = jnp.concatenate([d_first[None], ds_rev], 0)        # [W, H]
    return disp.T.astype(jnp.int32)


def scanline_optimize_change(vol: jnp.ndarray, image: jnp.ndarray,
                             ref_disp: jnp.ndarray, cfg: MatchConfig) -> jnp.ndarray:
    """so_change (cpp:6419-6578): adds d+-2 transitions (penalty 2, NOT
    halved at discontinuities — the reference's `Pn2_ / 2;` statement has
    no effect, a quirk we preserve) and jumps to the previous pixel's
    disparity in a reference map (+Pn3) instead of the global minimum.

    ref_disp: [H, W] int32 prior disparity (the reference reads the DP
    buffer's prior content; pass a WTA map).
    """
    d_, h, w = vol.shape
    img = image.astype(jnp.float32)
    disc = jnp.mean(jnp.abs(img - jnp.roll(img, 1, 1)), -1) > cfg.so_dif_thres

    vol_t = jnp.moveaxis(vol, 2, 0)          # [W, D, H]
    disc_t = disc.T[:, None, :]              # [W, 1, H]
    ref_t = jnp.clip(ref_disp, 0, d_ - 1).T  # [W, H]
    big = jnp.float32(3.4e38)
    pn2, pn3, pn2b = cfg.so_pn2, cfg.so_pn3, 2.0
    ds = jnp.arange(d_, dtype=jnp.int32)[:, None]

    def shift_d(a, k):
        pad = jnp.full((abs(k), h), big)
        return (jnp.concatenate([pad, a[:-k]], 0) if k > 0
                else jnp.concatenate([a[-k:], pad], 0))

    def step(acc, inp):
        c, dsc, rd = inp
        scale = jnp.where(dsc, 0.5, 1.0)
        ref_cost = jnp.take_along_axis(acc, rd[None], 0) + pn3 * scale
        cands = [
            (acc, ds),
            (shift_d(acc, 1) + pn2 * scale, ds - 1),
            (shift_d(acc, -1) + pn2 * scale, ds + 1),
            (jnp.broadcast_to(ref_cost, acc.shape), jnp.broadcast_to(rd[None], (d_, h))),
            (shift_d(acc, 2) + pn2b, ds - 2),
            (shift_d(acc, -2) + pn2b, ds + 2),
        ]
        cost = cands[0][0]
        dmin = jnp.broadcast_to(ds, (d_, h))
        for cc, dd in cands[1:]:
            upd = cc < cost
            cost = jnp.where(upd, cc, cost)
            dmin = jnp.where(upd, jnp.broadcast_to(dd, (d_, h)), dmin)
        new_acc = c + cost
        return new_acc, (new_acc, dmin)

    init = vol_t[0]
    acc_last, (accs, traces) = lax.scan(
        step, init, (vol_t[1:], disc_t[1:], ref_t[:-1]))
    d_last = jnp.argmin(acc_last, axis=0).astype(jnp.int32)

    def back(carry, tr):
        d_cur = carry
        d_prev = jnp.take_along_axis(tr, d_cur[None], axis=0)[0]
        return d_prev, d_cur

    d_first, ds_rev = lax.scan(back, d_last, traces, reverse=True)
    return jnp.concatenate([d_first[None], ds_rev], 0).T.astype(jnp.int32)


def scanline_optimize(vol: jnp.ndarray, image: jnp.ndarray, cfg: MatchConfig,
                      mode: str = "l2r") -> jnp.ndarray:
    """SO disparity map. vol: [D,H,W]; image: left color image [H,W,3].

    mode: 'l2r' (so), 'r2l' (so_R2L), 't2b' (so_T2D).
    """
    img = image.astype(jnp.float32)
    if mode == "t2b":
        volx = jnp.swapaxes(vol, 1, 2)
        imgx = jnp.swapaxes(img, 0, 1)
        disc = jnp.mean(jnp.abs(imgx - jnp.roll(imgx, 1, 1)), -1) > cfg.so_dif_thres
        return _so_core(volx, disc, cfg.so_pn2, cfg.so_pn3).T
    if mode == "r2l":
        volx = vol[:, :, ::-1]
        imgx = img[:, ::-1]
        disc = jnp.mean(jnp.abs(imgx - jnp.roll(imgx, 1, 1)), -1) > cfg.so_dif_thres
        return _so_core(volx, disc, cfg.so_pn2, cfg.so_pn3)[:, ::-1]
    disc = jnp.mean(jnp.abs(img - jnp.roll(img, 1, 1)), -1) > cfg.so_dif_thres
    return _so_core(vol, disc, cfg.so_pn2, cfg.so_pn3)
