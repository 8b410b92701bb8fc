"""Slow NumPy oracles transcribed from the reference semantics (SURVEY.md).

These are direct per-pixel-loop implementations of the behaviors documented
in SURVEY.md §2 (with stereoMatching.cpp/h line citations), used to verify
the vectorized TPU kernels on tiny images. They are deliberately naive.
"""

from __future__ import annotations

import numpy as np


def reflect101(i: int, n: int) -> int:
    if n == 1:
        return 0
    period = 2 * (n - 1)
    i = abs(i) % period
    return period - i if i >= n else i


# --- AD (gen_ad_sd_vm cpp:2468-2509) ---------------------------------------

def ad_volume(left, right, num_disp, lor, trunc=1e9, squared=False):
    h, w, c = left.shape
    out = np.empty((num_disp, h, w), np.float32)
    for v in range(h):
        for u in range(w):
            for d in range(num_disp):
                ul = u + (d if lor == 1 else 0)
                ur = u - (d if lor == 0 else 0)
                if ul >= w or ur < 0:
                    out[d, v, u] = trunc
                else:
                    s = 0.0
                    for ch in range(c):
                        dif = abs(float(left[v, ul, ch]) - float(right[v, ur, ch]))
                        s += dif * dif if squared else dif
                    out[d, v, u] = min(s / c, trunc)
    return out


# --- census NC_Sur (genCensusCode_NC_Sur h:867-934) ------------------------

_SUR_DV = (-1, -1, -1, 0, 1, 1, 1, 0, -1)
_SUR_DU = (-1, 0, 1, 1, 1, 0, -1, -1, -1)


def census_bits_ncsur(gray, rv, ru):
    """Bit list (stream order) per pixel: [H, W, nbits] bool."""
    h, w = gray.shape
    g = gray.astype(np.int32)
    nbits = (2 * rv + 1) * (2 * ru + 1) + 8
    bits = np.zeros((h, w, nbits), bool)
    for v in range(h):
        for u in range(w):
            k = 0
            c = g[reflect101(v, h), reflect101(u, w)]
            for dv in range(-rv, rv + 1):
                for du in range(-ru, ru + 1):
                    nb = g[reflect101(v + dv, h), reflect101(u + du, w)]
                    bits[v, u, k] = c < nb
                    k += 1
            for i in range(8):
                a = g[reflect101(v + _SUR_DV[i], h), reflect101(u + _SUR_DU[i], w)]
                b = g[reflect101(v + _SUR_DV[i + 1], h), reflect101(u + _SUR_DU[i + 1], w)]
                bits[v, u, k] = a < b
                k += 1
    return bits


def census_hamming_volume(bits_l, bits_r, num_disp, lor, code_length,
                          trunc_ratio=1.0, normalize=False):
    """gen_cenVM_XOR (h:936-981)."""
    h, w, _ = bits_l.shape
    default = code_length * trunc_ratio
    fill = 1.0 if normalize else default
    out = np.empty((num_disp, h, w), np.float32)
    for v in range(h):
        for u in range(w):
            for d in range(num_disp):
                ul = u + (d if lor == 1 else 0)
                ur = u - (d if lor == 0 else 0)
                if ul >= w or ur < 0:
                    out[d, v, u] = fill
                else:
                    ham = np.sum(bits_l[v, ul] != bits_r[v, ur])
                    c = min(float(ham), default)
                    out[d, v, u] = c / default if normalize else c
    return out


# --- cross arms (calHorVerDis cpp:2959-3100) -------------------------------

def cross_arms(img, l_in, l_out, c_in, c_out, min_arm):
    h, w, _ = img.shape
    I = img.astype(np.float32)
    dirs = [(0, -1), (0, 1), (-1, 0), (1, 0)]
    out = np.zeros((4, h, w), np.int32)
    for di, (dv, du) in enumerate(dirs):
        for v in range(h):
            for u in range(w):
                arm = 0
                for k in range(1, l_out + 1):
                    vv, uu = v + k * dv, u + k * du
                    if not (0 <= vv < h and 0 <= uu < w):
                        break
                    pv, pu = v + (k - 1) * dv, u + (k - 1) * du
                    if np.max(np.abs(I[vv, uu] - I[pv, pu])) > c_in:
                        break
                    thresh = c_in if k <= l_in else c_out
                    if np.max(np.abs(I[vv, uu] - I[v, u])) > thresh:
                        break
                    arm = k
                if arm < min_arm:
                    for ln in range(min_arm, -1, -1):
                        vv, uu = v + ln * dv, u + ln * du
                        if 0 <= vv < h and 0 <= uu < w:
                            arm = ln
                            break
                out[di, v, u] = arm
    return out


# --- CBCA (cbca_core cpp:5585-5666, intersect mode) ------------------------

def intersect_arms(arms_l, arms_r, num_disp, lor):
    _, h, w = arms_l.shape
    out = np.zeros((4, num_disp, h, w), np.int32)
    for v in range(h):
        for u in range(w):
            for d in range(num_disp):
                ul = u + (d if lor == 1 else 0)
                ur = u - (d if lor == 0 else 0)
                if ur < 0 or ul >= w:
                    continue
                for k in range(4):
                    out[k, d, v, u] = min(arms_l[k, v, ul], arms_r[k, v, ur])
    return out


def cbca(vol, arms_int, iterations=2):
    d_, h, w = vol.shape
    vol = vol.copy()
    for it in range(iterations):
        area = np.ones_like(vol)
        order = [("h",), ("v",)] if it % 2 == 0 else [("v",), ("h",)]
        for (ax,) in order:
            nv = np.zeros_like(vol)
            na = np.zeros_like(vol)
            for d in range(d_):
                for v in range(h):
                    for u in range(w):
                        if ax == "h":
                            lo = u - arms_int[0, d, v, u]
                            hi = u + arms_int[1, d, v, u]
                            nv[d, v, u] = vol[d, v, lo:hi + 1].sum()
                            na[d, v, u] = area[d, v, lo:hi + 1].sum()
                        else:
                            lo = v - arms_int[2, d, v, u]
                            hi = v + arms_int[3, d, v, u]
                            nv[d, v, u] = vol[d, lo:hi + 1, u].sum()
                            na[d, v, u] = area[d, lo:hi + 1, u].sum()
            vol, area = nv, na
        vol = vol / np.maximum(area, 1.0)
    return vol


# --- SGM (updateCost h:2205-2280, costScan cpp:1983-2029) ------------------

def sgm_direction(vol, image, rv, ru, p1=1.0, p2=3.0, thres=15, coeff=4.0):
    d_, h, w = vol.shape
    L = np.zeros_like(vol)
    img = image.astype(np.float32)
    # scan order: reverse raster when rv>0 or (rv==0 and ru>0) (cpp:1991-1995)
    vs = range(h - 1, -1, -1) if (rv > 0 or (rv == 0 and ru > 0)) else range(h)
    us = range(w - 1, -1, -1) if (rv > 0 or (rv == 0 and ru > 0)) else range(w)
    for v in vs:
        for u in us:
            pv, pu = v + rv, u + ru
            if not (0 <= pv < h and 0 <= pu < w):
                L[:, v, u] = vol[:, v, u]
                continue
            d1 = np.max(np.abs(img[v, u] - img[pv, pu]))
            scale = 1.0 / coeff if d1 > thres else 1.0
            p1s, p2s = p1 * scale, p2 * scale
            lp = L[:, pv, pu]
            minl = lp.min()
            for d in range(d_):
                s1 = lp[d]
                s2 = lp[d - 1] + p1s if d - 1 >= 0 else np.inf
                s3 = lp[d + 1] + p1s if d + 1 < d_ else np.inf
                s4 = minl + p2s
                L[d, v, u] = vol[d, v, u] + min(s1, s2, s3, s4) - minl
    return L


def sgm(vol, image, num_dirs=4, **kw):
    dirs = [(1, 0), (-1, 0), (0, 1), (0, -1),
            (1, -1), (1, 1), (-1, 1), (-1, -1)][:num_dirs]
    return sum(sgm_direction(vol, image, rv, ru, **kw) for rv, ru in dirs)


# --- LRC (cpp:2262-2282) ---------------------------------------------------

def lr_consistency(d1, d2, max_diff=0):
    h, w = d1.shape
    out = d1.copy()
    for v in range(h):
        for u in range(w):
            d = d1[v, u]
            if d < 0 or u - d < 0 or abs(d - d2[v, u - d]) > max_diff:
                out[v, u] = -1
    return out


# --- region vote (regionVote_my cpp:7219-7277) -----------------------------

def region_vote(disp, arms, num_disp, s_thres=20, int_quirk=True, ratio=0.4):
    h, w = disp.shape
    out = disp.copy()
    for v in range(h):
        for u in range(w):
            if disp[v, u] >= 0:
                continue
            hist = np.zeros(num_disp, np.int64)
            valid = 0
            for vn in range(v - arms[2, v, u], v + arms[3, v, u] + 1):
                for un in range(u - arms[0, vn, u], u + arms[1, vn, u] + 1):
                    dv = disp[vn, un]
                    if dv >= 0:
                        valid += 1
                        hist[dv] += 1
            if valid <= s_thres:
                continue
            dm = int(np.argmax(hist))
            if int_quirk:
                ok = (hist[dm] // valid) >= 1 if ratio > 0 else True
            else:
                ok = hist[dm] / valid >= ratio
            if ok:
                out[v, u] = dm
    return out


# --- proper interpolation (properIpol cpp:7395-7490) -----------------------

def proper_interpolation(disp, image, search_depth=20, disp_occ=-32):
    dirs_w = [0, 2, 2, 2, 0, -2, -2, -2, 1, 2, 2, 1, -1, -2, -2, -1]
    dirs_h = [2, 2, 0, -2, -2, -2, 0, 2, 2, 1, -1, -2, -2, -1, 1, 2]
    h, w = disp.shape
    img = image.astype(np.float32)
    out = disp.copy()

    def cdiv2(x):
        return int(x / 2)

    for v in range(h):
        for u in range(w):
            if disp[v, u] >= 0:
                continue
            dd = [-1] * 16
            dc = [-1.0] * 16
            for k in range(16):
                ph, pw = dirs_h[k], dirs_w[k]
                pv, pu = v, u
                for dep in range(search_depth):
                    if dep % 2 == 0:
                        pv += cdiv2(ph)
                        pu += cdiv2(pw)
                    else:
                        pv += ph - cdiv2(ph)
                        pu += pw - cdiv2(pw)
                    if not (0 <= pv < h and 0 <= pu < w):
                        break
                    if disp[pv, pu] >= 0:
                        dd[k] = disp[pv, pu]
                        dc[k] = np.max(np.abs(img[v, u] - img[pv, pu]))
                        break
            if disp[v, u] == disp_occ:
                cands = [x for x in dd if x >= 0]
                if cands:
                    out[v, u] = min(cands)
            else:
                best_c, best_d = 255.0, -1
                for k in range(16):
                    if dc[k] >= 0 and dc[k] < best_c:
                        best_c = dc[k]
                        best_d = dd[k]
                if best_d >= 0:
                    out[v, u] = best_d
    return out
