"""Census transform family: bit-packed codes + popcount Hamming volumes.

TPU-native re-design of the reference census kernels
(stereoMatching.h:566-1208, cpp:807-892): comparisons are vectorized over
the whole image (71 shifted compares for the default 7x9+surround code),
packed into uint32 lanes, and the Hamming cost volume uses
``jax.lax.population_count`` on XORed words — the vector equivalent of
``__popcnt64`` (cpp:4-10, 2210-2211).

Bit semantics (genCensusCode_NC_Sur, h:867-934, the default censusFunc=3):
  * window compares: for dv in [-Rv,Rv], du in [-Ru,Ru] (row-major, center
    included and always 0): bit = center < neighbor,
  * 8 surround-ring pair compares on ring offsets
    dv = [-1,-1,-1,0,1,1,1,0,-1], du = [-1,0,1,1,1,0,-1,-1,-1]:
    bit = I[p+s_i] < I[p+s_{i+1}],
  * image border: reflect-101 padding (copyMakeBorder BORDER_REFLECT_101).

Word packing differs from the reference's uint64[2] (uint32 lanes here) but
Hamming distances are identical since the bit multiset is the same.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from mystereomatching_tpu.ops.volume import shifted_stack, valid_mask

_SUR_DV = (-1, -1, -1, 0, 1, 1, 1, 0, -1)
_SUR_DU = (-1, 0, 1, 1, 1, 0, -1, -1, -1)


def _offsets_classic(rv: int, ru: int):
    return [(dv, du) for dv in range(-rv, rv + 1) for du in range(-ru, ru + 1)]


def census_code_ncsur(gray: jnp.ndarray, rv: int = 3, ru: int = 4) -> jnp.ndarray:
    """Default census code (censusFunc=3): classic window + 8 surround pairs.

    gray: [H, W] uint8/float. Returns [n_words, H, W] uint32 packed codes;
    code length = (2rv+1)(2ru+1) + 8.
    """
    return _pack_bits(_census_bits_ncsur(gray, rv, ru))


def census_code_classic(gray: jnp.ndarray, rv: int, ru: int) -> jnp.ndarray:
    """Classic window-compare census (genCensusCode, h:634-688)."""
    return _pack_bits(_window_bits(gray, rv, ru))


def census_code_symmetric(gray: jnp.ndarray, rv: int, ru: int) -> jnp.ndarray:
    """Symmetric census (genSymCensus, h:1174-1208): over the FULL window,
    bit = I(p+o) <= I(p-o) (point-reflected pair, non-strict; the center
    bit is constantly 1). No padding — pixels within the rv/ru border band
    keep an all-zero code (the reference memsets and skips them)."""
    g = gray.astype(jnp.int32)
    pad = jnp.pad(g, ((rv, rv), (ru, ru)), mode="reflect")
    h, w = gray.shape
    bits = []
    for dv, du in _offsets_classic(rv, ru):
        a = lax.dynamic_slice(pad, (rv + dv, ru + du), (h, w))
        b = lax.dynamic_slice(pad, (rv - dv, ru - du), (h, w))
        bits.append(a <= b)
    code = _pack_bits(bits)
    v = jnp.arange(h, dtype=jnp.int32)[:, None]
    u = jnp.arange(w, dtype=jnp.int32)[None, :]
    inner = (v >= rv) & (v < h - rv) & (u >= ru) & (u < w - ru)
    return jnp.where(inner[None], code, jnp.uint32(0))


def _neigh_c1_pairs(rv: int, ru: int):
    """Bit pair-offset walk of genCensusCode_neighC1 (h:691-791): clockwise
    ring walks comparing consecutive ring pixels, rings min(rv,ru) deep,
    then a horizontal remainder row. The remainder indexes the padded image
    without re-adding the (rv, ru) offset (h:769-784) — i.e. it compares
    pixels on row -rv at columns du-ru, a reference quirk kept verbatim
    (its u+du = -1 out-of-buffer read at the left edge is sanitized to the
    reflect-101 extension)."""
    pairs = []
    loop_num = min(rv, ru)
    for i in range(loop_num):
        vpos, upos = -(rv - i), -(ru - i)
        for loop_ in range(4):
            if loop_ % 2 == 0:
                cof = -1 if upos > 0 else 1
                du = upos
                while du != -upos:
                    pairs.append(((vpos, du), (vpos, du + cof)))
                    du += cof
                upos = -upos
            else:
                cof = -1 if vpos > 0 else 1
                dv = vpos
                while dv != -vpos:
                    pairs.append(((dv, upos), (dv + cof, upos)))
                    dv += cof
                vpos = -vpos
    urem = ru - loop_num
    for du in range(-urem, urem):
        pairs.append(((-rv, du - ru), (-rv, du + 1 - ru)))
    return pairs


def _neigh_c2_pairs(rv: int, ru: int):
    """Bit pair-offset walk of genCensusCode_neighC2 (h:793-864): serpentine
    scan of the window comparing consecutive samples along the path,
    including the vertical hop between rows."""
    pairs = []
    u_start, u_end = -ru, ru
    cof = 1
    for dv in range(-rv, rv + 1):
        u_ = u_start
        while u_ != u_end:
            pairs.append(((dv, u_), (dv, u_ + cof)))
            u_ += cof
        if dv < rv:
            pairs.append(((dv, u_end), (dv + 1, u_end)))
        u_start, u_end, cof = u_end, u_start, -cof
    return pairs


def _pair_code(gray: jnp.ndarray, pairs) -> jnp.ndarray:
    """bit = I(p+a) < I(p+b) for each (a, b) offset pair, reflect-101
    extended as far as the offsets reach."""
    g = gray.astype(jnp.int32)
    pv = max(max(abs(a[0]), abs(b[0])) for a, b in pairs)
    pu = max(max(abs(a[1]), abs(b[1])) for a, b in pairs)
    pad = jnp.pad(g, ((pv, pv), (pu, pu)), mode="reflect")
    h, w = gray.shape
    bits = []
    for (av, au), (bv, bu) in pairs:
        a = lax.dynamic_slice(pad, (pv + av, pu + au), (h, w))
        b = lax.dynamic_slice(pad, (pv + bv, pu + bu), (h, w))
        bits.append(a < b)
    return _pack_bits(bits)


def census_code_neighbor(gray: jnp.ndarray, rv: int, ru: int,
                         variant: int = 1) -> jnp.ndarray:
    """Neighbor-compare census: variant 1 = ring walk (neighC1), variant
    2 = serpentine (neighC2). Each bit compares consecutive walk pixels
    instead of against the center — robust to center-pixel noise."""
    pairs = _neigh_c1_pairs(rv, ru) if variant == 1 else _neigh_c2_pairs(rv, ru)
    return _pair_code(gray, pairs)


def neigh_code_length(rv: int, ru: int, variant: int) -> int:
    pairs = _neigh_c1_pairs(rv, ru) if variant == 1 else _neigh_c2_pairs(rv, ru)
    return len(pairs)


def census_code_mean(gray: jnp.ndarray, rv: int, ru: int) -> jnp.ndarray:
    """Mean-census (genCensus, cpp:5309-5351): compare neighbors (reflect-101
    window) against the INTEGER-floored window mean. The reference computes
    the mean over the window centered at (v+rv, u+ru) of the UNPADDED image
    — a down-right-shifted window whose bottom/right edges read out of
    bounds; we keep the shift and sanitize the reads to the reflect-101
    extension. The mean then truncates uchar-ward twice (int division
    sum/area, then the float->uchar assignment, cpp:5334-5336)."""
    g = gray.astype(jnp.int32)
    h, w = gray.shape
    # shifted-window mean: pad enough for offsets up to 2rv/2ru
    pad2 = jnp.pad(g, ((2 * rv, 2 * rv), (2 * ru, 2 * ru)), mode="reflect")
    ssum = jnp.zeros((h, w), jnp.int32)
    for dv in range(-rv, rv + 1):
        for du in range(-ru, ru + 1):
            ssum = ssum + lax.dynamic_slice(
                pad2, (2 * rv + rv + dv, 2 * ru + ru + du), (h, w))
    area = (2 * rv + 1) * (2 * ru + 1)
    mean = ssum // area                                  # C++ int division
    pad = jnp.pad(g, ((rv, rv), (ru, ru)), mode="reflect")
    bits = []
    for dv, du in _offsets_classic(rv, ru):
        nb = lax.dynamic_slice(pad, (rv + dv, ru + du), (h, w))
        bits.append(mean < nb)
    return _pack_bits(bits)


def _window_bits(gray, rv, ru):
    g = gray.astype(jnp.int32)
    pad = jnp.pad(g, ((rv, rv), (ru, ru)), mode="reflect")
    h, w = gray.shape
    bits = []
    for dv, du in _offsets_classic(rv, ru):
        nb = lax.dynamic_slice(pad, (rv + dv, ru + du), (h, w))
        bits.append(g < nb)
    return bits


def _census_bits_ncsur(gray, rv, ru):
    bits = _window_bits(gray, rv, ru)
    g = gray.astype(jnp.int32)
    pad = jnp.pad(g, ((rv, rv), (ru, ru)), mode="reflect")
    h, w = gray.shape
    for i in range(8):
        a = lax.dynamic_slice(pad, (rv + _SUR_DV[i], ru + _SUR_DU[i]), (h, w))
        b = lax.dynamic_slice(pad, (rv + _SUR_DV[i + 1], ru + _SUR_DU[i + 1]), (h, w))
        bits.append(a < b)
    return bits


def census_code_qx80(rgb: jnp.ndarray) -> jnp.ndarray:
    """The NL path's 80-bit census code (my_matching_cost_from_cencus,
    NL/qx_nonlocal_cost_aggregation.cpp:110-189): 9x9 window minus center,
    bit = center > neighbor, and — its signature quirk — WRAPAROUND border
    indexing ((y+wy+h)%h / (x+wx+w)%w), which maps directly onto jnp.roll.

    Gray conversion reproduces the reference's channel-order bug: imread
    gives BGR, cvtMatQX copies bytes verbatim, then cvtColor(CV_RGB2GRAY)
    applies the R weight to the B channel. With RGB input here that means
    gray = (9798*B + 19235*G + 3735*R + 2^14) >> 15 (OpenCV's 15-bit fixed
    point — verified bit-exact against cvtColor on the refbuild scenes).
    rgb: [H,W,3] RGB. Returns [3, H, W] uint32 (80 bits packed).
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    gray = (9798 * b + 19235 * g + 3735 * r + (1 << 14)) >> 15
    bits = [gray > jnp.roll(gray, (-wy, -wx), (0, 1))
            for wy in range(-4, 5) for wx in range(-4, 5)
            if not (wy == 0 and wx == 0)]
    return _pack_bits(bits)


def _pack_bits(bits) -> jnp.ndarray:
    """Pack a list of [H,W] bool planes into [n_words, H, W] uint32."""
    n = len(bits)
    n_words = -(-n // 32)
    words = []
    for wi in range(n_words):
        chunk = bits[wi * 32: (wi + 1) * 32]
        acc = jnp.zeros(bits[0].shape, jnp.uint32)
        for pos, b in enumerate(chunk):
            acc = acc | (b.astype(jnp.uint32) << np.uint32(pos))
        words.append(acc)
    return jnp.stack(words)


def hamming_volume(
    code_left: jnp.ndarray,
    code_right: jnp.ndarray,
    num_disp: int,
    lor: int,
    code_length: int,
    trunc_ratio: float = 1.0,
    normalize: bool = False,
    disps: jnp.ndarray = None,
) -> jnp.ndarray:
    """Census cost volume via XOR + popcount (gen_cenVM_XOR, h:936-981).

    codes: [n_words, H, W] uint32. Returns [D, H, W] float32:
    cost = min(hamming, code_length*trunc_ratio); invalid entries (matching
    pixel off-image) take the norm value (h:944: DEFAULT if un-normalized,
    1.0 if normalized).
    """
    ref, other = (code_left, code_right) if lor == 0 else (code_right, code_left)
    sh = shifted_stack(other, num_disp, lor, disps)     # [D, n_words, H, W]
    x = ref[None] ^ sh
    ham = jnp.sum(lax.population_count(x), axis=1).astype(jnp.float32)
    default = code_length * trunc_ratio
    cost = jnp.minimum(ham, default)
    if normalize:
        cost = cost / default
        fill = 1.0
    else:
        fill = default
    mask = valid_mask(code_left.shape[-1], num_disp, lor, disps)
    return jnp.where(mask, cost, jnp.asarray(fill, cost.dtype))


def ncsur_code_length(rv: int, ru: int) -> int:
    return (2 * rv + 1) * (2 * ru + 1) + 8
