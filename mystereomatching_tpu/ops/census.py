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
    """Symmetric census (genSymCensus, h:1174-1208): compares point-reflected
    window pairs, giving ((2rv+1)(2ru+1)-1)/2 ... we emit the full half set."""
    g = gray.astype(jnp.int32)
    pad = jnp.pad(g, ((rv, rv), (ru, ru)), mode="reflect")
    h, w = gray.shape
    bits = []
    offs = _offsets_classic(rv, ru)
    n = len(offs)
    for k in range(n // 2):
        dv, du = offs[k]
        dv2, du2 = offs[n - 1 - k]
        a = lax.dynamic_slice(pad, (rv + dv, ru + du), (h, w))
        b = lax.dynamic_slice(pad, (rv + dv2, ru + du2), (h, w))
        bits.append(a < b)
    return _pack_bits(bits)


def census_code_neighbor(gray: jnp.ndarray, rv: int, ru: int,
                         stride: int = 1) -> jnp.ndarray:
    """Ring/chain-neighbor census (genCensusCode_neighC1/2, h:691-864
    family): each bit compares consecutive window samples in scan order
    (stride 1) or samples two apart (stride 2) instead of against the
    center — robust to center-pixel noise."""
    g = gray.astype(jnp.int32)
    pad = jnp.pad(g, ((rv, rv), (ru, ru)), mode="reflect")
    h, w = gray.shape
    samples = [lax.dynamic_slice(pad, (rv + dv, ru + du), (h, w))
               for dv, du in _offsets_classic(rv, ru)]
    bits = [samples[i] < samples[(i + stride) % len(samples)]
            for i in range(len(samples))]
    return _pack_bits(bits)


def census_code_mean(gray: jnp.ndarray, rv: int, ru: int) -> jnp.ndarray:
    """Mean-census (genCensus, cpp:5309-5351): compare neighbors against the
    window mean instead of the center pixel."""
    g = gray.astype(jnp.float32)
    pad = jnp.pad(g, ((rv, rv), (ru, ru)), mode="reflect")
    h, w = gray.shape
    win = [lax.dynamic_slice(pad, (rv + dv, ru + du), (h, w))
           for dv, du in _offsets_classic(rv, ru)]
    mean = sum(win) / len(win)
    bits = [mean < nb for nb in win]
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
