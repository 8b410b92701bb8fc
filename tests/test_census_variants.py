"""Bit-exact oracle tests for the full census code family.

Each oracle is a direct per-pixel NumPy transcription of the reference
walk: genCensusCode (h:634-688), genCensusCode_neighC1 (h:691-791),
genCensusCode_neighC2 (h:793-864), genSymCensus (h:1174-1208), genCensus
mean-census (cpp:5309-5351). The oracle emits the bit sequence in walk
order; packing goes through the shared ops.census._pack_bits so equality
checks the comparisons AND their order.
"""
import numpy as np


def _reflect_ext(gray, pv, pu):
    """Reflect-101 extension with origin shift: E[v + pv, u + pu] = I[v, u]."""
    return np.pad(gray.astype(np.int64), ((pv, pv), (pu, pu)), mode="reflect")


def oracle_classic_bits(gray, rv, ru):
    h, w = gray.shape
    E = _reflect_ext(gray, rv, ru)
    bits = []
    for dv in range(-rv, rv + 1):
        for du in range(-ru, ru + 1):
            plane = (E[rv: rv + h, ru: ru + w]
                     < E[rv + dv: rv + dv + h, ru + du: ru + du + w])
            bits.append(plane)
    return bits


def oracle_neigh_c1_bits(gray, rv, ru):
    h, w = gray.shape
    pv, pu = 2 * rv, 2 * ru         # remainder row reaches past the rv pad
    E = _reflect_ext(gray, pv, pu)
    bits = []
    loop_num = min(rv, ru)

    def plane(a, b):
        av, au = a
        bv, bu = b
        return (E[pv + av: pv + av + h, pu + au: pu + au + w]
                < E[pv + bv: pv + bv + h, pu + bu: pu + bu + w])

    for i in range(loop_num):
        vpos, upos = -(rv - i), -(ru - i)
        for loop_ in range(4):
            if loop_ % 2 == 0:
                cof = -1 if upos > 0 else 1
                du = upos
                while du != -upos:
                    bits.append(plane((vpos, du), (vpos, du + cof)))
                    du += cof
                upos = -upos
            else:
                cof = -1 if vpos > 0 else 1
                dv = vpos
                while dv != -vpos:
                    bits.append(plane((dv, upos), (dv + cof, upos)))
                    dv += cof
                vpos = -vpos
    # remainder quirk (h:769-784): reads the PADDED image at (v, u+du),
    # i.e. original coords (v-rv, u+du-ru)
    urem = ru - loop_num
    for du in range(-urem, urem):
        bits.append(plane((-rv, du - ru), (-rv, du + 1 - ru)))
    return bits


def oracle_neigh_c2_bits(gray, rv, ru):
    h, w = gray.shape
    E = _reflect_ext(gray, rv, ru)
    bits = []

    def plane(a, b):
        av, au = a
        bv, bu = b
        return (E[rv + av: rv + av + h, ru + au: ru + au + w]
                < E[rv + bv: rv + bv + h, ru + bu: ru + bu + w])

    u_start, u_end, cof = -ru, ru, 1
    for dv in range(-rv, rv + 1):
        u_ = u_start
        while u_ != u_end:
            bits.append(plane((dv, u_), (dv, u_ + cof)))
            u_ += cof
        if dv < rv:
            bits.append(plane((dv, u_end), (dv + 1, u_end)))
        u_start, u_end, cof = u_end, u_start, -cof
    return bits


def oracle_symmetric_bits(gray, rv, ru):
    h, w = gray.shape
    g = gray.astype(np.int64)
    inner = np.zeros((h, w), bool)
    inner[rv: h - rv, ru: w - ru] = True
    bits = []
    for dv in range(-rv, rv + 1):
        for du in range(-ru, ru + 1):
            plane = np.zeros((h, w), bool)
            for v in range(rv, h - rv):
                for u in range(ru, w - ru):
                    plane[v, u] = g[v + dv, u + du] <= g[v - dv, u - du]
            bits.append(plane)
    return bits


def oracle_mean_bits(gray, rv, ru):
    h, w = gray.shape
    E = _reflect_ext(gray, 2 * rv, 2 * ru)
    area = (2 * rv + 1) * (2 * ru + 1)
    bits = None
    mean = np.zeros((h, w), np.int64)
    for v in range(h):
        for u in range(w):
            # shifted window centered at (v+rv, u+ru) (cpp:5329-5335)
            win = E[2 * rv + v: 2 * rv + v + 2 * rv + 1,
                    2 * ru + u: 2 * ru + u + 2 * ru + 1]
            mean[v, u] = int(win.sum()) // area
    E1 = _reflect_ext(gray, rv, ru)
    bits = []
    for dv in range(-rv, rv + 1):
        for du in range(-ru, ru + 1):
            bits.append(mean < E1[rv + dv: rv + dv + h,
                                  ru + du: ru + du + w])
    return bits


def _check(code_fn, oracle_bits):
    import jax.numpy as jnp
    from mystereomatching_tpu.ops.census import _pack_bits

    rng = np.random.default_rng(17)
    gray = rng.integers(0, 256, (16, 21)).astype(np.float32)
    ours = np.asarray(code_fn(jnp.asarray(gray)))
    exp = np.asarray(_pack_bits([jnp.asarray(b) for b in oracle_bits(gray)]))
    np.testing.assert_array_equal(ours, exp)


def test_classic():
    from mystereomatching_tpu.ops.census import census_code_classic
    _check(lambda g: census_code_classic(g, 2, 3),
           lambda x: oracle_classic_bits(x, 2, 3))


def test_neigh_c1():
    from mystereomatching_tpu.ops.census import census_code_neighbor
    _check(lambda g: census_code_neighbor(g, 2, 3, 1),
           lambda x: oracle_neigh_c1_bits(x, 2, 3))


def test_neigh_c1_asymmetric_remainder():
    """rv != ru exercises the remainder-row quirk (3,4 = the default)."""
    from mystereomatching_tpu.ops.census import census_code_neighbor
    _check(lambda g: census_code_neighbor(g, 3, 4, 1),
           lambda x: oracle_neigh_c1_bits(x, 3, 4))


def test_neigh_c2():
    from mystereomatching_tpu.ops.census import census_code_neighbor
    _check(lambda g: census_code_neighbor(g, 2, 3, 2),
           lambda x: oracle_neigh_c2_bits(x, 2, 3))


def test_symmetric():
    from mystereomatching_tpu.ops.census import census_code_symmetric
    _check(lambda g: census_code_symmetric(g, 2, 3),
           lambda x: oracle_symmetric_bits(x, 2, 3))


def test_mean():
    from mystereomatching_tpu.ops.census import census_code_mean
    _check(lambda g: census_code_mean(g, 2, 3),
           lambda x: oracle_mean_bits(x, 2, 3))


def test_code_lengths():
    from mystereomatching_tpu.ops.census import neigh_code_length

    # c1: rings of 4(ru-i)+4(rv-i) bits + 2*(ru-min) remainder
    assert neigh_code_length(2, 3, 1) == sum(
        4 * (3 - i) + 4 * (2 - i) for i in range(2)) + 2 * (3 - 2)
    # c2: 2ru compares per row x (2rv+1) rows + 2rv row hops
    assert neigh_code_length(2, 3, 2) == 6 * 5 + 4
