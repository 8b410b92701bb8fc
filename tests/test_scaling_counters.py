"""Empirical communication counters (VERDICT r2 item 8).

The sharded program's shapes are static, so tracing it records the ACTUAL
halo payloads, wavefront step counts, and all_gather sizes the multi-chip
program would execute — pinning the scaling model's constants to the code
instead of hand arithmetic. Tracing via ``jit(...).lower`` costs no
execution time.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.sharding


def _cfg(**kw):
    from mystereomatching_tpu.config import default_config

    base = dict(max_disp=7, census_rv=2, census_ru=3,
                cbca_cross_l=3, cbca_cross_l_out=5, cbca_iterations=2,
                pi_search_depth=4, rv_s_thres=4)
    base.update(kw)
    return default_config(**base)


def _record(cfg, n_row=4, n_chunks=4, h=96, w=64):
    import functools

    import jax
    import jax.numpy as jnp

    from mystereomatching_tpu.parallel.counters import record_comm
    from mystereomatching_tpu.parallel.mesh import make_mesh
    from mystereomatching_tpu.parallel.sharded import sharded_match_pair

    mesh = make_mesh(n_row=n_row, n_data=1)
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    fn = functools.partial(sharded_match_pair, cfg=cfg, mesh=mesh,
                           n_chunks=n_chunks)
    with record_comm() as rec:
        jax.jit(fn).lower(left, left)      # trace only — no execution
    return rec


def test_wavefront_steps_and_counts():
    """Each vertical scan executes exactly C + P - 1 steps; 4-dir SGM has
    2 wavefront scans per volume, 8-dir has 6 (2 vertical + 4 diagonal)."""
    n_row, n_chunks = 4, 4
    rec = _record(_cfg(), n_row=n_row, n_chunks=n_chunks)
    waves = rec.wavefront_events()
    assert len(waves) == 2 * 2            # 2 volumes x 2 vertical scans
    for e in waves:
        assert e["steps"] == n_chunks + n_row - 1

    rec8 = _record(_cfg(sgm_scan_num=8), n_row=n_row, n_chunks=n_chunks)
    assert len(rec8.wavefront_events()) == 2 * 6


def test_halo_bytes_arithmetic():
    """Recorded halo payloads equal the closed-form: 2*halo rows of the
    exchanged slab, per exchange."""
    from mystereomatching_tpu.parallel.sharded import _cost_halo

    cfg = _cfg()
    h, w, n_row = 96, 64, 4
    rec = _record(cfg, n_row=n_row, h=h, w=w)
    halos = rec.halo_events()
    assert halos, "no halo exchanges recorded"
    halo = _cost_halo(cfg)
    # first two exchanges: the left/right image slabs [h/P, W, 3] f32
    img_bytes = 2 * halo * w * 3 * 4
    assert halos[0]["bytes"] == img_bytes
    assert halos[1]["bytes"] == img_bytes
    # refine-stage disparity halos: [h/P, W] int32 rows
    hr = cfg.arm_l_out
    rv_bytes = 2 * hr * w * 4
    rv_events = [e for e in halos if e["bytes"] == rv_bytes]
    assert len(rv_events) >= cfg.region_vote_iters
    assert rec.total_bytes() > 0


def test_counters_written_by_scaling_model():
    """scripts/scaling_model.py embeds the empirical counters; its
    projection must use the recorded totals, not hand arithmetic."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scaling_model", os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "scaling_model.py"))
    sm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sm)
    cfg = sm.default_config(max_disp=7, census_rv=2, census_ru=3,
                            cbca_cross_l=3, cbca_cross_l_out=5,
                            pi_search_depth=4, rv_s_thres=4)
    counters = sm.empirical_counters(cfg, h=96, w=64, n_row=4, n_chunks=4)
    assert counters["halo_bytes"] > 0
    assert counters["wavefront_scans"] == 4
    assert all(s == 4 + 4 - 1 for s in counters["wavefront_steps"])
