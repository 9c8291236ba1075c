"""Wideband MUSIC DOA estimation tests."""

import math

import numpy as np

from beamforming_lk_tpu.config import ArrayConfig, DspConfig, MimoConfig
from beamforming_lk_tpu.io import ring_init  # noqa: F401  (parity with siblings)
from beamforming_lk_tpu.io.synthetic import plane_wave_block
from beamforming_lk_tpu.models import music as mu
from beamforming_lk_tpu.models import mimo as mm
from beamforming_lk_tpu.ops import antenna as ant
from beamforming_lk_tpu.ops.geometry import spherical_angle

ACFG = ArrayConfig()
DCFG = DspConfig()


def _run_music(sources, n_blocks=12, n_sources=3, grid=24):
    pts = ant.create_antenna_grid(8, 8, 0.02)
    mimo = MimoConfig(rows=grid, columns=grid, fov_degrees=120.0)
    theta, phi = mm.make_mimo_grid(mimo)
    step, n_bins = mu.make_music_step(
        pts, theta, phi, ACFG, n_sources=n_sources
    )
    assert n_bins > 0
    state = step.init()
    pseudo = None
    for b in range(n_blocks):
        block = plane_wave_block(
            pts, sources, b * DCFG.block_size, DCFG.block_size, ACFG,
            noise_std=0.02,
        )
        state, pseudo = step(state, np.asarray(block))
    return np.asarray(pseudo), theta, phi


def _peak_errors(pseudo, theta, phi, sources, top=2):
    order = np.argsort(pseudo)[::-1]
    errs = []
    for s_theta, s_phi, _f in sources:
        best = min(
            math.degrees(
                float(spherical_angle(float(theta[k]), float(phi[k]), s_theta, s_phi))
            )
            for k in order[: top * 12]
        )
        errs.append(best)
    return errs


def test_music_resolves_two_sources():
    sources = [
        (math.radians(20.0), math.radians(45.0), 4000.0),
        (math.radians(35.0), math.radians(200.0), 6500.0),
    ]
    pseudo, theta, phi = _run_music(sources)
    assert np.all(np.isfinite(pseudo)) and pseudo.max() > 0
    errs = _peak_errors(pseudo, theta, phi, sources)
    assert max(errs) < 8.0, errs


def test_music_pseudo_spectrum_is_peaky():
    sources = [(math.radians(25.0), math.radians(90.0), 5000.0)]
    pseudo, theta, phi = _run_music(sources, n_sources=2)
    k = pseudo.argmax()
    d = math.degrees(
        float(spherical_angle(float(theta[k]), float(phi[k]), *sources[0][:2]))
    )
    assert d < 6.0, d
    # Subspace pseudo-spectrum: peak towers over the median (the exact
    # ratio depends on grid sampling — the true maximum falls between
    # pixels — and the EMA-warmed covariance).
    assert pseudo.max() / np.median(pseudo) > 15.0


def test_music_rejects_bad_model_order():
    pts = ant.create_antenna_grid(8, 8, 0.02)
    mimo = MimoConfig(rows=8, columns=8)
    theta, phi = mm.make_mimo_grid(mimo)
    import pytest

    with pytest.raises(ValueError):
        mu.make_music_step(pts, theta, phi, ACFG, n_sources=0)
    with pytest.raises(ValueError):
        mu.make_music_step(pts, theta, phi, ACFG, n_sources=64)


def test_music_pipeline_mode():
    from beamforming_lk_tpu.app import AwpuPipeline
    from beamforming_lk_tpu.config import Config

    cfg = Config(mimo=MimoConfig(rows=8, columns=8))
    pipe = AwpuPipeline(
        cfg, enable_tracker=False, enable_miso=False, heatmap_mode="music"
    )
    pts = pipe.points
    for b in range(4):
        block = plane_wave_block(
            pts, [(0.4, 1.0, 5000.0)], b * cfg.dsp.block_size,
            cfg.dsp.block_size, cfg.array, noise_std=0.02,
        )
        pipe.process_block(block)
    hm = pipe.heatmap()
    assert hm.shape == (8, 8) and hm.max() == 255


def test_music_subspace_solver_matches_eigh():
    """The default warm-started subspace solver converges to the exact
    eigh pseudo-spectrum once the carried basis has tracked a few blocks
    (models/music.py module docstring — the deployment path vs the truth
    path)."""
    import jax.numpy as jnp

    pts = ant.create_antenna_grid(8, 8, 0.02)
    mimo = MimoConfig(rows=16, columns=16, fov_degrees=120.0)
    theta, phi = mm.make_mimo_grid(mimo)
    sources = [
        (math.radians(20.0), math.radians(45.0), 4000.0),
        (math.radians(35.0), math.radians(200.0), 6500.0),
    ]
    step_sub, n_bins = mu.make_music_step(
        pts, theta, phi, ACFG, n_sources=2, solver="subspace"
    )
    step_eig, _ = mu.make_music_step(
        pts, theta, phi, ACFG, n_sources=2, solver="eigh"
    )
    s_sub, s_eig = step_sub.init(), step_eig.init()
    p_sub = p_eig = None
    for b in range(10):
        block = jnp.asarray(plane_wave_block(
            pts, sources, b * DCFG.block_size, DCFG.block_size, ACFG,
            noise_std=0.02,
        ))
        s_sub, p_sub = step_sub(s_sub, block)
        s_eig, p_eig = step_eig(s_eig, block)
    p_sub, p_eig = np.asarray(p_sub), np.asarray(p_eig)
    # Same covariance trajectory (the solvers differ only in decomposition).
    np.testing.assert_allclose(
        np.asarray(s_sub.cov_re), np.asarray(s_eig.cov_re), rtol=1e-5,
        atol=1e-8,
    )
    # Same peaks, highly correlated spectra.
    assert p_sub.argmax() == p_eig.argmax()
    corr = np.corrcoef(p_sub, p_eig)[0, 1]
    assert corr > 0.99, corr
    # And the tracked basis is orthonormal.
    q = np.asarray(s_sub.basis)
    gram = np.einsum("fak,fal->fkl", q, q)
    np.testing.assert_allclose(
        gram, np.broadcast_to(np.eye(q.shape[-1]), gram.shape), atol=1e-5
    )


import pytest


@pytest.mark.parametrize("solver", ["subspace", "eigh"])
def test_bin_sharded_music_matches_dense(solver):
    """Bins sharded over the mesh (make_sharded_music_step): the sharded
    pseudo-spectrum — per-bin covariance EMA and tracked basis resident on
    their shards, SNR weights and spectrum psum'd — matches the
    single-device path, for both solvers."""
    import jax.numpy as jnp
    from beamforming_lk_tpu.models.music import make_sharded_music_step
    from beamforming_lk_tpu.parallel import mesh as pm

    src = (0.5, 1.2, 4000.0)
    pts = ant.create_antenna_grid()
    theta, phi = mm.make_mimo_grid(MimoConfig(rows=12, columns=12))

    dense_step, _ = mu.make_music_step(
        pts, theta, phi, ACFG, n_sources=2, solver=solver
    )
    dense_state = dense_step.init()

    mesh = pm.make_mesh((1, 8))
    sh_step, sh_state = make_sharded_music_step(
        pts, theta, phi, mesh, n_sources=2, solver=solver
    )

    for b in range(5):
        block = jnp.asarray(plane_wave_block(
            pts, [src], b * 256, 256, ACFG, noise_std=0.05
        ))
        dense_state, dense_p = dense_step(dense_state, block)
        sh_state, sh_p = sh_step(sh_state, block)

    a = np.asarray(dense_p, np.float64)
    b = np.asarray(sh_p, np.float64)
    np.testing.assert_allclose(b, a, rtol=5e-4)
    assert int(np.argmax(a)) == int(np.argmax(b))


def test_subspace_solver_tracks_moving_source():
    """The warm-started basis must TRACK a moving source, not just match
    eigh on a static one: sweep a source across ~20 deg of azimuth and
    require the subspace pseudo-spectrum's peak error to stay within a
    fraction of a degree of the exact eigh solver's on every block (both
    lag the motion identically through the shared covariance EMA — the
    solver must not ADD lag), and both to settle within a few degrees
    once the EMA transient has washed out."""
    import jax.numpy as jnp

    pts = ant.create_antenna_grid(8, 8, 0.02)
    mimo = MimoConfig(rows=24, columns=24, fov_degrees=120.0)
    theta, phi = mm.make_mimo_grid(mimo)
    step_s, _ = mu.make_music_step(pts, theta, phi, ACFG, n_sources=2,
                                   solver="subspace")
    step_e, _ = mu.make_music_step(pts, theta, phi, ACFG, n_sources=2,
                                   solver="eigh")
    st_s, st_e = step_s.init(), step_e.init()
    err_s, err_e = [], []
    for b in range(24):
        src_th = 0.42
        src_ph = 1.0 + 0.015 * b          # ~0.86 deg/block azimuth sweep
        block = jnp.asarray(plane_wave_block(
            pts, [(src_th, src_ph, 5000.0)], b * DCFG.block_size,
            DCFG.block_size, ACFG, noise_std=0.03,
        ))
        st_s, p_s = step_s(st_s, block)
        st_e, p_e = step_e(st_e, block)
        for p, errs in ((p_s, err_s), (p_e, err_e)):
            k = int(np.asarray(p).argmax())
            errs.append(math.degrees(float(spherical_angle(
                float(theta[k]), float(phi[k]), src_th, src_ph))))
    # Solver adds no lag on top of the EMA's.
    deltas = [abs(a - b) for a, b in zip(err_s, err_e)]
    assert max(deltas) < 0.5, deltas
    # And both settle once the EMA transient has washed out (the steady
    # ~2-5 deg is the covariance EMA trailing the 0.86 deg/block sweep —
    # alpha=0.1 averages ~10 blocks of motion — identical for both
    # solvers per the delta assertion above).
    assert max(err_s[12:]) < 6.0, err_s
