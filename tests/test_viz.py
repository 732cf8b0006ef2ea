"""Visualization smoke tests: every plot function renders and saves."""

import os

import numpy as np

from nfdpf_tpu import viz


def test_all_plots_render(tmp_path):
    rng = np.random.default_rng(0)
    b, t, n = 2, 6, 16
    images = rng.uniform(size=(t, 128, 128, 3)).astype(np.float32)
    particles = rng.normal(size=(t, n, 2)).astype(np.float32) * 30
    weights = rng.dirichlet(np.ones(n), size=t).astype(np.float32)
    state = rng.normal(size=(t, 4)).astype(np.float32) * 30
    pred = state[:, :2] + 1.0

    figs = viz.plot_obs_tracking(images, particles, weights, state, pred,
                                 str(tmp_path / "track"), steps=[0, 3])
    assert len(figs) == 2
    assert os.path.exists(tmp_path / "track" / "tracking_step_000.png")

    # default = every timestep; 4-D particles/truth/pred get velocity
    # quivers (`plot.py:35-62` parity)
    particles4 = rng.normal(size=(t, n, 4)).astype(np.float32) * 30
    figs = viz.plot_obs_tracking(images, particles4, weights, state,
                                 state + 1.0, str(tmp_path / "track4"))
    assert len(figs) == t
    assert os.path.exists(tmp_path / "track4" / f"tracking_step_{t-1:03d}.png")

    viz.plot_state_tracking(state, pred, str(tmp_path / "traj.png"))
    assert os.path.exists(tmp_path / "traj.png")

    viz.plot_ess_tracking(np.stack([weights] * b), str(tmp_path / "ess.png"))
    assert os.path.exists(tmp_path / "ess.png")

    viz.plot_motion_model(particles[0], particles[1], state[0],
                          str(tmp_path / "motion.png"))
    assert os.path.exists(tmp_path / "motion.png")

    imgs_bt = rng.uniform(size=(b, t, 64, 64, 3)).astype(np.float32)
    viz.plot_obs(imgs_bt, imgs_bt, str(tmp_path / "recon.png"), steps=(0, 3))
    assert os.path.exists(tmp_path / "recon.png")
