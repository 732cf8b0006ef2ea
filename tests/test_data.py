"""Simulator + dataset pipeline tests, incl. cv2 cross-check of the renderer
and an exact dynamics check against the reference formulas."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfdpf_tpu.data.dataset import DiskDataset, iterate_batches
from nfdpf_tpu.data.simulator import (
    DiskSimulator,
    generate_dataset,
    process_model,
    render_frame,
)


def test_process_model_matches_reference_formula():
    """`create_dataset.py:197-216`: Euler step with spring 0.1, drag 0.0075."""
    state = jnp.array([10.0, -5.0, 3.0, -2.0])
    noise = jnp.array([0.5, -0.5])
    new = np.asarray(process_model(state, noise))
    expect = np.array([
        10.0 + 3.0 + 0.5,
        -5.0 + (-2.0) - 0.5,
        3.0 + (-0.1 * 10.0) + (-0.0075 * 9.0 * 1.0),
        -2.0 + (-0.1 * -5.0) + (-0.0075 * 4.0 * -1.0),
    ])
    np.testing.assert_allclose(new, expect, rtol=1e-6)


def test_render_frame_red_disk_and_occlusion():
    state = jnp.array([0.0, 0.0, 0.0, 0.0])     # center of the image
    d_states = jnp.array([[0.0, 0.0, 0.0, 0.0]])  # distractor right on top
    d_radii = jnp.array([5.0])
    d_colors = jnp.array([[0.0, 255.0, 0.0]])
    im, vis = render_frame(state, d_states, d_radii, d_colors)
    im = np.asarray(im).astype(np.float32) / 255.0
    assert im.shape == (128, 128, 3)
    # center pixel is green (distractor occludes red, painted after)
    np.testing.assert_allclose(im[64, 64], [0.0, 1.0, 0.0])
    # red ring visible outside distractor radius but inside 7
    assert np.allclose(im[64, 64 + 6], [1.0, 0.0, 0.0])
    # visibility counts only exactly-red pixels
    red_count = np.sum(
        (im[..., 0] == 1.0) & (im[..., 1] == 0.0) & (im[..., 2] == 0.0)
    )
    assert int(vis) == red_count > 0


def test_render_matches_cv2():
    """Pixel-level cross-check against cv2.circle (the reference renderer).

    cv2's rasterisation of small circles differs slightly at boundaries from
    the exact dist<=r mask, so allow a small mismatched-pixel budget.
    """
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for trial in range(3):
        state = rng.uniform(-40, 40, size=4)
        d_state = rng.uniform(-40, 40, size=(3, 4))
        d_radii = rng.integers(3, 10, size=3).astype(float)
        cols_pal = np.array([[0, 255, 0], [0, 0, 255], [255, 255, 0]], float)

        im_ref = np.zeros((128, 128, 3))
        cv2.circle(im_ref, (int(state[0] + 64), int(state[1] + 64)), radius=7,
                   color=[255, 0, 0], thickness=-1)
        for i in range(3):
            cv2.circle(im_ref, (int(d_state[i, 0] + 64), int(d_state[i, 1] + 64)),
                       radius=int(d_radii[i]), color=cols_pal[i].tolist(),
                       thickness=-1)
        im_ref = im_ref.astype(np.float32) / 255.0

        im_jax, _ = render_frame(
            jnp.asarray(state), jnp.asarray(d_state), jnp.asarray(d_radii),
            jnp.asarray(cols_pal)
        )
        im_jax = np.asarray(im_jax).astype(np.float32) / 255.0
        mismatch = np.mean(np.any(im_jax != im_ref, axis=-1))
        assert mismatch < 0.01, f"trial {trial}: {mismatch:.4f} pixels differ"


def test_generate_sequence_shapes():
    sim = DiskSimulator(sequence_length=5, num_distractors=3)
    rec = sim.generate_sequence(jax.random.PRNGKey(0))
    assert rec["start_image"].shape == (128, 128, 3)
    assert rec["start_state"].shape == (4,)
    assert rec["image"].shape == (5, 128, 128, 3)
    assert rec["state"].shape == (5, 4)
    assert rec["q"].shape == (5, 4)
    assert rec["visible"].shape == (5,)
    np.testing.assert_allclose(np.asarray(rec["q"][0]), [2.0, 2.0, 2.0, 2.0])


def test_generate_dataset_and_loader_roundtrip(tmp_path):
    out = str(tmp_path / "disks")
    generate_dataset(out, num_examples=8, file_size=10, num_distractors=2,
                     pos_noise=2.0, sequence_length=3, seed=0)
    ds = DiskDataset(out, "toy_pn=2.0_d=2_const", "train_data")
    assert len(ds) == 8
    item = ds[0]
    assert item[0].shape == (128, 128, 3)     # start_image
    assert item[2].shape == (3, 128, 128, 3)  # image
    batches = list(iterate_batches(ds, batch_size=4, seed=1))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 3, 128, 128, 3)
    assert batches[0]["state"].shape == (4, 3, 4)
    # val/test shards exist too
    DiskDataset(out, "toy_pn=2.0_d=2_const", "val_data")
    DiskDataset(out, "toy_pn=2.0_d=2_const", "test_data")
