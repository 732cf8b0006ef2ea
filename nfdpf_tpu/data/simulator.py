"""Disk-tracking simulator: red disk + colored distractors on a 128² canvas.

TPU-native counterpart of `/root/reference/data/disk/create_dataset.py` with
the SAME dynamics, observation semantics, and npz layout — but rasterised
with a fully vectorised distance-mask painter (``lax.scan`` over disks in
z-order, ``vmap`` over time/sequences) instead of per-frame ``cv2.circle``
calls.  The whole sequence generator jit-compiles, so datasets can be
generated on the TPU itself at wire speed; no cv2 dependency.

Dynamics (`create_dataset.py:197-216`):
    pos'  = pos + vel + N(0, pos_noise²)
    vel'  = vel − 0.1·pos − 0.0075·vel²·sign(vel)
(spring 0.1, quadratic drag 0.0075, velocity noise 0; q = [σp, σp, 2, 2]).

Observation (`create_dataset.py:173-195`): red disk radius 7 drawn first,
then N distractors (radius ∈ {3..9}, one of 6 colors) over it, at integer
(truncated) centers; visibility = count of exactly-red pixels; image scaled
to [0, 1] float32, layout HWC (RGB).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SPRING_FORCE = 0.1
DRAG_FORCE = 0.0075
# NOTE: constants stay numpy (host) — device-resident jnp constants get
# fetched back during MLIR lowering to be embedded, which over a remote-chip
# tunnel can stall compilation for minutes per constant.
RED = np.array([255.0, 0.0, 0.0], np.float32)
# distractor palette (`create_dataset.py:22-23`) — RGB (the reference stores
# BGR-ish tuples straight into an RGB-interpreted array; we mirror values).
DISTRACTOR_COLORS = np.array([
    [0.0, 255.0, 0.0],
    [0.0, 0.0, 255.0],
    [0.0, 255.0, 255.0],
    [255.0, 0.0, 255.0],
    [255.0, 255.0, 0.0],
    [255.0, 255.0, 255.0],
], np.float32)


def process_model(state: Array, noise: Array) -> Array:
    """One Euler step of the spring+drag dynamics (`create_dataset.py:197-216`).

    state: (..., 4) = [x, y, vx, vy]; noise: (..., 2) position noise.
    """
    pos, vel = state[..., :2], state[..., 2:]
    pull = -SPRING_FORCE * pos
    drag = -DRAG_FORCE * vel**2 * jnp.sign(vel)
    new_pos = pos + vel + noise
    new_vel = vel + pull + drag
    return jnp.concatenate([new_pos, new_vel], axis=-1)


def render_frame(
    state: Array,              # (4,) red-disk state
    distractor_states: Array,  # (K, 4)
    distractor_radii: Array,   # (K,)
    distractor_colors: Array,  # (K, 3)
    im_size: int = 128,
) -> Tuple[Array, Array]:
    """Rasterise one frame by scanning disks in z-order (red first).

    Returns (image [H, W, 3] uint8 in 0..255, visible red-pixel count).

    Storage/transfer deviation from the reference (which stores float32 in
    [0, 1], `create_dataset.py:193`): images are kept uint8 end-to-end and
    divided by 255 on DEVICE (`train.py`), which is lossless (disk colors
    are exact multiples of 255) and cuts host→device bandwidth 4×.  The
    dataset loader still accepts reference-generated float32 shards.
    """
    half = im_size // 2
    rows = jnp.arange(im_size, dtype=jnp.float32)[:, None]
    cols = jnp.arange(im_size, dtype=jnp.float32)[None, :]

    centers = jnp.concatenate(
        [state[None, :2], distractor_states[:, :2]], axis=0
    )
    # integer truncation like cv2.circle's int() centers (`create_dataset.py:177`)
    centers = jnp.trunc(centers + half)
    radii = jnp.concatenate([jnp.array([7.0]), distractor_radii.astype(jnp.float32)])
    colors = jnp.concatenate([RED[None], distractor_colors], axis=0)

    def paint(canvas, disk):
        center, radius, color = disk
        cx, cy = center[0], center[1]              # cx = column, cy = row
        dist2 = (cols - cx) ** 2 + (rows - cy) ** 2
        mask = (dist2 <= radius**2)[..., None]
        return jnp.where(mask, color, canvas), None

    canvas = jnp.zeros((im_size, im_size, 3))
    canvas, _ = jax.lax.scan(paint, canvas, (centers, radii, colors))

    red_mask = (
        (canvas[..., 0] == 255.0)
        & (canvas[..., 1] == 0.0)
        & (canvas[..., 2] == 0.0)
    )
    vis = jnp.sum(red_mask.astype(jnp.int32))
    return canvas.astype(jnp.uint8), vis


@dataclass(frozen=True)
class DiskSimulator:
    """Sequence generator (`ToyExample`, `create_dataset.py:9-216`)."""

    im_size: int = 128
    sequence_length: int = 50
    num_distractors: int = 25
    pos_noise: float = 2.0

    def generate_sequence(self, key: jax.Array) -> Dict[str, Array]:
        """One (start_image, start_state, image, state, q, visible) record
        (`create_dataset.py:120-171`)."""
        half = self.im_size // 2
        k = jax.random.split(key, 6)
        t, nd = self.sequence_length, self.num_distractors

        pos0 = jax.random.uniform(k[0], (2,), minval=-half, maxval=half)
        vel0 = jax.random.normal(k[1], (2,)) * 3.0
        red0 = jnp.concatenate([pos0, vel0])

        d_pos0 = jax.random.uniform(k[2], (nd, 2), minval=-half, maxval=half)
        d_vel0 = jax.random.normal(k[3], (nd, 2)) * 3.0
        d_state0 = jnp.concatenate([d_pos0, d_vel0], axis=-1)
        d_radii = jax.random.randint(k[4], (nd,), 3, 10).astype(jnp.float32)
        d_colidx = jax.random.randint(k[5], (nd,), 0, DISTRACTOR_COLORS.shape[0])
        # palette lookup as one-hot matmul: keeps the palette a host-side
        # numpy constant (embedded directly into the program, no device
        # round-trip at lowering)
        d_colors = jax.nn.one_hot(d_colidx, DISTRACTOR_COLORS.shape[0]) @ DISTRACTOR_COLORS

        start_image, _ = render_frame(red0, d_state0, d_radii, d_colors,
                                      self.im_size)

        def step(carry, key_t):
            red, dstates = carry
            kr, kd = jax.random.split(key_t)
            red_next = process_model(
                red, self.pos_noise * jax.random.normal(kr, (2,))
            )
            d_next = process_model(
                dstates, self.pos_noise * jax.random.normal(kd, (nd, 2))
            )
            im, vis = render_frame(red_next, d_next, d_radii, d_colors,
                                   self.im_size)
            q = jnp.array([self.pos_noise, self.pos_noise, 2.0, 2.0])
            return (red_next, d_next), (red_next, im, q, vis)

        keys_t = jax.random.split(jax.random.fold_in(key, 77), t)
        _, (states, images, qs, vis) = jax.lax.scan(
            step, (red0, d_state0), keys_t
        )
        return {
            "start_image": start_image,
            "start_state": red0,
            "image": images,
            "state": states,
            "q": qs,
            "visible": vis,
        }

    def generate_batch(self, key: jax.Array, num: int,
                       chunk: int = 32) -> Dict[str, Array]:
        """Generate ``num`` sequences, vmapped in fixed-size chunks so one
        compiled executable is reused (a single num-wide vmap makes XLA
        compile minutes-long programs for num in the hundreds)."""
        import logging
        import time

        log = logging.getLogger("nfdpf.simulator")
        gen = jax.jit(jax.vmap(self.generate_sequence))
        outs = []
        remaining = num
        t0 = time.time()
        while remaining > 0:
            take = min(chunk, remaining)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, chunk)      # fixed width → one jit
            data = jax.device_get(gen(keys))
            outs.append({k: np.asarray(v)[:take] for k, v in data.items()})
            remaining -= take
            log.info("generated %d/%d sequences [%.0fs]",
                     num - remaining, num, time.time() - t0)
        return {k: np.concatenate([o[k] for o in outs], axis=0)
                for k in outs[0]}


def generate_dataset(
    out_dir: str,
    num_examples: int = 1000,
    file_size: int = 500,
    num_distractors: int = 25,
    pos_noise: float = 2.0,
    sequence_length: int = 50,
    im_size: int = 128,
    seed: int = 0,
    name: str = "toy",
) -> None:
    """Generate and save npz shards with the reference's naming/layout
    (`create_dataset.py:218-255`): 80/10/10 split per shard, files
    ``<name>_pn=<σ>_d=<K>_const<i>_{train,val,test}.npz`` each holding one
    dict-of-arrays under the ``{split}_data`` key."""
    os.makedirs(out_dir, exist_ok=True)
    full_name = f"{name}_pn={pos_noise}_d={num_distractors}_const"
    sim = DiskSimulator(im_size, sequence_length, num_distractors, pos_noise)

    # total sequences so that ~num_examples land in train (80%)
    total = int(np.ceil(num_examples / 0.8))
    key = jax.random.PRNGKey(seed)
    written = 0
    index = 0
    while written < total:
        chunk = min(file_size, total - written)
        key, sub = jax.random.split(key)
        data = jax.device_get(sim.generate_batch(sub, chunk))
        rng = np.random.default_rng(seed + index)
        perm = rng.permutation(chunk)
        data = {k: np.asarray(v)[perm] for k, v in data.items()}
        train_n = int(np.floor(chunk * 0.8))
        val_n = int(np.floor(chunk * 0.1))
        splits = {
            "train": (0, train_n),
            "val": (train_n, train_n + val_n),
            "test": (train_n + val_n, chunk),
        }
        for split, (lo, hi) in splits.items():
            if hi <= lo:
                continue
            payload = {k: v[lo:hi] for k, v in data.items()}
            np.savez(
                os.path.join(out_dir, f"{full_name}{index}_{split}.npz"),
                **{f"{split}_data": payload},
            )
        written += chunk
        index += 1


def _cli() -> None:
    """Standalone dataset-generation entry, parity with the reference's
    ``python data/disk/create_dataset.py`` (`create_dataset.py:283-326`;
    same defaults: 1000 examples, file_size 500, 25 distractors, pos-noise
    2.0, T=50, 128px).  Run as ``python -m nfdpf_tpu.data.simulator``."""
    import argparse

    p = argparse.ArgumentParser(description=_cli.__doc__)
    p.add_argument("--out-dir", default="./TwentyfiveDistractors")
    p.add_argument("--num-examples", type=int, default=1000)
    p.add_argument("--file-size", type=int, default=500)
    p.add_argument("--num-distractors", type=int, default=25)
    p.add_argument("--pos-noise", type=float, default=2.0)
    p.add_argument("--sequence-length", type=int, default=50)
    p.add_argument("--im-size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--name", default="toy")
    a = p.parse_args()
    generate_dataset(a.out_dir, num_examples=a.num_examples,
                     file_size=a.file_size,
                     num_distractors=a.num_distractors,
                     pos_noise=a.pos_noise,
                     sequence_length=a.sequence_length,
                     im_size=a.im_size, seed=a.seed, name=a.name)
    print(f"wrote dataset shards to {a.out_dir}")


if __name__ == "__main__":
    _cli()
