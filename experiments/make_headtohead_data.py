"""Generate the shared head-to-head dataset (repo vs PyTorch reference).

One float32 shard set that BOTH frameworks read bit-exactly:
  - the reference's `ToyDiskDataset` loads shard 0 of
    `toy_pn=2.0_d=25_const*_{train,val,test}.npz` (`dataset.py:38`),
    expecting float32 images in [0, 1] (`create_dataset.py:193`);
  - the repo's `DiskDataset` accepts the same files (float32 images pass
    through `train.py:82-85` unscaled).

Custom split sized for a CPU-tractable reference run: 160 train / 50 val /
50 test (the reference val/test loaders use batch_size=50 with
drop_last=True, so both need >= 50 sequences — `main.py:50,62`).

    python experiments/make_headtohead_data.py --out /root/repo/refrun/data/disk/TwentyfiveDistractors
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=160)
    p.add_argument("--val", type=int, default=50)
    p.add_argument("--test", type=int, default=50)
    p.add_argument("--seq-len", type=int, default=25)
    p.add_argument("--distractors", type=int, default=25)
    p.add_argument("--pos-noise", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    # hard-set (not setdefault): the session env carries JAX_PLATFORMS=axon
    # and dataset generation must never grab the single real chip — a
    # generation job on the tunnel blocks any concurrent training run
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import numpy as np

    from nfdpf_tpu.data.simulator import DiskSimulator

    total = args.train + args.val + args.test
    sim = DiskSimulator(128, args.seq_len, args.distractors, args.pos_noise)
    t0 = time.time()
    data = jax.device_get(
        sim.generate_batch(jax.random.PRNGKey(args.seed), total))
    print(f"generated {total} sequences in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(total)
    data = {k: np.asarray(v)[perm] for k, v in data.items()}
    # reference image convention: float32 in [0,1] (`create_dataset.py:193`)
    for k in ("image", "start_image"):
        data[k] = data[k].astype(np.float32) / 255.0

    name = f"toy_pn={args.pos_noise}_d={args.distractors}_const"
    splits = {
        "train": (0, args.train),
        "val": (args.train, args.train + args.val),
        "test": (args.train + args.val, total),
    }
    os.makedirs(args.out, exist_ok=True)
    for split, (lo, hi) in splits.items():
        payload = {k: v[lo:hi] for k, v in data.items()}
        path = os.path.join(args.out, f"{name}0_{split}.npz")
        np.savez(path, **{f"{split}_data": payload})
        print(f"wrote {path}: {hi - lo} sequences", flush=True)


if __name__ == "__main__":
    main()
