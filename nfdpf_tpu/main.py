"""CLI entry: train → validate → test on the disk-tracking task.

Counterpart of `/root/reference/main.py`: seeds, run-id construction,
``logs/<run_id>/{models,data}`` artifact layout, train/val/test flow.  Extra
convenience over the reference: if the dataset directory is empty the
JAX-native simulator generates it in place (the reference requires a manual
cv2 generation step first).

    python -m nfdpf_tpu.main --resampler_type soft --measurement cos
"""

from __future__ import annotations

import os

import jax
import numpy as np

from nfdpf_tpu.config import DPFConfig, parse_args
from nfdpf_tpu.data.dataset import DiskDataset, iterate_batches
from nfdpf_tpu.data.simulator import generate_dataset
from nfdpf_tpu.train import Trainer
from nfdpf_tpu.utils.metrics import MetricsLogger


def get_run_id(cfg: DPFConfig) -> str:
    """`main.py:19-21` run-id hyperparameter string."""
    return "{}_NF^{}_{}_{}_{}_{}_{}_resample^{}_{}".format(
        cfg.seed, cfg.nf_dyn, cfg.train_type, cfg.pos_noise, cfg.vel_noise,
        cfg.nf_lr, cfg.lr, cfg.resampler_type, cfg.measurement,
    )


def ensure_dataset(cfg: DPFConfig, num_examples: int | None = None) -> str:
    """Dataset filename prefix coupled to --true-pos-noise (`main.py:44`).

    Auto-generates the dataset at the reference generator's default budget
    of 1000 train sequences (`create_dataset.py:283-326`) unless overridden
    by --num-examples.
    """
    num_examples = num_examples if num_examples is not None else cfg.num_examples
    filename = f"toy_pn={cfg.true_pos_noise}_d=25_const"
    probe = os.path.join(cfg.data_path, f"{filename}0_train.npz")
    if not os.path.exists(probe):
        print(f"dataset not found at {probe}; generating "
              f"{num_examples} sequences with the JAX simulator ...")
        generate_dataset(
            cfg.data_path, num_examples=num_examples,
            file_size=max(num_examples, 10),
            num_distractors=25, pos_noise=cfg.true_pos_noise,
            sequence_length=cfg.sequence_length, im_size=cfg.width,
            seed=cfg.seed,
        )
    return filename


def main(argv=None) -> None:
    cfg = parse_args(argv)
    np.random.seed(cfg.seed)
    run_id = get_run_id(cfg)
    run_dir = os.path.join("logs", run_id)
    os.makedirs(os.path.join(run_dir, "models"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "data"), exist_ok=True)
    print(cfg)

    filename = ensure_dataset(cfg)
    train_ds = DiskDataset(cfg.data_path, filename, "train_data")
    val_ds = DiskDataset(cfg.data_path, filename, "val_data")
    test_ds = DiskDataset(cfg.data_path, filename, "test_data")
    val_bs = min(50, len(val_ds))
    test_bs = min(50, len(test_ds))

    # --mesh-data/--mesh-particle scale-out: build the ('data','particle')
    # mesh, replicate parameters, shard batches over 'data'.  The reference
    # entry point is single-device (`main.py:10`, SURVEY §2.7); this is the
    # TPU-native extension.
    mesh = None
    if cfg.mesh_data * cfg.mesh_particle > 1:
        from nfdpf_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        n_mesh = cfg.mesh_data * cfg.mesh_particle
        mesh = make_mesh(data=cfg.mesh_data, particle=cfg.mesh_particle,
                         devices=jax.devices()[:n_mesh])
        print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")

    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    if mesh is not None:
        state = replicate(state, mesh)

    ckpt_best = os.path.join(run_dir, "models", "best")
    if cfg.resume and os.path.isdir(ckpt_best):
        print("resuming from", ckpt_best)
        state = trainer.load(ckpt_best, state)

    def _sharded(it):
        if mesh is None:
            return it
        return (shard_batch(b, mesh) for b in it)

    train_iter = lambda epoch: _sharded(iterate_batches(  # noqa: E731
        train_ds, cfg.batch_size, shuffle=True, drop_last=True,
        seed=cfg.seed + epoch,
    ))
    val_iter = lambda: _sharded(iterate_batches(  # noqa: E731
        val_ds, val_bs, shuffle=False, drop_last=True
    ))
    test_iter = lambda: _sharded(iterate_batches(  # noqa: E731
        test_ds, test_bs, shuffle=False, drop_last=True
    ))

    # staged-dataset budget for the fused-epoch fast path: uint8 frames for
    # train+val must fit in HBM next to the model (v5e: 16 GB/chip; sharding
    # over 'data' divides the footprint)
    staged_bytes = sum(
        ds.data["image"].nbytes + ds.data["state"].nbytes
        for ds in (train_ds, val_ds)
    ) // (mesh.shape["data"] if mesh is not None else 1)
    use_fused = cfg.fused_epoch and staged_bytes < 8e9

    if not cfg.testing:
        if cfg.pretrain_ae:
            print("pretraining autoencoder ...")
            state = trainer.pretrain_ae(
                train_iter, state, num_epochs=cfg.pretrain_epochs,
                valid_batches=val_iter,
                ckpt_path=os.path.join(run_dir, "models", "ae_pretrain"),
                run_dir=run_dir,
            )
        if cfg.load_pretrain_model:
            # `DPFs.py:311-315`: load the AE-pretrain checkpoint before
            # end-to-end training (the reference has a latent `self.model`
            # typo there; implemented correctly here).
            ae_ckpt = os.path.join(run_dir, "models", "ae_pretrain")
            if not os.path.isdir(ae_ckpt):
                ae_ckpt = os.path.join(cfg.model_path, "ae_pretrain")
            if os.path.isdir(ae_ckpt):
                print("loading pretrained AE weights from", ae_ckpt)
                from nfdpf_tpu.utils.checkpoint import restore_checkpoint

                tree = restore_checkpoint(
                    ae_ckpt, {"params": state.params, "rest": state.rest}
                )
                state = state.replace(params=tree["params"],
                                      rest=tree["rest"])
            else:
                print(f"no AE-pretrain checkpoint found at {ae_ckpt}; "
                      "continuing with fresh weights")
        if cfg.e2e_train:
            print("end-to-end training ...")
            logger = MetricsLogger(os.path.join(run_dir, "logger"))
            if use_fused:
                print(f"fused-epoch trainer (staged {staged_bytes/1e9:.2f} "
                      "GB/device)")
                state = trainer.fit_fused(
                    train_ds, val_ds, run_dir,
                    num_epochs=cfg.num_epochs, state=state, logger=logger,
                    seed=cfg.seed,
                )
            else:
                state = trainer.fit(
                    train_iter, val_iter, run_dir,
                    num_epochs=cfg.num_epochs, state=state, logger=logger,
                    seed=cfg.seed,
                )
        trainer.save(os.path.join(run_dir, "models", "final"), state)
    else:
        ckpt = os.path.join(cfg.model_path, "best")
        if os.path.isdir(ckpt):
            print("loading trained model from", ckpt)
            state = trainer.load(ckpt, state)

    trainer.test(test_iter, state, run_dir, seed=cfg.seed)


if __name__ == "__main__":
    main()
