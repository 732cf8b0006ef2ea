"""Tracking-RMSE experiment on the real disk dataset.

Trains a configurable DPF on a generated disk-tracking dataset and records
eval RMSE per epoch (the BASELINE.md quality metric).  TPU-first data path:
the whole train/val set is staged on device once as uint8 (~1 GB for 500
sequences) so epochs never pay host→device transfer — batches are
device-side gathers.

    python experiments/rmse_run.py --epochs 60 --config bootstrap
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import logging
import os
import sys
import time

faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)
logging.basicConfig(level=logging.INFO)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


CONFIGS = {
    "bootstrap": dict(measurement="cos", resampler_type="ot"),
    "soft": dict(measurement="cos", resampler_type="soft"),
    "cnf": dict(measurement="cos", resampler_type="ot", nf_dyn=True,
                nf_cond=True),
    "crnvp": dict(measurement="CRNVP", resampler_type="ot"),
    "cglow": dict(measurement="CGLOW", resampler_type="soft", nf_dyn=True),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="bootstrap", choices=sorted(CONFIGS))
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--sequences", type=int, default=400)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--particles", type=int, default=100)
    p.add_argument("--data-dir", default="/tmp/nfdpf_disk_data")
    p.add_argument("--out", default="experiments/rmse_results.json")
    p.add_argument("--init-true", action="store_true",
                   help="init particles at the true start state")
    p.add_argument("--seq-len", type=int, default=50)
    p.add_argument("--distractors", type=int, default=25)
    p.add_argument("--cpu", action="store_true", help="force CPU platform")
    p.add_argument("--train-type", default="DPF", choices=["DPF", "SDPF"],
                   help="SDPF adds the blockwise pseudo-likelihood loss")
    p.add_argument("--labeled-ratio", type=float, default=1.0,
                   help="semi-supervised label budget (`arguments.py:53`)")
    p.add_argument("--pretrain-epochs", type=int, default=0,
                   help="AE pretraining epochs before e2e (`DPFs.py:410-412`)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--torch-init", action="store_true",
                   help="torch-default U(±1/√fan_in) init (h2h init parity)")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv/matmul compute dtype (bf16 is ~1.4x faster)")
    p.add_argument("--epsilon", type=float, default=0.1,
                   help="OT entropic regularisation (`arguments.py:27`)")
    p.add_argument("--ess-threshold", type=float, default=0.5,
                   help="resample when ESS < thr*N (`DPFs.py:165`)")
    p.add_argument("--use-pallas", action="store_true",
                   help="route OT resampling through the streaming Pallas "
                        "Sinkhorn (O(N·d) memory — required for OT at N≥4k)")
    p.add_argument("--warm-start", action="store_true",
                   help="carry Sinkhorn potentials across ESS-gate firings "
                        "(config-5 cost lever; needs --use-pallas + ot)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each filter step: trades FLOPs for "
                        "BPTT memory, allowing larger batch at N=10k")
    p.add_argument("--encode-per-step", action="store_true",
                   help="reference-parity BN ablation: conv encoder inside "
                        "the time loop + separate AE-loss encode "
                        "(`DPFs.py:177`, `losses.py:5-16`)")
    p.add_argument("--no-fused", action="store_true",
                   help="dispatch one jitted step per batch instead of the "
                        "fused whole-epoch scan (the tunnel compile helper "
                        "rejects the very largest fused programs, e.g. "
                        "N=10k × Pallas-OT × 50-step epoch scan)")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint dir (default: <out>.ckpt). The train "
                        "state is saved every epoch so long runs survive "
                        "crashes and can be run in bounded-length chunks")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt-dir")
    p.add_argument("--epochs-per-proc", type=int, default=0,
                   help="exit cleanly after this many epochs (0 = run to "
                        "--epochs). Long single processes decelerate "
                        "(~+12s/epoch dispatch-overhead growth observed at "
                        "N=10k); chunked re-exec via run_chunked.sh keeps "
                        "every chunk in the fast regime")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nfdpf_tpu.config import DPFConfig
    from nfdpf_tpu.data.dataset import DiskDataset
    from nfdpf_tpu.data.simulator import generate_dataset
    from nfdpf_tpu.train import Trainer

    total = int(np.ceil(args.sequences / 0.8))
    probe = os.path.join(
        args.data_dir, f"toy_pn=2.0_d={args.distractors}_const0_train.npz")
    if not os.path.exists(probe):
        print(f"generating {total} sequences ...", flush=True)
        t0 = time.time()
        generate_dataset(args.data_dir, num_examples=args.sequences,
                         file_size=total, num_distractors=args.distractors,
                         pos_noise=2.0, sequence_length=args.seq_len, seed=0)
        print(f"generated in {time.time()-t0:.0f}s", flush=True)

    name = f"toy_pn=2.0_d={args.distractors}_const"
    train_ds = DiskDataset(args.data_dir, name, "train_data")
    val_ds = DiskDataset(args.data_dir, name, "val_data")
    print(f"train {len(train_ds)}, val {len(val_ds)}", flush=True)

    # stage everything on device once (uint8 images)
    def stage(ds):
        return {
            "image": jnp.asarray(ds.data["image"]),
            "state": jnp.asarray(ds.data["state"]),
            "start_state": jnp.asarray(ds.data["start_state"]),
        }

    train_dev = stage(train_ds)
    val_dev = stage(val_ds)
    print("staged on device:",
          train_dev["image"].nbytes / 1e6, "MB train images", flush=True)

    cfg = DPFConfig(
        num_particles=args.particles, sequence_length=args.seq_len,
        batch_size=args.batch, init_with_true_state=args.init_true,
        train_type=args.train_type, labeled_ratio=args.labeled_ratio,
        lr=args.lr, seed=args.seed,
        epsilon=args.epsilon, ess_threshold=args.ess_threshold,
        compute_dtype=args.compute_dtype, torch_init=args.torch_init,
        use_pallas=args.use_pallas,
        sinkhorn_warm_start=args.warm_start,
        remat_scan_step=args.remat,
        encode_per_step=args.encode_per_step,
        **CONFIGS[args.config],
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    train_epoch = None if args.no_fused else trainer.make_train_epoch()
    train_step = trainer.make_train_step() if args.no_fused else None
    eval_step = trainer.make_eval_step()

    n_train = len(train_ds)
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    history = []
    resample_hist = []
    sinkhorn_hist = []
    t_start = time.time()

    from nfdpf_tpu.utils.checkpoint import (latest_checkpoint,
                                            restore_checkpoint,
                                            save_checkpoint)

    ckpt_dir = args.ckpt_dir or (args.out + ".ckpt")
    # fixed-size history pad, independent of --epochs, so a checkpoint can be
    # restored by a resuming run launched with a different --epochs value
    HIST_PAD = 4096
    assert args.epochs <= HIST_PAD
    start_epoch = 0
    if args.resume:
        latest = latest_checkpoint(ckpt_dir)
        if latest is not None:
            try:
                tree = restore_checkpoint(latest, {
                    "state": state, "epoch": 0, "hist_len": 0,
                    "history": np.zeros((HIST_PAD,), np.float64),
                    "resample_hist": np.zeros((HIST_PAD,), np.float64),
                    "sinkhorn_hist": np.zeros((HIST_PAD,), np.float64)})
                n = int(tree["hist_len"])
                history = [float(x) for x in tree["history"][:n]]
                resample_hist = [float(x) for x in tree["resample_hist"][:n]]
                sinkhorn_hist = [float(x) for x in tree["sinkhorn_hist"][:n]]
            except Exception:  # legacy ckpt: (--epochs,)-padded, no rs hist
                from nfdpf_tpu.utils.checkpoint import checkpoint_metadata
                meta = checkpoint_metadata(latest)
                hist_shape = tuple(meta["history"].shape)
                tree = restore_checkpoint(latest, {
                    "state": state, "epoch": 0,
                    "history": np.zeros(hist_shape, np.float64)})
                n = int(tree["epoch"]) + 1
                history = [float(x) for x in tree["history"][:n]]
                resample_hist = [-1.0] * n  # sentinel: lost by legacy format
                sinkhorn_hist = [-1.0] * n  # sentinel: lost by legacy fmt
            state = tree["state"]
            start_epoch = int(tree["epoch"]) + 1
            print(f"resumed from {latest}: epoch {start_epoch}, "
                  f"best so far {min(history):.3f}px", flush=True)
        else:
            print(f"no checkpoint in {ckpt_dir}; starting fresh", flush=True)

    # pretraining happens once, before epoch 0 — a resumed chunk must not
    # re-apply it to the restored e2e state
    if args.pretrain_epochs > 0 and start_epoch == 0:
        ae_step = trainer.make_ae_pretrain_step()
        t = args.seq_len
        for epoch in range(args.pretrain_epochs):
            order = rng.permutation(n_train)
            for lo in range(0, n_train - args.batch + 1, args.batch):
                idx = jnp.asarray(order[lo:lo + args.batch])
                frames = train_dev["image"][idx].astype(jnp.float32) / 255.0
                frames = frames.reshape((-1,) + frames.shape[2:])
                state, ae_loss = ae_step(state, frames)
            if epoch % 10 == 0 or epoch == args.pretrain_epochs - 1:
                print(f"AE pretrain epoch {epoch}: {float(ae_loss):.5f} "
                      f"[{time.time()-t_start:.0f}s]", flush=True)
    steps = n_train // args.batch
    assert steps >= 1, (
        f"dataset ({n_train} sequences) smaller than batch size "
        f"({args.batch}); lax.scan would run zero steps and the epoch "
        f"metrics would be silent NaNs — lower --batch")
    done = 0
    for epoch in range(start_epoch, args.epochs):
        # per-epoch derivation (not a chained split) so a resumed run draws
        # the same permutations/keys the uninterrupted run would have
        order = np.random.default_rng([0, epoch]).permutation(n_train)
        idx = jnp.asarray(
            order[: steps * args.batch].reshape(steps, args.batch))
        sub = jax.random.fold_in(key, epoch)
        if args.no_fused:
            ms = []
            for ids in np.asarray(idx):
                batch = {k: v[jnp.asarray(ids)] for k, v in train_dev.items()}
                sub, s2 = jax.random.split(sub)
                state, m = train_step(state, batch, s2)
                ms.append(m)
            m = jax.tree_util.tree_map(
                lambda *xs: jnp.mean(jnp.stack(xs)), *ms)
        else:
            # whole epoch in one jitted program (one tunnel dispatch)
            state, m = train_epoch(state, train_dev, idx, sub)
        # eval on the full val set in fixed-size chunks
        evals = []
        n_val = val_dev["image"].shape[0]
        eval_bs = min(50, n_val)
        for ci, lo in enumerate(range(0, n_val - eval_bs + 1, eval_bs)):
            vbatch = {k: v[lo:lo + eval_bs] for k, v in val_dev.items()}
            esub = jax.random.fold_in(jax.random.fold_in(key, 10_000 + epoch),
                                      ci)
            em, _ = eval_step(state, vbatch, esub)
            evals.append(float(em["loss_sup"]))
        rmse = float(np.mean(evals))
        history.append(rmse)
        rs = float(m.get("resample_count", -1.0))
        resample_hist.append(rs)
        si = float(m.get("sinkhorn_iters", 0.0))
        sinkhorn_hist.append(si)
        print(f"epoch {epoch}: train_loss={float(m['loss']):.3f} "
              f"val_RMSE={rmse:.3f}px resample={rs:.1f}/{args.seq_len} "
              f"sk_iters={si:.0f}  "
              f"[{time.time()-t_start:.0f}s]",
              flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"config": args.config, "epochs": epoch + 1,
                       "epsilon": args.epsilon,
                       "ess_threshold": args.ess_threshold,
                       "train_type": args.train_type,
                       "labeled_ratio": args.labeled_ratio,
                       "particles": args.particles,
                       "init_with_true_state": args.init_true,
                       "torch_init": args.torch_init,
                       "seed": args.seed,
                       "val_rmse_per_epoch": history,
                       "best_val_rmse": min(history),
                       # mean ESS-gate firings per T-step batch pass (train)
                       "train_resamples_per_pass": resample_hist,
                       "warm_start": args.warm_start,
                       "remat": args.remat,
                       # mean Sinkhorn loop iterations per pass (0 when not
                       # on the streaming-OT path)
                       "train_sinkhorn_iters_per_pass": sinkhorn_hist,
                       "wall_seconds": time.time() - t_start}, f, indent=2)
        hpad = np.zeros((HIST_PAD,), np.float64)
        hpad[: len(history)] = history
        rpad = np.zeros((HIST_PAD,), np.float64)
        rpad[: len(resample_hist)] = resample_hist
        spad = np.zeros((HIST_PAD,), np.float64)
        spad[: len(sinkhorn_hist)] = sinkhorn_hist
        save_checkpoint(os.path.join(ckpt_dir, f"ckpt_{epoch}"),
                        {"state": state, "epoch": epoch,
                         "hist_len": len(history),
                         "history": hpad, "resample_hist": rpad,
                         "sinkhorn_hist": spad})
        prev = os.path.join(ckpt_dir, f"ckpt_{epoch - 1}")
        if os.path.isdir(prev):
            import shutil
            shutil.rmtree(prev)
        done += 1
        if args.epochs_per_proc and done >= args.epochs_per_proc:
            print(f"chunk done ({done} epochs); exiting for re-exec",
                  flush=True)
            break

    print(f"best val RMSE: {min(history):.3f}px")


if __name__ == "__main__":
    main()
