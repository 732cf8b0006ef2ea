"""Training harness: losses → optax → epoch loops → artifacts.

TPU-native counterpart of `/root/reference/DPFs.py:96-142,231-451` (forward
loss assembly, AE pretraining, end-to-end training, testing) and
`main.py:23-64` orchestration.  The per-batch work is ONE jitted function
(forward filter + all losses + grads + Adam update); BN batch-stats updates
ride along functionally.

Loss weighting parity (`DPFs.py:118-138`): total = 1.0·sup + 2.0·ae for DPF,
plus 0.01·pseudo-likelihood for SDPF (NF or Gaussian variant by --NF-dyn).
Teacher-forced velocity gets N(0, 4²) noise (`DPFs.py:105`).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from nfdpf_tpu import losses as L
from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.models.dpf import DPF, FilterOutput
from nfdpf_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from nfdpf_tpu.utils.metrics import MetricsLogger

Array = jax.Array


class TrainState(struct.PyTreeNode):
    params: Any          # {module: params-subtree}
    rest: Any            # {module: non-param collections (batch_stats, constants)}
    opt_state: Any
    epoch: int


def _split_variables(variables: Dict[str, Any]):
    params = {k: v["params"] for k, v in variables.items()}
    rest = {
        k: {c: v[c] for c in v if c != "params"} for k, v in variables.items()
    }
    return params, rest


def _merge_variables(params, rest):
    return {k: {"params": params[k], **rest[k]} for k in params}


class Trainer:
    def __init__(self, config: DPFConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        self.engine = DPF(config, mesh=mesh)
        # constant lr: the reference's MultiStepLR has gamma=1.0, a no-op
        # scheduler (`DPFs.py:94`).
        self.tx = optax.adam(config.lr)

    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        variables = self.engine.init(key)
        params, rest = _split_variables(variables)
        return TrainState(
            params=params, rest=rest, opt_state=self.tx.init(params), epoch=0
        )

    # ------------------------------------------------------------------
    # loss assembly (`DPFs.py:96-142`)
    # ------------------------------------------------------------------

    def _loss(self, params, rest, batch, key, train: bool):
        cfg = self.config
        engine = self.engine
        variables = _merge_variables(params, rest)

        images = batch["image"]                       # (B, T, H, W, 3)
        if images.dtype == jnp.uint8:
            # uint8 shipping: normalise on device (lossless, 4× less PCIe/
            # tunnel traffic than float32 frames)
            images = images.astype(jnp.float32) / 255.0
        state = batch["state"]                        # (B, T, 4)
        start_state = batch["start_state"]            # (B, 4)
        b, t = images.shape[:2]

        k_vel, k_filter, k_mask = jax.random.split(key, 3)
        vel = state[..., 2:] + 4.0 * jax.random.normal(k_vel, state[..., 2:].shape)

        out, encodings, enc_bn = engine.filter(
            variables, images, start_state, vel, k_filter, train=train
        )

        if train:
            mask = L.semi_supervised_mask(k_mask, b, t, cfg.labeled_ratio)
        else:
            mask = 1.0
        loss_sup, predictions = L.supervised_loss(
            out.particles, out.weights, state, mask, train, cfg.labeled_ratio
        )

        # AE loss reuses the filter's encodings — the reference re-encodes
        # every frame a second time (`losses.py:5-16`); same parameters, same
        # gradient paths, half the conv FLOPs.  Under the encode_per_step
        # ablation the reference's exact computation is reproduced instead:
        # a SECOND full-frame encode (BN batch statistics over all B·T
        # frames, running stats updated on top of the filter's per-step
        # updates) feeds the decoder.
        if cfg.encode_per_step and train:
            vars_bn = {
                **variables,
                "encoder": {**variables["encoder"], "batch_stats": enc_bn},
            }
            ae_enc, enc_bn = engine.encode(
                vars_bn, images.reshape((b * t,) + images.shape[2:]),
                train=True,
            )
        else:
            ae_enc = encodings.reshape(b * t, -1)
        recon, dec_bn = engine.decode(variables, ae_enc, train=train)
        loss_ae = L.autoencoder_loss(
            images.reshape((b * t,) + images.shape[2:]), recon
        )

        loss_pl = jnp.asarray(0.0)
        if cfg.train_type == "SDPF":
            if cfg.nf_dyn:
                loss_pl = L.pseudolikelihood_loss_nf(
                    out.weights, out.noise, out.likelihoods, out.indices,
                    out.jacobians, out.priors, cfg.block_length,
                )
            else:
                loss_pl = L.pseudolikelihood_loss(
                    out.weights, out.noise, out.likelihoods, out.indices,
                    cfg.block_length, cfg.pos_noise, cfg.vel_noise,
                )
            total = 1.0 * loss_sup + 0.01 * loss_pl + 2.0 * loss_ae
        elif cfg.train_type == "DPF":
            total = 1.0 * loss_sup + 2.0 * loss_ae
        else:
            raise ValueError(
                "trainType must be DPF (supervised) or SDPF (semi-supervised)"
            )

        new_rest = dict(rest)
        if train:
            new_rest = {
                **rest,
                "encoder": {**rest["encoder"], "batch_stats": enc_bn},
                "decoder": {**rest["decoder"], "batch_stats": dec_bn},
            }
        aux = {
            "loss_sup": loss_sup,
            "loss_ae": loss_ae,
            "loss_pseudolik": loss_pl,
            "obs_likelihood": out.obs_likelihood,
            # steps (of T) on which the ESS gate fired (`DPFs.py:163-170`)
            # — resampling-activity evidence for parity protocols
            "resample_count": jnp.sum(out.resampled.astype(jnp.float32)),
            # total Sinkhorn loop iterations this pass (streaming-OT path
            # only; 0 elsewhere) — cost telemetry for the warm-start lever
            "sinkhorn_iters": jnp.sum(out.sinkhorn_iters.astype(jnp.float32)),
            "predictions": predictions,
            "filter_out": out,
            "new_rest": new_rest,
        }
        return total, aux

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def make_train_step(self):
        tx = self.tx

        # donate the state: params/opt-state buffers are consumed in place,
        # halving peak HBM for the update (callers chain states anyway).
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, key):
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                state.params, state.rest, batch, key, True
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state, rest=aux["new_rest"]
            )
            metrics = {
                "loss": loss,
                "loss_sup": aux["loss_sup"],
                "loss_ae": aux["loss_ae"],
                "loss_pseudolik": aux["loss_pseudolik"],
                "obs_likelihood": aux["obs_likelihood"],
                "resample_count": aux["resample_count"],
                "sinkhorn_iters": aux["sinkhorn_iters"],
            }
            return new_state, metrics

        return train_step

    def make_eval_step(self):
        @jax.jit
        def eval_step(state: TrainState, batch, key):
            loss, aux = self._loss(state.params, state.rest, batch, key, False)
            return {
                "loss": loss,
                "loss_sup": aux["loss_sup"],
                "loss_ae": aux["loss_ae"],
                "obs_likelihood": aux["obs_likelihood"],
                "resample_count": aux["resample_count"],
                "sinkhorn_iters": aux["sinkhorn_iters"],
            }, aux

        return eval_step

    def make_train_epoch(self):
        """Whole-epoch step: scans the train step over a (steps, B) index
        matrix into a device-staged dataset, inside ONE jitted program.

        TPU-native replacement for the per-batch dispatch loop: the remote
        chip pays one ~26 ms dispatch round-trip per *call*, so fusing the
        epoch amortises it over all optimizer steps, and the per-step batch
        is a device-side gather from the staged arrays (no host↔device
        traffic at all during the epoch).

        ``data`` values are the full staged arrays (leading axis = dataset);
        ``idx`` is int32 (steps_per_epoch, batch_size).

        Under a mesh the staged arrays are sharded over 'data' on the dataset
        axis and the per-step gather is re-constrained to batch-over-'data',
        so each step's collective traffic is one batch, same as shipping the
        batch would be — but over ICI instead of the host link.
        """
        tx = self.tx
        mesh = self.mesh

        @partial(jax.jit, donate_argnums=(0,))
        def train_epoch(state: TrainState, data, idx, key):
            def body(carry, ids):
                st, ky = carry
                batch = {k: v[ids] for k, v in data.items()}
                if mesh is not None:
                    from nfdpf_tpu.parallel.mesh import DATA_AXIS, constrain
                    batch = {k: constrain(v, mesh, DATA_AXIS)
                             for k, v in batch.items()}
                ky, sub = jax.random.split(ky)
                (loss, aux), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(st.params, st.rest, batch, sub, True)
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                st = st.replace(params=params, opt_state=opt_state,
                                rest=aux["new_rest"])
                return (st, ky), {
                    "loss": loss,
                    "loss_sup": aux["loss_sup"],
                    "loss_ae": aux["loss_ae"],
                    "loss_pseudolik": aux["loss_pseudolik"],
                    "obs_likelihood": aux["obs_likelihood"],
                    "resample_count": aux["resample_count"],
                "sinkhorn_iters": aux["sinkhorn_iters"],
                }
            (state, _), metrics = jax.lax.scan(body, (state, key), idx)
            return state, jax.tree_util.tree_map(jnp.mean, metrics)

        return train_epoch

    def make_ae_pretrain_step(self):
        """AE-only loop step (`DPFs.py:231-302`): MSE(decode(encode(img)), img),
        full-model Adam (the reference steps the shared optimizer)."""
        tx = self.tx
        engine = self.engine

        def ae_loss(params, rest, images):
            variables = _merge_variables(params, rest)
            feats, enc_bn = engine.encode(variables, images, train=True)
            recon, dec_bn = engine.decode(variables, feats, train=True)
            loss = jnp.mean((recon - images) ** 2)
            new_rest = {
                **rest,
                "encoder": {**rest["encoder"], "batch_stats": enc_bn},
                "decoder": {**rest["decoder"], "batch_stats": dec_bn},
            }
            return loss, new_rest

        @jax.jit
        def ae_step(state: TrainState, images):
            (loss, new_rest), grads = jax.value_and_grad(ae_loss, has_aux=True)(
                state.params, state.rest, images
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 rest=new_rest), loss

        return ae_step

    # ------------------------------------------------------------------
    # epoch loops (`DPFs.py:304-417`)
    # ------------------------------------------------------------------

    def fit(
        self,
        train_batches,            # callable(epoch) -> iterator of dict batches
        valid_batches,            # callable() -> iterator
        run_dir: str,
        num_epochs: Optional[int] = None,
        state: Optional[TrainState] = None,
        logger: Optional[MetricsLogger] = None,
        seed: int = 0,
    ) -> TrainState:
        cfg = self.config
        num_epochs = num_epochs or cfg.num_epochs
        os.makedirs(os.path.join(run_dir, "models"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "data"), exist_ok=True)
        logger = logger or MetricsLogger(os.path.join(run_dir, "logger"))
        if state is None:
            state = self.init_state(jax.random.PRNGKey(cfg.seed))

        train_step = self.make_train_step()
        eval_step = self.make_eval_step()
        key = jax.random.PRNGKey(seed)
        best_eval = float("inf")
        eval_loss_epoch = []

        for epoch in range(int(state.epoch), num_epochs):
            train_metrics = []
            for batch in train_batches(epoch):
                key, sub = jax.random.split(key)
                state, m = train_step(state, batch, sub)
                train_metrics.append(jax.device_get(m))
            mean_sup = float(np.mean([m["loss_sup"] for m in train_metrics]))
            logger.scalar("Sup_loss/loss", mean_sup, epoch)

            eval_metrics = []
            last_aux = None
            for batch in valid_batches():
                key, sub = jax.random.split(key)
                m, aux = eval_step(state, batch, sub)
                eval_metrics.append(jax.device_get(m))
                last_aux = (aux, batch)
            mean_eval = float(np.mean([m["loss_sup"] for m in eval_metrics]))
            logger.scalar("Sup_loss_eval/loss", mean_eval, epoch)
            eval_loss_epoch.append(mean_eval)
            np.save(os.path.join(run_dir, "data", "eval_loss_epoch.npy"),
                    np.asarray(eval_loss_epoch))
            print(f"epoch {epoch}: train_sup={mean_sup:.4f} "
                  f"eval_sup={mean_eval:.4f}")

            state = state.replace(epoch=epoch + 1)
            if mean_eval < best_eval and last_aux is not None:
                best_eval = mean_eval
                aux, batch = last_aux
                out: FilterOutput = aux["filter_out"]
                np.savez(
                    os.path.join(run_dir, "data", "eval_result_best.npz"),
                    particle_list=np.asarray(out.particles),
                    particle_weight_list=np.asarray(out.weights),
                    likelihood_list=np.asarray(out.likelihoods),
                    pred=np.asarray(aux["predictions"]),
                    state=np.asarray(batch["state"]),
                    loss=np.asarray([m["loss_sup"] for m in eval_metrics]),
                )
                save_checkpoint(
                    os.path.join(run_dir, "models", "best"),
                    {"params": state.params, "rest": state.rest,
                     "opt_state": state.opt_state,
                     "epoch": jnp.asarray(state.epoch)},
                )
        return state

    def fit_fused(
        self,
        train_ds,                 # DiskDataset (raw arrays in .data)
        val_ds,                   # DiskDataset
        run_dir: str,
        num_epochs: Optional[int] = None,
        state: Optional[TrainState] = None,
        logger: Optional[MetricsLogger] = None,
        seed: int = 0,
    ) -> TrainState:
        """Device-staged fast path of :meth:`fit` — same artifacts/ckpts, but
        the whole dataset lives in HBM (uint8 images, normalised on device)
        and each epoch is ONE jitted ``lax.scan`` over optimizer steps
        (``make_train_epoch``), so the per-call dispatch latency is paid once
        per epoch instead of once per batch.

        Under a mesh the staged arrays are sharded over 'data' along the
        dataset axis (trimmed to a shard multiple) and the training state is
        replicated.
        """
        cfg = self.config
        num_epochs = num_epochs or cfg.num_epochs
        os.makedirs(os.path.join(run_dir, "models"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "data"), exist_ok=True)
        logger = logger or MetricsLogger(os.path.join(run_dir, "logger"))
        if state is None:
            state = self.init_state(jax.random.PRNGKey(cfg.seed))

        def _trim(n: int) -> int:
            if self.mesh is None:
                return n
            shards = self.mesh.shape["data"]
            return (n // shards) * shards

        def _stage(ds):
            keep = ("image", "state", "start_state")
            arrays = {k: np.asarray(ds.data[k]) for k in keep}
            n = _trim(arrays["image"].shape[0])
            arrays = {k: v[:n] for k, v in arrays.items()}
            if self.mesh is None:
                return jax.device_put(arrays)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from nfdpf_tpu.parallel.mesh import DATA_AXIS

            return jax.device_put(
                arrays, NamedSharding(self.mesh, P(DATA_AXIS)))

        train_dev = _stage(train_ds)
        val_dev = _stage(val_ds)
        if self.mesh is not None:
            from nfdpf_tpu.parallel.mesh import replicate

            state = replicate(state, self.mesh)

        n_train = train_dev["image"].shape[0]
        n_val = val_dev["image"].shape[0]
        steps = n_train // cfg.batch_size
        if steps < 1:
            raise ValueError(
                f"dataset ({n_train} sequences) smaller than the batch size "
                f"({cfg.batch_size}); the fused epoch would run zero steps")
        eval_bs = _trim(min(50, n_val)) or n_val

        train_epoch = self.make_train_epoch()
        eval_step = self.make_eval_step()
        key = jax.random.PRNGKey(seed)
        rng = np.random.default_rng(seed)
        best_eval = float("inf")
        eval_loss_epoch = []

        for epoch in range(int(state.epoch), num_epochs):
            order = rng.permutation(n_train)
            idx = jnp.asarray(
                order[: steps * cfg.batch_size]
                .reshape(steps, cfg.batch_size).astype(np.int32))
            key, sub = jax.random.split(key)
            state, m = train_epoch(state, train_dev, idx, sub)
            mean_sup = float(m["loss_sup"])
            logger.scalar("Sup_loss/loss", mean_sup, epoch)

            eval_metrics = []
            last_aux = None
            for lo in range(0, n_val - eval_bs + 1, eval_bs):
                vbatch = {k: v[lo:lo + eval_bs] for k, v in val_dev.items()}
                key, sub = jax.random.split(key)
                em, aux = eval_step(state, vbatch, sub)
                eval_metrics.append(float(em["loss_sup"]))
                last_aux = (aux, vbatch)
            mean_eval = float(np.mean(eval_metrics))
            logger.scalar("Sup_loss_eval/loss", mean_eval, epoch)
            eval_loss_epoch.append(mean_eval)
            np.save(os.path.join(run_dir, "data", "eval_loss_epoch.npy"),
                    np.asarray(eval_loss_epoch))
            print(f"epoch {epoch}: train_sup={mean_sup:.4f} "
                  f"eval_sup={mean_eval:.4f}")

            state = state.replace(epoch=epoch + 1)
            if mean_eval < best_eval and last_aux is not None:
                best_eval = mean_eval
                aux, vbatch = last_aux
                out: FilterOutput = aux["filter_out"]
                np.savez(
                    os.path.join(run_dir, "data", "eval_result_best.npz"),
                    particle_list=np.asarray(out.particles),
                    particle_weight_list=np.asarray(out.weights),
                    likelihood_list=np.asarray(out.likelihoods),
                    pred=np.asarray(aux["predictions"]),
                    state=np.asarray(vbatch["state"]),
                    loss=np.asarray(eval_metrics),
                )
                save_checkpoint(
                    os.path.join(run_dir, "models", "best"),
                    {"params": state.params, "rest": state.rest,
                     "opt_state": state.opt_state,
                     "epoch": jnp.asarray(state.epoch)},
                )
        return state

    def pretrain_ae(self, train_batches, state: TrainState,
                    num_epochs: int = 300, valid_batches=None,
                    ckpt_path: Optional[str] = None,
                    logger: Optional[MetricsLogger] = None,
                    run_dir: Optional[str] = None) -> TrainState:
        """AE-only pretraining (`DPFs.py:231-302`): per-epoch train + val,
        best-val checkpoint, and reload of the best weights at the end.

        When ``run_dir`` is given, a reconstruction grid of the first val
        batch is rendered each val epoch, as the reference does
        (`DPFs.py:262-288` → `plot.py:226-243`)."""
        ae_step = self.make_ae_pretrain_step()
        engine = self.engine

        @jax.jit
        def ae_eval(params, rest, images):
            variables = _merge_variables(params, rest)
            feats = engine.encoder.apply(variables["encoder"], images,
                                         train=False)
            recon = engine.decoder.apply(variables["decoder"], feats,
                                         train=False)
            return jnp.mean((recon - images) ** 2)

        def _frames(batch):
            images = batch["image"]
            if images.dtype == np.uint8 or images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            b, t = images.shape[:2]
            return images.reshape((b * t,) + images.shape[2:])

        best_val = float("inf")
        best = None
        for epoch in range(num_epochs):
            losses = []
            for batch in train_batches(epoch):
                state, loss = ae_step(state, _frames(batch))
                losses.append(float(loss))
            train_mean = float(np.mean(losses))
            val_mean = train_mean
            if valid_batches is not None:
                vlosses = [
                    float(ae_eval(state.params, state.rest, _frames(b)))
                    for b in valid_batches()
                ]
                val_mean = float(np.mean(vlosses))
                if logger is not None:
                    logger.scalar("PretrainAE_loss_eval/loss", val_mean, epoch)
                if run_dir is not None:
                    first = next(iter(valid_batches()))
                    frames = _frames(first)
                    variables = _merge_variables(state.params, state.rest)
                    recon = engine.decoder.apply(
                        variables["decoder"],
                        engine.encoder.apply(variables["encoder"], frames,
                                             train=False),
                        train=False,
                    )
                    b, t = first["image"].shape[:2]
                    from nfdpf_tpu.viz import plot_obs

                    os.makedirs(os.path.join(run_dir, "data"), exist_ok=True)
                    plot_obs(
                        np.asarray(frames).reshape(
                            (b, t) + frames.shape[1:]),
                        np.asarray(recon).reshape((b, t) + frames.shape[1:]),
                        os.path.join(run_dir, "data",
                                     f"ae_recon_epoch{epoch:03d}.png"),
                    )
            print(f"AE pretrain epoch {epoch}: train {train_mean:.5f} "
                  f"val {val_mean:.5f}")
            if val_mean < best_val:
                best_val = val_mean
                best = jax.device_get({"params": state.params,
                                       "rest": state.rest})
                if ckpt_path is not None:
                    save_checkpoint(ckpt_path, best)
        if best is not None:
            # reload best weights, as the reference does (`DPFs.py:300-302`)
            state = state.replace(params=best["params"], rest=best["rest"])
        return state

    def test(self, test_batches, state: TrainState, run_dir: str,
             seed: int = 0) -> float:
        """`DPFs.py:419-451`: one no-grad pass, saves losses + full histories."""
        eval_step = self.make_eval_step()
        key = jax.random.PRNGKey(seed)
        losses = []
        last = None
        for batch in test_batches():
            key, sub = jax.random.split(key)
            m, aux = eval_step(state, batch, sub)
            losses.append(float(m["loss_sup"]))
            last = (aux, batch)
        os.makedirs(os.path.join(run_dir, "data"), exist_ok=True)
        np.save(os.path.join(run_dir, "data", "test_loss_epoch.npy"),
                np.asarray(losses))
        if last is not None:
            aux, batch = last
            out: FilterOutput = aux["filter_out"]
            np.savez(
                os.path.join(run_dir, "data", "test_result.npz"),
                particle_list=np.asarray(out.particles),
                particle_weight_list=np.asarray(out.weights),
                likelihood_list=np.asarray(out.likelihoods),
                state=np.asarray(batch["state"]),
                pred=np.asarray(aux["predictions"]),
                images=np.asarray(batch["image"]),
                noise=np.asarray(out.noise),
            )
            # diagnostic plots from the saved test artifacts
            # (`plot.py:6-158` views, wired here rather than offline)
            from nfdpf_tpu import viz

            data_dir = os.path.join(run_dir, "data")
            images = np.asarray(batch["image"][0])
            if images.dtype == np.uint8:
                images = images.astype(np.float32) / 255.0
            particles = np.asarray(out.particles[0])        # (T, N, d)
            weights = np.asarray(out.weights[0])            # (T, N)
            true_state = np.asarray(batch["state"][0])      # (T, 4)
            pred = np.asarray(aux["predictions"][0])        # (T, 2)
            viz.plot_state_tracking(
                true_state, pred,
                os.path.join(data_dir, "test_trajectory.png"),
                width=self.config.width,
            )
            viz.plot_ess_tracking(
                np.asarray(out.weights),
                os.path.join(data_dir, "test_ess.png"),
            )
            viz.plot_obs_tracking(
                images, particles[..., :2], weights, true_state, pred,
                os.path.join(data_dir, "tracking"),
                width=self.config.width,
            )
        mean_loss = float(np.mean(losses))
        print(f"test loss: {mean_loss:.4f}")
        return mean_loss

    # ------------------------------------------------------------------

    def save(self, path: str, state: TrainState) -> None:
        save_checkpoint(path, {
            "params": state.params, "rest": state.rest,
            "opt_state": state.opt_state, "epoch": jnp.asarray(state.epoch),
        })

    def load(self, path: str, state: TrainState) -> TrainState:
        tree = restore_checkpoint(path, {
            "params": state.params, "rest": state.rest,
            "opt_state": state.opt_state, "epoch": jnp.asarray(state.epoch),
        })
        return TrainState(
            params=tree["params"], rest=tree["rest"],
            opt_state=tree["opt_state"], epoch=int(tree["epoch"]),
        )
