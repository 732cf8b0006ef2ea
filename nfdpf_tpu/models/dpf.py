"""The differentiable particle filter engine.

TPU-native counterpart of `/root/reference/DPFs.py:22-216`.  The reference's
serial Python time loop with incremental ``torch.cat`` history stacking
(`DPFs.py:160-214`) becomes ONE ``jax.lax.scan``: the carry holds
(particles, weights, vel, obs-likelihood accumulator, rng key) and the scan
emits the stacked per-step histories the losses need (particles, weights,
noise, likelihoods, ancestor indices, flow jacobians, prior terms).

TPU-first design points:
  * the conv encoder runs ONCE over all (B·T) frames before the scan — one
    large MXU-friendly launch instead of T small ones (`DPFs.py:177`
    encodes per step);
  * ESS-gated resampling is a ``lax.cond`` on the scalar batch-mean ESS
    (`DPFs.py:163-170`) — only the taken branch executes at runtime, so the
    Sinkhorn loop costs nothing on steps that skip resampling;
  * RNG is an explicit key threaded through the carry (the reference uses
    impure global RNG, `model/models.py:199`);
  * optional per-step rematerialisation (``remat_scan_step``) trades FLOPs
    for BPTT memory over the 50-step unroll.

The engine is a thin coordinator over pure linen modules: parameters live in
a plain dict-of-variables pytree, so the whole filter is a pure function of
(variables, batch, key) — trivially jit/pjit/shard_map-able.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.models.dynamics import (
    motion_update,
    nf_dynamic_model,
    proposal_likelihood,
)
from nfdpf_tpu.models.measurement import build_measurement_model
from nfdpf_tpu.models.nets import ObservationDecoder, ObservationEncoder
from nfdpf_tpu.ops.density import (
    effective_sample_size,
    normalize_log_weights,
    uniform_log_weights,
)
from nfdpf_tpu.ops.flows import realnvp_chain
from nfdpf_tpu.ops.resampling import soft_systematic_resample
from nfdpf_tpu.ops.sinkhorn import ot_resample

Array = jax.Array


class FilterOutput(NamedTuple):
    """Stacked per-step filter histories (time axis second, as in the
    reference's (B, T, ...) lists, `DPFs.py:194-216`)."""

    particles: Array        # (B, T, N, d)
    weights: Array          # (B, T, N) normalised linear (+1e-12)
    noise: Array            # (B, T, N, d) motion noise
    likelihoods: Array      # (B, T, N) measurement log-lik
    indices: Array          # (B, T, N) ancestor indices (int32, within-batch)
    jacobians: Array        # (B, T, N) dynamics-flow jac (zeros if NF off)
    priors: Array           # (B, T, N) prior log terms (zeros if NF off)
    init_weights_log: Array  # (B, N)
    obs_likelihood: Array   # scalar: Σ_t mean(log w̃_t)  (`DPFs.py:191`)
    resampled: Array        # (T,) bool: ESS gate fired at step t
                            # (`DPFs.py:163-170`) — resampling-activity
                            # evidence for parity protocols
    sinkhorn_iters: Array   # (T,) int32: Sinkhorn loop iterations spent at
                            # step t (0 when the gate did not fire, or on
                            # non-streaming-OT paths) — the config-5 cost
                            # telemetry behind the warm-start lever


def particle_initialization(
    key: jax.Array,
    start_state: Array,
    width: float,
    num_particles: int,
    state_dim: int = 2,
    init_with_true_state: bool = False,
) -> Tuple[Array, Array]:
    """`utils.py:46-62`: true-state + N(0,1), or uniform over ±width/2."""
    batch = start_state.shape[0]
    if init_with_true_state:
        noise = jax.random.normal(key, (batch, num_particles, state_dim))
        particles = start_state[:, None, :state_dim] + noise
    else:
        particles = jax.random.uniform(
            key, (batch, num_particles, 2),
            minval=-width / 2.0, maxval=width / 2.0,
        )
    return particles, uniform_log_weights(batch, num_particles)


class DPF:
    """Filter engine + model container (reference class `DPF`, `DPFs.py:22`).

    Not a linen module: submodules are applied functionally so the scan body
    stays a pure function.  ``init`` returns a dict-of-variables pytree:

        {"encoder": .., "decoder": .., "nf_dyn": .., "cond_model": ..,
         "measurement": ..}
    """

    def __init__(self, config: DPFConfig, mesh=None):
        self.config = config
        # optional jax.sharding.Mesh ('data', 'particle'): when set, the
        # filter pins particles/weights to the mesh so GSPMD keeps the
        # particle axis sharded across steps (see parallel/mesh.py).
        self.mesh = mesh
        cglow = config.measurement == "CGLOW"
        self.enc_features = config.glow_ctx_features if cglow else config.hidden_size
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        self.encoder = ObservationEncoder(self.enc_features, compute_dtype=dtype,
                                          torch_init=config.torch_init)
        self.decoder = ObservationDecoder(self.enc_features, compute_dtype=dtype,
                                          torch_init=config.torch_init)
        # nf_dyn ctx = mean‖std = 2·state_dim (`DPFs.py:71`);
        # cond_model ctx = enc ‖ mean ‖ std (`DPFs.py:72` uses hidden_size; we
        # use the actual encoder width so CGLOW+NF-cond also composes).
        self.nf_dyn = realnvp_chain(
            config.n_sequence, config.state_dim, config.flow_hidden_dim, 0.01
        )
        self.cond_model = realnvp_chain(
            config.n_sequence, config.state_dim, config.flow_hidden_dim, 0.01
        )
        self.measurement = build_measurement_model(config)

    # ------------------------------------------------------------------
    # initialisation
    # ------------------------------------------------------------------

    def init(self, key: jax.Array) -> Dict[str, Any]:
        cfg = self.config
        k = jax.random.split(key, 5)
        img = jnp.zeros((1, cfg.width, cfg.width, 3))
        enc = jnp.zeros((1, self.enc_features))
        particles = jnp.zeros((1, 2, cfg.state_dim))
        dyn_ctx = jnp.zeros((1, 2, 2 * cfg.state_dim))
        cond_ctx = jnp.zeros((1, 2, 2 * cfg.state_dim + self.enc_features))
        variables = {
            "encoder": self.encoder.init(k[0], img, train=False),
            "decoder": self.decoder.init(k[1], enc, train=False),
            "nf_dyn": self.nf_dyn.init(k[2], particles, dyn_ctx),
            "cond_model": self.cond_model.init(k[3], particles, cond_ctx),
            "measurement": self.measurement.init(k[4], enc, particles),
        }
        return variables

    # ------------------------------------------------------------------
    # sub-model application helpers
    # ------------------------------------------------------------------

    def encode(self, variables, images: Array, train: bool):
        """Apply the conv encoder; returns (encodings, new_batch_stats).

        images: (..., H, W, 3) — any leading batch shape.
        """
        if train:
            enc, updates = self.encoder.apply(
                variables["encoder"], images, train=True,
                mutable=["batch_stats"],
            )
            return enc, updates["batch_stats"]
        enc = self.encoder.apply(variables["encoder"], images, train=False)
        return enc, variables["encoder"].get("batch_stats")

    def decode(self, variables, encodings: Array, train: bool):
        if train:
            img, updates = self.decoder.apply(
                variables["decoder"], encodings, train=True,
                mutable=["batch_stats"],
            )
            return img, updates["batch_stats"]
        img = self.decoder.apply(variables["decoder"], encodings, train=False)
        return img, variables["decoder"].get("batch_stats")

    def _measure_fn(self, variables):
        return lambda enc, particles: self.measurement.apply(
            variables["measurement"], enc, particles
        )

    def _streaming_ot(self) -> bool:
        """True when resampling dispatches to a streaming Pallas Sinkhorn
        path (single-device, data-sharded, or particle-sharded) — all of
        which support potential warm-starting and iteration telemetry."""
        cfg = self.config
        return (cfg.resampler_type == "ot" and cfg.use_pallas
                and not cfg.ot_transport_grad)

    def _resample_streaming(self, particles, probs, warm_state):
        """Streaming-Pallas OT resample with warm-start carry + telemetry.

        warm_state: ((B, 2, N) potentials, scalar-bool valid) from the
        previous firing; the kernel uses it only when
        ``config.sinkhorn_warm_start``.  Under a particle-sharded mesh the
        potentials array is sharded like the particles, so each shard's
        kernel receives/returns exactly its local row block.
        Returns (particles', probs', idx, potentials, iters).
        """
        from nfdpf_tpu.ops.pallas.sinkhorn_pallas import (
            ot_resample_pallas,
            ot_resample_pallas_sharded,
        )
        from nfdpf_tpu.parallel.mesh import DATA_AXIS, PARTICLE_AXIS

        cfg = self.config
        mesh = self.mesh
        pot, pot_valid = warm_state
        if not cfg.sinkhorn_warm_start:
            pot_valid = jnp.asarray(False)
        kw = dict(eps=cfg.epsilon, scaling=cfg.scaling,
                  threshold=cfg.threshold, max_iter=cfg.max_iter,
                  convergence=cfg.sinkhorn_convergence,
                  warm_eps_factor=cfg.sinkhorn_warm_eps_factor)

        if mesh is None or (mesh.shape[DATA_AXIS] == 1
                            and mesh.shape[PARTICLE_AXIS] == 1):
            p, w, idx, extras = ot_resample_pallas(
                particles, probs, warm_start=(pot, pot_valid),
                return_extras=True, **kw,
            )
            return p, w, idx, extras["potentials"], extras["iters"]

        from jax.sharding import PartitionSpec as P

        spec = P(DATA_AXIS, PARTICLE_AXIS)
        pot_spec = P(DATA_AXIS, None, PARTICLE_AXIS)
        if mesh.shape[PARTICLE_AXIS] > 1:
            if particles.shape[1] % mesh.shape[PARTICLE_AXIS]:
                raise ValueError(
                    f"particle count {particles.shape[1]} not divisible by "
                    f"particle-axis size {mesh.shape[PARTICLE_AXIS]}"
                )
            fn = jax.shard_map(
                lambda p_, w_, po_, v_: ot_resample_pallas_sharded(
                    p_, w_, particle_axis=PARTICLE_AXIS,
                    data_axis=DATA_AXIS, warm_start=(po_, v_),
                    return_extras=True, **kw),
                mesh=mesh,
                in_specs=(P(DATA_AXIS, PARTICLE_AXIS, None), spec,
                          pot_spec, P()),
                out_specs=(P(DATA_AXIS, PARTICLE_AXIS, None), spec, spec,
                           {"potentials": pot_spec, "iters": P()}),
                check_vma=False,
            )
        else:
            if particles.shape[0] % mesh.shape[DATA_AXIS]:
                raise ValueError(
                    f"batch {particles.shape[0]} not divisible by "
                    f"data-axis size {mesh.shape[DATA_AXIS]}"
                )
            fn = jax.shard_map(
                lambda p_, w_, po_, v_: ot_resample_pallas(
                    p_, w_, axis_name=DATA_AXIS, warm_start=(po_, v_),
                    return_extras=True, **kw),
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                           {"potentials": P(DATA_AXIS), "iters": P()}),
                check_vma=False,
            )
        p, w, idx, extras = fn(particles, probs, pot, pot_valid)
        return p, w, idx, extras["potentials"], extras["iters"]

    def _resample(self, key, particles, probs):
        cfg = self.config
        if cfg.resampler_type == "soft":
            return soft_systematic_resample(key, particles, probs, cfg.alpha)
        if cfg.resampler_type == "ot":
            if cfg.use_pallas and not cfg.ot_transport_grad:
                # flash-style streaming Sinkhorn: O(N·d) HBM traffic instead
                # of materialised (B, N, N) cost matrices — required beyond
                # ~N=8k where the dense path exhausts HBM.  One dispatcher
                # (`_resample_streaming`) serves the filter's warm-start
                # carry AND this plain entry (cold start, extras dropped).
                b, n = probs.shape
                p, w, idx, _, _ = self._resample_streaming(
                    particles, probs,
                    (jnp.zeros((b, 2, n), jnp.float32), jnp.asarray(False)),
                )
                return p, w, idx
            return ot_resample(
                particles, probs, eps=cfg.epsilon, scaling=cfg.scaling,
                threshold=cfg.threshold, max_iter=cfg.max_iter,
                transport_grad=cfg.ot_transport_grad,
                convergence=cfg.sinkhorn_convergence,
            )
        raise ValueError(f"unknown resampler {cfg.resampler_type!r}")

    # ------------------------------------------------------------------
    # the filter
    # ------------------------------------------------------------------

    def filter_from_encodings(
        self,
        variables,
        encodings: Array,       # (B, T, h) — precomputed, one big conv pass
        start_state: Array,     # (B, 4) pos+vel
        vel_seq: Array,         # (B, T, 2) teacher-forced velocity inputs
        key: jax.Array,
        train: bool = True,
        images_seq: Array | None = None,
    ):
        """Run the filter scan.

        Default (``images_seq=None``): per-step encodings come from the
        hoisted pre-scan conv pass; returns ``FilterOutput``.

        ``images_seq`` set (reference-parity ablation ``encode_per_step``):
        the conv encoder runs INSIDE the scan on each step's (B, H, W, 3)
        frame — BN batch statistics over the B frames of that step, running
        stats updated step-by-step, exactly the reference's per-step encode
        (`DPFs.py:177`).  Returns ``(FilterOutput, encodings, batch_stats)``.
        """
        cfg = self.config
        batch, seq_len = vel_seq.shape[:2]
        n = cfg.num_particles
        per_step_encode = images_seq is not None

        from nfdpf_tpu.parallel.mesh import constrain

        k_init, k_scan = jax.random.split(key)
        particles, init_w_log = particle_initialization(
            k_init, start_state[:, :2], cfg.width, n, cfg.state_dim,
            cfg.init_with_true_state,
        )
        particles = constrain(particles, self.mesh, "data", "particle")
        probs = normalize_log_weights(init_w_log)
        probs = constrain(probs, self.mesh, "data", "particle")
        vel0 = start_state[:, 2:]

        measure_fn = self._measure_fn(variables)

        # optional fused Pallas coupling path: pack the chain weights ONCE
        # outside the scan (loop-invariant; gradients flow back through the
        # pack).  state_dim 2 is the kernel's supported configuration.
        fused_dyn = fused_cond = None
        if cfg.pallas_coupling and cfg.state_dim == 2:
            from nfdpf_tpu.ops.pallas.coupling_pallas import pack_chain_params

            if cfg.nf_dyn:
                fused_dyn = pack_chain_params(
                    variables["nf_dyn"], cfg.n_sequence, 2 * cfg.state_dim,
                    cfg.flow_hidden_dim,
                )
            if cfg.nf_cond:
                fused_cond = pack_chain_params(
                    variables["cond_model"], cfg.n_sequence,
                    2 * cfg.state_dim + self.enc_features,
                    cfg.flow_hidden_dim,
                )

        streaming_ot = self._streaming_ot()
        warm = cfg.sinkhorn_warm_start
        if warm and not streaming_ot:
            raise ValueError(
                "sinkhorn_warm_start requires the streaming Pallas OT path "
                "(resampler_type='ot', use_pallas=True, "
                "ot_transport_grad=False)"
            )

        def step(carry, xs):
            if per_step_encode:
                enc_bn = carry[-1]
                carry = carry[:-1]
            if streaming_ot:
                particles, probs, vel, obs_lik, key, pot, pot_valid = carry
            else:
                particles, probs, vel, obs_lik, key = carry
            enc_t, vel_t = xs
            if per_step_encode:
                # enc_t is this step's (B, H, W, 3) frame: encode it here
                # with BN batch statistics over these B frames, threading the
                # running stats through the carry (`DPFs.py:177` semantics)
                enc_t, upd = self.encoder.apply(
                    {"params": variables["encoder"]["params"],
                     "batch_stats": enc_bn},
                    enc_t, train=train, mutable=["batch_stats"],
                )
                enc_bn = upd["batch_stats"]
            key, k_rs, k_motion = jax.random.split(key, 3)

            ess = effective_sample_size(probs)
            gate = ess < cfg.ess_threshold * n
            idx0 = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None, :], (batch, n)
            )
            if streaming_ot:
                # potentials from the previous firing ride the carry; the
                # skip branch passes them through untouched, so warm starts
                # survive gate-closed steps
                def _fire():
                    p, w, i, pots, iters = self._resample_streaming(
                        particles, probs, (pot, pot_valid)
                    )
                    return p, w, i, pots, jnp.asarray(True), iters
                particles_r, probs_r, idx, pot, pot_valid, sk_iters = (
                    jax.lax.cond(
                        gate, _fire,
                        lambda: (particles, probs, idx0, pot, pot_valid,
                                 jnp.asarray(0, jnp.int32)),
                    )
                )
            else:
                particles_r, probs_r, idx = jax.lax.cond(
                    gate,
                    lambda: self._resample(k_rs, particles, probs),
                    lambda: (particles, probs, idx0),
                )
                sk_iters = jnp.asarray(0, jnp.int32)
            log_probs_r = jnp.log(probs_r)

            particles_phys, noise = motion_update(
                k_motion, particles_r, vel, cfg.pos_noise
            )
            new_vel = vel_t                                   # DPFs.py:173

            particles_dyn, jac = nf_dynamic_model(
                self.nf_dyn, variables["nf_dyn"], particles_phys,
                use_nf=cfg.nf_dyn, fused=fused_dyn,
            )

            propose, lki_log, prior_log, propose_log = proposal_likelihood(
                self.cond_model, variables["cond_model"],
                self.nf_dyn, variables["nf_dyn"],
                measure_fn,
                particles_dyn, particles_phys, enc_t, noise, jac,
                cfg.nf_dyn, cfg.nf_cond, cfg.pos_noise, cfg.vel_noise,
                fused_dyn=fused_dyn, fused_cond=fused_cond,
            )

            log_w = log_probs_r + lki_log + prior_log - propose_log
            obs_lik = obs_lik + jnp.mean(log_w)               # DPFs.py:191
            new_probs = normalize_log_weights(log_w) + 1e-12  # DPFs.py:192

            propose = constrain(propose, self.mesh, "data", "particle")
            new_probs = constrain(new_probs, self.mesh, "data", "particle")
            if streaming_ot:
                carry = (propose, new_probs, new_vel, obs_lik, key, pot,
                         pot_valid)
            else:
                carry = (propose, new_probs, new_vel, obs_lik, key)
            ys = (propose, new_probs, noise, lki_log, idx, jac, prior_log,
                  gate, sk_iters)
            if per_step_encode:
                carry = carry + (enc_bn,)
                ys = ys + (enc_t,)
            return carry, ys

        if cfg.remat_scan_step:
            step = jax.checkpoint(step)

        xs = (
            jnp.moveaxis(images_seq if per_step_encode else encodings,
                         0, 1),              # (T, B, h) or (T, B, H, W, 3)
            jnp.moveaxis(vel_seq, 0, 1),     # (T, B, 2)
        )
        carry0 = (particles, probs, vel0, jnp.asarray(0.0), k_scan)
        if streaming_ot:
            pot0 = constrain(jnp.zeros((batch, 2, n), jnp.float32),
                             self.mesh, "data", None, "particle")
            carry0 = carry0 + (pot0, jnp.asarray(False))
        if per_step_encode:
            carry0 = carry0 + (variables["encoder"]["batch_stats"],)
        carry, ys = jax.lax.scan(step, carry0, xs)
        enc_hist = None
        if per_step_encode:
            enc_hist = ys[-1]
            ys = ys[:-1]
        (p_hist, w_hist, n_hist, l_hist, i_hist, j_hist, pr_hist,
         g_hist, sk_hist) = ys

        t_to_b = lambda a: jnp.moveaxis(a, 0, 1)  # noqa: E731  (T,B,...)→(B,T,...)
        out = FilterOutput(
            particles=t_to_b(p_hist),
            weights=t_to_b(w_hist),
            noise=t_to_b(n_hist),
            likelihoods=t_to_b(l_hist),
            indices=t_to_b(i_hist),
            jacobians=t_to_b(j_hist),
            priors=t_to_b(pr_hist),
            init_weights_log=init_w_log,
            obs_likelihood=carry[3],
            resampled=g_hist,
            sinkhorn_iters=sk_hist,
        )
        if per_step_encode:
            return out, t_to_b(enc_hist), carry[-1]
        return out

    def filter(
        self,
        variables,
        images: Array,          # (B, T, H, W, 3)
        start_state: Array,
        vel_seq: Array,
        key: jax.Array,
        train: bool = True,
    ) -> Tuple[FilterOutput, Array, Any]:
        """Full pass: encode all frames once, then scan.

        Returns (FilterOutput, encodings (B,T,h), new encoder batch_stats).

        With ``config.encode_per_step`` and ``train=True``, the encoder runs
        inside the scan instead (reference-parity ablation: per-step BN
        batch statistics, `DPFs.py:177`).  Eval is unaffected — BN eval mode
        uses running statistics, so hoisted and per-step encodes are the
        same function.
        """
        if self.config.encode_per_step and train:
            return self.filter_from_encodings(
                variables, None, start_state, vel_seq, key, train,
                images_seq=images,
            )
        b, t = images.shape[:2]
        enc_flat, bn = self.encode(
            variables, images.reshape((b * t,) + images.shape[2:]), train
        )
        encodings = enc_flat.reshape(b, t, -1)
        out = self.filter_from_encodings(
            variables, encodings, start_state, vel_seq, key, train
        )
        return out, encodings, bn
