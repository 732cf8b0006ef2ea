"""bfloat16 compute path (``--compute-dtype bfloat16``).

Params stay f32; only conv/matmul compute runs in bf16
(`nfdpf_tpu/models/nets.py`).  Same init key ⇒ identical params in both
modes, so outputs must agree within bf16 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.train import Trainer


def _cfg(dtype):
    return DPFConfig(
        num_particles=12, sequence_length=4, batch_size=2,
        resampler_type="soft", measurement="cos", compute_dtype=dtype,
    )


def _batch(key, cfg):
    ks = jax.random.split(key, 3)
    t = cfg.sequence_length
    return {
        "image": jax.random.uniform(ks[0], (2, t, 128, 128, 3)),
        "state": jax.random.normal(ks[1], (2, t, 4)) * 10,
        "start_state": jax.random.normal(ks[2], (2, 4)) * 10,
    }


def test_bf16_matches_f32_within_tolerance():
    outs = {}
    for dtype in ("float32", "bfloat16"):
        cfg = _cfg(dtype)
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _batch(jax.random.PRNGKey(1), cfg)
        eval_step = trainer.make_eval_step()
        m, aux = eval_step(state, batch, jax.random.PRNGKey(2))
        outs[dtype] = (
            float(m["loss_sup"]),
            np.asarray(aux["predictions"], dtype=np.float32),
        )
    loss32, pred32 = outs["float32"]
    loss16, pred16 = outs["bfloat16"]
    # bf16 has ~3 significant decimal digits; the filter is a weighted mean
    # over particles so positional error stays sub-pixel
    assert abs(loss16 - loss32) / max(abs(loss32), 1e-6) < 0.05
    assert np.max(np.abs(pred16 - pred32)) < 1.0   # px


def test_bf16_train_step_runs_and_updates():
    cfg = _cfg("bfloat16")
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), cfg)
    step = trainer.make_train_step()
    before = jax.device_get(state.params["encoder"])
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(metrics["loss"]))
    # params remain f32 (master weights) and received a gradient
    leaves = jax.tree_util.tree_leaves(state.params["encoder"])
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    b0 = jax.tree_util.tree_leaves(before)
    b1 = jax.tree_util.tree_leaves(state.params["encoder"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(b0, b1))
