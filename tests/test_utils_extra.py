"""Freeze utilities + skew-t artifact + metrics logger."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nfdpf_tpu.data.skew_t_plot import hansen_skew_t_pdf, main as skew_main
from nfdpf_tpu.utils.freeze import frozen_mask, masked_optimizer
from nfdpf_tpu.utils.metrics import MetricsLogger


def test_masked_optimizer_freezes_modules():
    params = {
        "encoder": {"w": jnp.ones(3)},
        "flow": {"w": jnp.ones(3)},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    tx = masked_optimizer(optax.sgd(0.1), params, frozen=("encoder",))
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["encoder"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(new["flow"]["w"]), 0.9)


def test_frozen_mask_shape():
    params = {"a": {"x": jnp.zeros(2)}, "b": {"y": jnp.zeros(2)}}
    mask = frozen_mask(params, ["a"])
    assert mask["a"]["x"] is True and mask["b"]["y"] is False


def test_skew_t_pdf_properties(tmp_path):
    x = np.linspace(-30, 30, 20001)
    pdf = hansen_skew_t_pdf(x, eta=5.0, lam=0.5)
    assert np.all(pdf >= 0)
    integral = np.trapezoid(pdf, x)
    assert abs(integral - 1.0) < 1e-2
    # symmetric case reduces to standardised t
    pdf_sym = hansen_skew_t_pdf(x, eta=5.0, lam=0.0)
    np.testing.assert_allclose(pdf_sym, pdf_sym[::-1], rtol=1e-10)
    out = str(tmp_path / "skew.png")
    skew_main(out)
    assert os.path.exists(out)


def test_metrics_logger_jsonl(tmp_path):
    log_dir = str(tmp_path / "logs")
    logger = MetricsLogger(log_dir, tensorboard=False)
    logger.scalar("Sup_loss/loss", 1.25, 3)
    logger.close()
    lines = open(os.path.join(log_dir, "metrics.jsonl")).readlines()
    rec = json.loads(lines[0])
    assert rec["tag"] == "Sup_loss/loss" and rec["value"] == 1.25


def test_throughput_meter():
    from nfdpf_tpu.utils.profiling import ThroughputMeter

    meter = ThroughputMeter(batch=2, particles=10, seq_len=5, warmup=1)
    x = jnp.ones(4)
    for _ in range(4):
        meter.tick(x)
    rate = meter.rate(x)
    assert rate > 0


def test_profiler_trace(tmp_path):
    from nfdpf_tpu.utils.profiling import trace

    with trace(str(tmp_path / "prof")):
        _ = jnp.arange(8.0) * 2
    assert os.path.isdir(tmp_path / "prof")
