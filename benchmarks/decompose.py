"""Decompose the N=100 train-step time: which phase holds the residual?

Times (scan-loop methodology, bench.py) for the bench workload
(B=32, N=100, T=50, OT, bf16): full train step, loss forward only,
filter forward only, encoder-only fwd, AE (encode+decode) fwd.

Each timed function takes a loop-carried scalar ``c`` (≈1e-30·previous
output) that is folded into its inputs — without this the scan body is
loop-invariant and XLA hoists the entire computation out of the loop,
"measuring" 1/iters of a single execution (the round-1 methodology trap,
BASELINE.md).

    python benchmarks/decompose.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nfdpf_tpu.config import DPFConfig
from nfdpf_tpu.train import Trainer, _merge_variables

B, N, T = 32, 100, 50


def timeit(fn, data, iters=20, repeats=3):
    """fn(c: f32 scalar, data) -> f32 scalar; chained through the scan
    carry.  ``data`` (the big tensors) rides as a traced ARGUMENT — closing
    over it would embed it as constants in the uploaded program (HTTP 413
    on the remote-compile tunnel)."""

    @jax.jit
    def run_k(c0, data):
        def body(c, _):
            out = fn(c, data)
            return out * 1e-30, out
        c, outs = jax.lax.scan(body, c0, None, length=iters)
        return outs[-1] + c

    float(run_k(jnp.asarray(0.0), data))      # warmup + completion barrier
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run_k(jnp.asarray(float(r) * 1e-9), data))
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def padd(tree, c):
    return jax.tree_util.tree_map(lambda x: x + c.astype(x.dtype), tree)


def tsum(tree):
    return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def main():
    cfg = DPFConfig(num_particles=N, sequence_length=T, batch_size=B,
                    resampler_type="ot", measurement="cos",
                    compute_dtype="bfloat16")
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = {
        "image": jax.random.uniform(ks[0], (B, T, cfg.width, cfg.width, 3)),
        "state": jax.random.normal(ks[1], (B, T, 4)) * 10,
        "start_state": jax.random.normal(ks[2], (B, 4)) * 10,
    }
    key = jax.random.PRNGKey(2)
    engine = trainer.engine
    variables = _merge_variables(state.params, state.rest)
    images_flat = batch["image"].reshape((B * T,) + batch["image"].shape[2:])

    import optax

    def full_step(c, bt):
        p = padd(state.params, c)
        (loss, aux), grads = jax.value_and_grad(
            trainer._loss, has_aux=True)(p, state.rest, bt, key, True)
        upd, _ = trainer.tx.update(grads, state.opt_state, p)
        p2 = optax.apply_updates(p, upd)
        return tsum(p2["encoder"]) + loss

    def loss_fwd(c, bt):
        loss, _ = trainer._loss(padd(state.params, c), state.rest, bt,
                                key, True)
        return loss

    def filter_fwd(c, bt):
        out, _, _ = engine.filter(padd(variables, c), bt["image"],
                                  bt["start_state"],
                                  bt["state"][..., 2:], key, train=True)
        return out.obs_likelihood

    def encoder_fwd(c, imgs):
        enc, _ = engine.encode(padd(variables, c), imgs, train=True)
        return jnp.sum(enc.astype(jnp.float32))

    def ae_fwd(c, imgs):
        v = padd(variables, c)
        enc, _ = engine.encode(v, imgs, train=True)
        dec, _ = engine.decode(v, enc, train=True)
        return jnp.sum(dec.astype(jnp.float32))

    def enc_grad(c, imgs):
        def f(p):
            v = _merge_variables(p, state.rest)
            enc, _ = engine.encode(v, imgs, train=True)
            return jnp.sum(enc.astype(jnp.float32))
        return tsum(jax.grad(f)(padd(state.params, c))["encoder"])

    def ae_grad(c, imgs):
        def f(p):
            v = _merge_variables(p, state.rest)
            enc, _ = engine.encode(v, imgs, train=True)
            dec, _ = engine.decode(v, enc, train=True)
            return jnp.mean((dec - imgs) ** 2)
        return tsum(jax.grad(f)(padd(state.params, c))["encoder"])

    import flax.struct  # noqa: F401

    def timeit_chained(iters=20, repeats=3, chain_rest=True):
        """bench.py-exact: the full TrainState rides the scan carry."""
        @jax.jit
        def run_k(st, bt, k):
            def body(carry, _):
                s, ky = carry
                ky, sub = jax.random.split(ky)
                (loss, aux), grads = jax.value_and_grad(
                    trainer._loss, has_aux=True
                )(s.params, s.rest, bt, sub, True)
                upd, opt_state = trainer.tx.update(grads, s.opt_state,
                                                   s.params)
                params = optax.apply_updates(s.params, upd)
                s = s.replace(
                    params=params, opt_state=opt_state,
                    rest=aux["new_rest"] if chain_rest else s.rest)
                return (s, ky), loss
            (st, _), losses = jax.lax.scan(body, (st, k), None,
                                           length=iters)
            return st, losses[-1]

        st, loss = run_k(state, batch, jax.random.PRNGKey(5))
        float(loss)
        times = []
        for r in range(repeats):
            t0 = time.perf_counter()
            st, loss = run_k(st, batch, jax.random.PRNGKey(50 + r))
            float(loss)
            times.append((time.perf_counter() - t0) / iters)
        times.sort()
        return times[len(times) // 2]

    rows = [
        ("full train step (fwd+bwd+adam)", full_step, batch),
        ("loss forward only", loss_fwd, batch),
        ("filter forward (incl. encoder)", filter_fwd, batch),
        ("encoder fwd (B*T frames)", encoder_fwd, images_flat),
        ("encoder+decoder fwd (AE path)", ae_fwd, images_flat),
        ("encoder fwd+bwd", enc_grad, images_flat),
        ("AE fwd+bwd", ae_grad, images_flat),
    ]
    for name, f, data in rows:
        dt = timeit(f, data)
        print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)
    dt = timeit_chained()
    print(f"{'bench-exact chained step':36s} {dt*1e3:8.2f} ms", flush=True)
    dt = timeit_chained(chain_rest=False)
    print(f"{'chained step, BN stats NOT chained':36s} {dt*1e3:8.2f} ms",
          flush=True)

    def timeit_chain_sel(chain_params, chain_opt, vary_key,
                         iters=20, repeats=3):
        """Chain selected pieces of the state; isolate what costs."""
        @jax.jit
        def run_k(st, bt, k):
            def body(carry, i):
                s, ky = carry
                sub = jax.random.fold_in(ky, i) if vary_key else ky
                (loss, aux), grads = jax.value_and_grad(
                    trainer._loss, has_aux=True
                )(s.params, s.rest, bt, sub, True)
                upd, opt_state = trainer.tx.update(grads, s.opt_state,
                                                   s.params)
                params = optax.apply_updates(s.params, upd)
                s = s.replace(
                    params=params if chain_params else s.params,
                    opt_state=opt_state if chain_opt else s.opt_state)
                extra = (tsum(params["encoder"])
                         if not chain_params else 0.0)
                return (s, ky), loss + extra
            (st, _), losses = jax.lax.scan(
                body, (st, k), jnp.arange(iters))
            return st, losses[-1]

        st, loss = run_k(state, batch, jax.random.PRNGKey(5))
        float(loss)
        times = []
        for r in range(repeats):
            t0 = time.perf_counter()
            st, loss = run_k(st, batch, jax.random.PRNGKey(50 + r))
            float(loss)
            times.append((time.perf_counter() - t0) / iters)
        times.sort()
        return times[len(times) // 2]

    for cp, co, vk in ((True, True, True), (True, True, False),
                       (True, False, True), (False, False, True),
                       (False, False, False)):
        dt = timeit_chain_sel(cp, co, vk)
        print(f"chain params={int(cp)} opt={int(co)} varykey={int(vk)}"
              f"        {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
