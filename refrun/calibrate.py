"""Calibrate the PyTorch reference's CPU step time on this host.

Builds the reference DPF at a given config, feeds one synthetic batch, and
times forward+backward+step so we can size a tractable head-to-head protocol.
"""
import sys, time
import numpy as np
import torch

sys.path.insert(0, "/root/repo/refrun")
from arguments import parse_args
from DPFs import DPF

torch.set_num_threads(2)


def timeit(B, T, N, resampler, iters=2):
    sys.argv = ["x", "--batchsize", str(B), "--num-particles", str(N),
                "--sequence-length", str(T), "--resampler_type", resampler]
    args = parse_args()
    torch.manual_seed(0)
    np.random.seed(0)
    dpf = DPF(args)
    start_image = torch.rand(B, 128, 128, 3)
    start_state = torch.rand(B, 4) * 50 + 30
    image = torch.rand(B, T, 128, 128, 3)
    state = torch.rand(B, T, 4) * 50 + 30
    q = torch.full((B, T, 2), 2.0)
    visible = torch.ones(B, T)
    inputs = (start_image, start_state, image, state, q, visible)
    # warmup one forward
    t0 = time.time()
    loss, *_ = dpf.forward(inputs, train=True)
    fwd = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        dpf.optim.zero_grad()
        loss, *_ = dpf.forward(inputs, train=True)
        loss.backward()
        dpf.optim.step()
    full = (time.time() - t0) / iters
    print(f"B={B} T={T} N={N} {resampler}: fwd={fwd:.1f}s full_step={full:.1f}s",
          flush=True)
    return full


if __name__ == "__main__":
    timeit(16, 50, 100, "ot", iters=1)
    timeit(16, 50, 100, "soft", iters=1)
