"""Benchmark: training-step throughput (rays/s) on the flagship DM-SR config.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": R}

Config matches the reference's training schedule (BASELINE.md): 3072 rays/step,
64 coarse + 128 fine samples/ray, ins_num=32, Hungarian instance loss + emptiness
penalizer, Adam — the full fused train step, forward+backward+update.

vs_baseline: the reference repo publishes NO numbers (BASELINE.md), so the denominator
is MEASURED by running the actual PyTorch reference implementation (mounted read-only
at /root/reference, imported in-place, never copied) on the same host with the same
batch geometry. Only CPU torch is available here, so the ratio is TPU-chip vs
host-CPU; the measurement is cached in .bench_baseline.json. All diagnostics go to
stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_baseline.json")

N_RAYS = 3072
N_SAMPLES = 64
N_IMPORTANCE = 128
INS_NUM = 32
WARMUP = 3
ITERS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from dmnerf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from dmnerf_tpu.configs import Config
    from dmnerf_tpu.render.trainstep import Batch, create_train_state, make_train_step

    cfg = Config(
        N_train=N_RAYS, N_samples=N_SAMPLES, N_importance=N_IMPORTANCE,
        near=2.0, far=7.0, ins_num=INS_NUM, perturb=1.0,
        penalize=True, tolerance=0.05, deta_w=0.05,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)

    rng = np.random.RandomState(0)
    rays_d = rng.randn(N_RAYS, 3).astype(np.float32)
    rays_d[:, 2] = np.abs(rays_d[:, 2]) + 1.0
    batch = Batch(
        rays_o=jnp.zeros((N_RAYS, 3), jnp.float32),
        rays_d=jnp.asarray(rays_d),
        target_c=jnp.asarray(rng.rand(N_RAYS, 3).astype(np.float32)),
        target_i=jnp.asarray(rng.randint(0, 8, size=N_RAYS)),
    )
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
    jax.block_until_ready(state.params_fine)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
    jax.block_until_ready(state.params_fine)
    dt = time.perf_counter() - t0
    rays_s = N_RAYS * ITERS / dt
    log(f"[bench] tpu train step: {dt/ITERS*1e3:.2f} ms/step, {rays_s:,.0f} rays/s "
        f"(loss {float(aux['total_loss']):.4f})")
    return rays_s


REF_RAYS = 512   # reference measured at a smaller ray count (cost is linear in rays;
                 # full 3072-ray torch-CPU steps take minutes on this 2-vCPU host)


def bench_reference_cpu() -> float:
    """Run the actual PyTorch reference train step (imported from /root/reference,
    read-only) on host CPU with identical batch geometry."""
    import types

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from networks.dm_nerf import DM_NeRF, get_embedder
        from networks.evaluator import img2mse, ins_criterion
        from networks.penalizer import ins_penalizer
        from networks.render import dm_nerf as ref_dm_nerf
        from networks.helpers import z_val_sample as ref_z_val_sample
    finally:
        sys.path.pop(0)
    torch.autograd.set_detect_anomaly(False)  # fair timing: drop the reference's debug tax
    torch.manual_seed(0)

    args = types.SimpleNamespace(
        perturb=1.0, N_importance=N_IMPORTANCE, is_train=True, N_ins=None,
        penalize=True, tolerance=0.05, deta_w=0.05, ins_num=INS_NUM,
    )
    pos_emb, ch_pos = get_embedder(10, 0)
    view_emb, ch_view = get_embedder(4, 0)
    coarse = DM_NeRF(8, 256, ch_pos, ch_view, [4], INS_NUM)
    fine = DM_NeRF(8, 256, ch_pos, ch_view, [4], INS_NUM)
    opt = torch.optim.Adam(list(coarse.parameters()) + list(fine.parameters()), lr=5e-4)

    rng = np.random.RandomState(0)
    rays_d = rng.randn(REF_RAYS, 3).astype(np.float32)
    rays_d[:, 2] = np.abs(rays_d[:, 2]) + 1.0
    rays = torch.stack([torch.zeros(REF_RAYS, 3), torch.from_numpy(rays_d)], 0)
    target_c = torch.from_numpy(rng.rand(REF_RAYS, 3).astype(np.float32))
    target_i = torch.from_numpy(rng.randint(0, 8, size=REF_RAYS))
    z_coarse = ref_z_val_sample(REF_RAYS, 2.0, 7.0, N_SAMPLES)

    def one_step():
        info = ref_dm_nerf(rays, pos_emb, view_emb, coarse, fine, z_coarse, args)
        loss = img2mse(info["rgb_coarse"], target_c) + img2mse(info["rgb_fine"], target_c)
        loss = loss + ins_criterion(info["ins_coarse"], target_i, INS_NUM)[0]
        loss = loss + ins_criterion(info["ins_fine"], target_i, INS_NUM)[0]
        loss = loss + ins_penalizer(info["raw_coarse"], info["z_vals_coarse"],
                                    info["depth_coarse"], rays[1], args)
        loss = loss + ins_penalizer(info["raw_fine"], info["z_vals_fine"],
                                    info["depth_fine"], rays[1], args)
        opt.zero_grad()
        loss.backward()
        opt.step()

    one_step()  # warmup
    n = 2
    t0 = time.perf_counter()
    for _ in range(n):
        one_step()
    dt = time.perf_counter() - t0
    rays_s = REF_RAYS * n / dt
    log(f"[bench] reference torch-cpu step: {dt/n*1e3:.1f} ms/step, {rays_s:,.0f} rays/s")
    return rays_s


def get_baseline() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["reference_cpu_rays_per_sec"]
    try:
        base = bench_reference_cpu()
    except Exception as e:  # reference unavailable -> record the failure, use 1.0
        log(f"[bench] reference measurement failed: {e!r}")
        base = float("nan")
    with open(CACHE, "w") as f:
        json.dump({"reference_cpu_rays_per_sec": base,
                   "note": "measured from /root/reference on host CPU (no GPU available); "
                           "denominator for vs_baseline"}, f)
    return base


def main():
    baseline = get_baseline()
    rays_s = bench_tpu()
    vs = rays_s / baseline if baseline and np.isfinite(baseline) else None
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
