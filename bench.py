"""Benchmark harness: train + render throughput, fp32 + bf16, MFU, kernel parity.

Prints ONE JSON line with the headline metric plus a detail block:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": R,
   "detail": {"train_fp32": {...}, "train_bf16": {...}, "render_fp32": {...},
              "render_bf16": {...}, "mfu": {...}, "kernel_parity": {...}}}

Config matches the reference's training schedule (BASELINE.md): 3072 rays/step,
64 coarse + 128 fine samples/ray, ins_num=32, Hungarian instance loss + emptiness
penalizer, Adam — the full fused train step, forward+backward+update. The render
bench sweeps a 256x256 image through the chunked image renderer (the tester path,
reference networks/tester.py:62-76).

vs_baseline: the reference repo publishes NO numbers (BASELINE.md), so the
denominator is MEASURED by running the actual PyTorch reference implementation
(mounted read-only at /root/reference, imported in-place, never copied) on the same
host with the same batch geometry. Only CPU torch is available here, so the ratio is
TPU-chip vs host-CPU — recorded as such in the detail block (denominator_kind), NOT
presented as a GPU comparison. The measurement is cached in .bench_baseline.json.

MFU: analytic matmul FLOPs (PE/compositor/losses excluded — a strict lower bound on
real work) against the chip's published dense-bf16 peak. See docs/PERF.md for the
roofline discussion. bf16 numbers carry a parity gate: 5 train steps from identical
init must stay within 1 dB fine-PSNR of fp32.

Kernel parity (--kernel-parity also runs by default on TPU): the COMPILED Pallas
fused PE+MLP kernel vs the XLA path at the flagship fine-pass shape, max|Δ| gated.

All diagnostics go to stderr; stdout carries exactly the one JSON line.
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
RENDER_H = RENDER_W = 256
RENDER_REPS = 5   # isolated render timing is stable to <1 ms at 5 reps;
                  # 3 reps right after the train section read ~6% high

# published dense peak FLOP/s by device kind (bf16 MXU). fp32 on TPU runs through
# the MXU at a fraction of bf16 (precision=HIGHEST uses multi-pass bf16); we report
# achieved TFLOP/s plus MFU vs the bf16 peak for both, with the peak recorded.
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _make_cfg(precision: str):
    from dmnerf_tpu.configs import Config

    return Config(
        N_train=N_RAYS, N_samples=N_SAMPLES, N_importance=N_IMPORTANCE,
        # N_test=2048: the r4 render chunk re-sweep optimum (2048 < 4096 < 8192
        # after the fused-composite change; scripts/dev/render_probe2.py)
        N_test=2048, near=2.0, far=7.0, ins_num=INS_NUM, perturb=1.0,
        penalize=True, tolerance=0.05, deta_w=0.05, precision=precision,
    )


def _make_batch(dense_ins: bool = False):
    """dense_ins=False: labels drawn from 8 instances — the typical-scene case
    (valid~8 rows in the dynamic-trip Hungarian). dense_ins=True: every one of
    the INS_NUM labels present (valid=INS_NUM), the JV solve's worst case — the
    regime real many-instance ScanNet scenes hit (VERDICT r3 weak #3)."""
    import jax.numpy as jnp
    from dmnerf_tpu.render.trainstep import Batch

    rng = np.random.RandomState(0)
    rays_d = rng.randn(N_RAYS, 3).astype(np.float32)
    rays_d[:, 2] = np.abs(rays_d[:, 2]) + 1.0
    if dense_ins:
        target_i = np.arange(N_RAYS) % INS_NUM  # all INS_NUM labels present
    else:
        target_i = rng.randint(0, 8, size=N_RAYS)
    return Batch(
        rays_o=jnp.zeros((N_RAYS, 3), jnp.float32),
        rays_d=jnp.asarray(rays_d),
        target_c=jnp.asarray(rng.rand(N_RAYS, 3).astype(np.float32)),
        target_i=jnp.asarray(target_i),
    )


def analytic_matmul_flops(cfg) -> dict:
    """Per-step matmul FLOPs (2*in*out per point), fwd and train(~3x fwd: dx+dW)."""
    from dmnerf_tpu.core.embedding import embed_dim

    D, W = cfg.netdepth, cfg.netwidth
    cp, cv = embed_dim(cfg.multires), embed_dim(cfg.multires_views)
    dims = []
    in_dim = cp
    for i in range(D):
        dims.append((in_dim, W))
        in_dim = W + cp if i in cfg.skips else W
    dims += [(W, 1), (W, W), (W + cv, W // 2), (W // 2, 3),          # density + rgb head
             (W, W), (W, W // 2), (W // 2, cfg.ins_num + 1)]          # ins head
    per_point = 2 * sum(i * o for i, o in dims)
    pts_coarse = N_RAYS * cfg.N_samples
    pts_fine = N_RAYS * (cfg.N_samples + cfg.N_importance)
    fwd = per_point * (pts_coarse + pts_fine)
    return {"fwd_flops": fwd, "train_flops": 3 * fwd, "per_point_flops": per_point}


def bench_train(precision: str, dense_ins: bool = False) -> dict:
    import jax

    cfg = _make_cfg(precision)
    from dmnerf_tpu.render.trainstep import create_train_state, make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    batch = _make_batch(dense_ins=dense_ins)
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
    ms = dt / ITERS * 1e3
    rays_s = N_RAYS * ITERS / dt
    tag = f"{precision}{' dense_ins' if dense_ins else ''}"
    out = {"ms_per_step": round(ms, 2), "rays_per_sec": round(rays_s, 1),
           "loss": round(float(aux["total_loss"]), 4)}
    if dense_ins:
        out["n_instances_present"] = INS_NUM
        # keep the schema uniform with the train_fp32 row so BENCH_r0x JSON
        # diffs line up field-by-field (ADVICE r4)
        out["psnr_at_5_steps"] = None
        psnr_txt = ""
    else:
        psnr5 = _psnr_after_5_steps(cfg)
        out["psnr_at_5_steps"] = round(psnr5, 3)
        psnr_txt = f", psnr@5 {psnr5:.2f}"
    log(f"[bench] train {tag}: {ms:.2f} ms/step, {rays_s:,.0f} rays/s "
        f"(loss {float(aux['total_loss']):.4f}{psnr_txt})")
    return out


def bench_train_packed(precision: str, pack: int = 10) -> dict:
    """Scan-packed train throughput (cfg.steps_per_dispatch mode, train.py
    make_packed_steps): `pack` full sample-free steps fused into one lax.scan
    dispatch. Isolates per-dispatch host/tunnel overhead (~1 ms through the axon
    RPC tunnel, absent on a directly-attached chip) from on-chip step time —
    reported as a detail metric; the headline stays the dispatched mode."""
    import functools

    import jax

    cfg = _make_cfg(precision)
    from dmnerf_tpu.render.trainstep import create_train_state, make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    raw_step = make_train_step(cfg, jit=False)
    batch = _make_batch()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def packed(st, key):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            s, aux = raw_step(s, batch, sub)
            return (s, k), aux["total_loss"]

        (st, key), losses = jax.lax.scan(body, (st, key), None, length=pack)
        return st, key, losses

    key = jax.random.PRNGKey(1)
    for _ in range(2):
        state, key, losses = packed(state, key)
    _ = float(losses[-1])  # scalar read: the only reliable fence under the tunnel
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, key, losses = packed(state, key)
    _ = float(losses[-1])
    dt = time.perf_counter() - t0
    ms = dt / (reps * pack) * 1e3
    rays_s = N_RAYS * reps * pack / dt
    log(f"[bench] train {precision} packed x{pack}: {ms:.2f} ms/step, "
        f"{rays_s:,.0f} rays/s (loss {float(losses[-1]):.4f})")
    return {"ms_per_step": round(ms, 2), "rays_per_sec": round(rays_s, 1),
            "steps_per_dispatch": pack, "loss": round(float(losses[-1]), 4)}


_PSNR5 = {}


def _psnr_after_5_steps(cfg) -> float:
    """Short fixed-schedule fine-PSNR probe: the bf16 parity gate compares this
    against fp32 (identical PRNG keys and batch)."""
    import jax

    from dmnerf_tpu.render.trainstep import create_train_state, make_train_step

    if cfg.precision in _PSNR5:
        return _PSNR5[cfg.precision]
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    batch = _make_batch()
    key = jax.random.PRNGKey(2)
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, aux = step(state, batch, sub)
    _PSNR5[cfg.precision] = float(aux["psnr_fine"])
    return _PSNR5[cfg.precision]


def bench_render(precision: str) -> dict:
    import jax
    import jax.numpy as jnp

    cfg = _make_cfg(precision)
    from dmnerf_tpu.core.rays import rays_from_K
    from dmnerf_tpu.render.renderer import make_image_renderer
    from dmnerf_tpu.render.trainstep import create_train_state

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    renderer = make_image_renderer(cfg)
    K = jnp.asarray([[300.0, 0, RENDER_W / 2], [0, -300.0, RENDER_H / 2], [0, 0, -1.0]])
    c2w = jnp.eye(4)
    ro, rd = rays_from_K(RENDER_H, RENDER_W, K, c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)

    out = renderer(state.params_coarse, state.params_fine, ro, rd)  # compile
    _ = float(jnp.sum(out["rgb"]))  # scalar read: the only reliable fence under axon
    for _ in range(2):  # settle the allocator after the train section
        out = renderer(state.params_coarse, state.params_fine, ro, rd)
    _ = float(jnp.sum(out["rgb"]))
    t0 = time.perf_counter()
    for _ in range(RENDER_REPS):
        out = renderer(state.params_coarse, state.params_fine, ro, rd)
    _ = float(jnp.sum(out["rgb"]))
    dt = (time.perf_counter() - t0) / RENDER_REPS
    n_rays = RENDER_H * RENDER_W
    log(f"[bench] render {precision}: {dt*1e3:.1f} ms/image ({RENDER_H}x{RENDER_W}), "
        f"{n_rays/dt:,.0f} rays/s")
    return {"ms_per_image": round(dt * 1e3, 1), "rays_per_sec": round(n_rays / dt, 1),
            "image": f"{RENDER_H}x{RENDER_W}"}


def bench_mani_render(precision: str, n_targets: int = 1) -> dict:
    """Manipulation-render throughput: the two-pass union-z edit pipeline over a
    full image — the reference's single most expensive path (~6 MLP sweeps per
    chunk, networks/manipulator.py:245-267). n_targets=2 covers the reference's
    mani_mode=multi scaling (manipulator.py:137-205 loops per target)."""
    import jax
    import jax.numpy as jnp

    cfg = _make_cfg(precision)
    from dmnerf_tpu.core.rays import rays_from_K
    from dmnerf_tpu.render.manipulator import make_manipulator_renderer
    from dmnerf_tpu.render.trainstep import create_train_state

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    mani = make_manipulator_renderer(cfg, n_targets=n_targets)
    K = jnp.asarray([[300.0, 0, RENDER_W / 2], [0, -300.0, RENDER_H / 2], [0, 0, -1.0]])
    ro, rd = rays_from_K(RENDER_H, RENDER_W, K, jnp.eye(4))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    # inverse-transformed target bundles for rigid translations (mani_eval pose math)
    offs = [jnp.asarray([0.0, 0.25 * (k + 1), 0.0]) for k in range(n_targets)]
    tar_o = jnp.stack([ro - off for off in offs])
    tar_d = jnp.broadcast_to(rd[None], (n_targets,) + rd.shape)
    labels = tuple(range(1, n_targets + 1))

    out = mani(state.params_coarse, state.params_fine, ro, rd, tar_o, tar_d, labels)
    _ = float(jnp.sum(out["rgb"]))  # execution fence under the axon tunnel
    t0 = time.perf_counter()
    for _ in range(RENDER_REPS):
        out = mani(state.params_coarse, state.params_fine, ro, rd, tar_o, tar_d, labels)
    _ = float(jnp.sum(out["rgb"]))
    dt = (time.perf_counter() - t0) / RENDER_REPS
    n_rays = RENDER_H * RENDER_W
    log(f"[bench] mani_render {precision}: {dt*1e3:.1f} ms/image ({RENDER_H}x{RENDER_W}, "
        f"{n_targets} target(s)), {n_rays/dt:,.0f} rays/s")
    return {"ms_per_image": round(dt * 1e3, 1), "rays_per_sec": round(n_rays / dt, 1),
            "image": f"{RENDER_H}x{RENDER_W}", "n_targets": n_targets}


def bench_mesh_sigma(precision: str, grid_dim: int = 256) -> dict:
    """Mesh-extraction grid-density sweep: grid_dim³ points through the chunked
    sigma query (tools.mesh_extract.make_sigma_query — Pallas path +
    sigma_stub_params). The reference's single biggest inference job
    (/root/reference/tools/mesh_generator.py:27-49); previously a docstring
    figure only (VERDICT r4 weak #4), now gated every run."""
    import jax
    import jax.numpy as jnp

    cfg = _make_cfg(precision)
    from dmnerf_tpu.render.trainstep import create_train_state
    from dmnerf_tpu.tools.mesh_extract import build_grid, make_sigma_query

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    grid = jnp.asarray(build_grid(np.eye(4), np.array([1.9, 7.0, 7.0]), grid_dim))
    query = make_sigma_query(cfg)
    sig = query(state.params_fine, grid)
    _ = float(jnp.sum(sig))  # fence
    t0 = time.perf_counter()
    for _ in range(3):
        sig = query(state.params_fine, grid)
    _ = float(jnp.sum(sig))
    dt = (time.perf_counter() - t0) / 3
    n = grid_dim ** 3
    log(f"[bench] mesh_sigma {precision}: {dt*1e3:.1f} ms / {grid_dim}^3 grid "
        f"({n/dt/1e6:,.1f} Mpts/s)")
    return {"ms_per_sweep": round(dt * 1e3, 1), "mpts_per_sec": round(n / dt / 1e6, 1),
            "grid": f"{grid_dim}^3"}


def bench_kernel_parity() -> dict:
    """COMPILED Pallas fused kernel vs XLA path at the flagship fine-pass shape —
    the on-chip regression net for grid/tiling bugs (interpret-mode CPU tests can't
    see them): FORWARD outputs, BACKWARD parameter cotangents (the kernel's whole
    reason to exist — round 2's PE bug proved compiled-only divergence is real),
    and timings for both directions on both paths."""
    import jax
    import jax.numpy as jnp

    from dmnerf_tpu.core.mlp import init_dm_nerf
    from dmnerf_tpu.core.pipeline import make_xla_query_fn
    from dmnerf_tpu.kernels.fused_mlp import make_pallas_query_fn

    N, S = N_RAYS, N_SAMPLES + N_IMPORTANCE
    params = init_dm_nerf(jax.random.PRNGKey(0), ins_num=INS_NUM)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (N, S, 3)).astype(np.float32))
    dirs = rng.randn(N, 3).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))

    q_xla = make_xla_query_fn()
    q_pal = make_pallas_query_fn()
    a = np.asarray(jax.jit(q_xla)(params, pts, dirs))
    b = np.asarray(jax.jit(q_pal)(params, pts, dirs))
    max_err = float(np.max(np.abs(a - b)))
    scale = float(np.max(np.abs(a)))
    fwd_ok = bool(max_err <= 5e-3 * max(scale, 1.0))

    # COMPILED sigma-stub parity (ADVICE r3): the render path's coarse pass swaps
    # in sigma_stub_params; its exactness rests on the fused-operand row padding
    # staying sublane-aligned, which interpret-mode CPU tests cannot see — gate
    # the full-vs-stub sigma column on-device every bench run.
    from dmnerf_tpu.core.mlp import sigma_stub_params

    stub = np.asarray(jax.jit(q_pal)(sigma_stub_params(params), pts, dirs))
    sigma_scale = float(np.max(np.abs(a[..., 3])))
    stub_err = float(np.max(np.abs(stub[..., 3] - b[..., 3])))
    stub_ok = bool(stub_err <= 1e-5 * max(sigma_scale, 1.0))

    # rgb_stub (the manipulator's pass-1 label queries): sigma AND ins columns
    # vs the full pytree — the first ASYMMETRIC head-width pytree the kernel
    # runs (rgb 8-wide, ins 256-wide), so compiled operand-fusion grouping is
    # exercised beyond what the symmetric sigma stub covers.
    from dmnerf_tpu.core.mlp import rgb_stub_params

    rstub = np.asarray(jax.jit(q_pal)(rgb_stub_params(params), pts, dirs))
    si_scale = float(np.max(np.abs(a[..., 3:])))
    rstub_err = float(np.max(np.abs(rstub[..., 3:] - b[..., 3:])))
    rstub_ok = bool(rstub_err <= 1e-5 * max(si_scale, 1.0))

    # backward: a cotangent mixing every head channel, parameter grads compared
    # leaf-by-leaf as RELATIVE error (same loss as tests/test_kernels.py but at the
    # flagship shape, COMPILED)
    w = jnp.asarray(np.linspace(0.5, 1.5, a.shape[-1]), jnp.float32)

    def make_loss(q):
        return lambda p: jnp.sum(jnp.tanh(q(p, pts, dirs)) * w)

    g_xla = jax.jit(jax.grad(make_loss(q_xla)))(params)
    g_pal = jax.jit(jax.grad(make_loss(q_pal)))(params)
    bwd_rel = 0.0
    for k in sorted(g_xla):
        ga, gb = np.asarray(g_xla[k]), np.asarray(g_pal[k])
        bwd_rel = max(bwd_rel, float(np.max(np.abs(ga - gb)) / (np.max(np.abs(ga)) + 1e-12)))
    bwd_ok = bool(bwd_rel <= 2e-2)

    def _time(f, *args):
        # scalar-reduce + float(): a host-side scalar read is the only reliable
        # execution fence under the axon tunnel
        g = jax.jit(lambda *a: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(f(*a))))
        _ = float(g(*args))
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / 10 * 1e3

    fwd_xla = _time(q_xla, params, pts, dirs)
    fwd_pal = _time(q_pal, params, pts, dirs)
    grad_xla = _time(jax.grad(make_loss(q_xla)), params)
    grad_pal = _time(jax.grad(make_loss(q_pal)), params)
    ok = fwd_ok and bwd_ok and stub_ok and rstub_ok
    log(f"[bench] kernel parity: fwd max|Δ| {max_err:.2e} (scale {scale:.1f}), "
        f"bwd max rel {bwd_rel:.2e}, sigma-stub max|Δ| {stub_err:.2e}, "
        f"rgb-stub max|Δ| {rstub_err:.2e} -> {'PASS' if ok else 'FAIL'}; "
        f"fwd ms xla {fwd_xla:.2f} pallas {fwd_pal:.2f}; "
        f"fwd+bwd ms xla {grad_xla:.2f} pallas {grad_pal:.2f}")
    return {"pass": ok, "max_abs_err": max_err, "out_scale": scale,
            "bwd_max_rel_err": bwd_rel, "bwd_pass": bwd_ok,
            "sigma_stub_max_abs_err": stub_err, "sigma_stub_pass": stub_ok,
            "rgb_stub_max_abs_err": rstub_err, "rgb_stub_pass": rstub_ok,
            "fwd_ms_xla": round(fwd_xla, 2), "fwd_ms_pallas": round(fwd_pal, 2),
            "grad_ms_xla": round(grad_xla, 2), "grad_ms_pallas": round(grad_pal, 2),
            "bwd_ms_xla_derived": round(grad_xla - fwd_xla, 2),
            "bwd_ms_pallas_derived": round(grad_pal - fwd_pal, 2)}


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
    except Exception as e:  # reference unavailable -> record the failure, use NaN
        log(f"[bench] reference measurement failed: {e!r}")
        base = float("nan")
    with open(CACHE, "w") as f:
        json.dump({"reference_cpu_rays_per_sec": base,
                   "note": "measured from /root/reference on host CPU (no GPU available); "
                           "denominator for vs_baseline"}, f)
    return base


def main():
    import jax

    from dmnerf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    kernel_only = "--kernel-parity" in sys.argv
    platform = jax.devices()[0].platform
    device_kind = jax.devices()[0].device_kind

    if kernel_only:
        res = bench_kernel_parity() if platform == "tpu" else {"pass": None,
                                                               "skipped": "not on tpu"}
        print(json.dumps({"metric": "kernel_parity_max_abs_err",
                          "value": res.get("max_abs_err"),
                          "unit": "abs", "vs_baseline": None, "detail": res}))
        return

    baseline = get_baseline()
    detail = {"device_kind": device_kind, "denominator_kind": "reference torch on host CPU "
              f"({REF_RAYS}-ray steps); no reference GPU available in this environment"}

    detail["train_fp32"] = bench_train("float32")
    try:
        detail["train_fp32_dense_ins"] = bench_train("float32", dense_ins=True)
    except Exception as e:
        detail["train_fp32_dense_ins"] = {"error": repr(e)}
    try:
        detail["train_fp32_packed"] = bench_train_packed("float32")
    except Exception as e:
        detail["train_fp32_packed"] = {"error": repr(e)}
    detail["render_fp32"] = bench_render("float32")
    try:
        detail["mesh_sigma_fp32"] = bench_mesh_sigma("float32")
    except Exception as e:
        detail["mesh_sigma_fp32"] = {"error": repr(e)}
    try:
        detail["mani_render_fp32"] = bench_mani_render("float32")
    except Exception as e:
        detail["mani_render_fp32"] = {"error": repr(e)}
    try:
        detail["mani_render_fp32_2t"] = bench_mani_render("float32", n_targets=2)
    except Exception as e:
        detail["mani_render_fp32_2t"] = {"error": repr(e)}
    try:
        detail["train_bf16"] = bench_train("bfloat16")
        detail["render_bf16"] = bench_render("bfloat16")
        dpsnr = abs(detail["train_bf16"]["psnr_at_5_steps"]
                    - detail["train_fp32"]["psnr_at_5_steps"])
        detail["bf16_parity"] = {"dpsnr_at_5_steps": round(dpsnr, 3), "pass": bool(dpsnr < 1.0)}
    except Exception as e:
        detail["train_bf16"] = {"error": repr(e)}

    flops = analytic_matmul_flops(_make_cfg("float32"))
    peak = PEAK_BF16.get(device_kind)
    mfu = {}
    for k in ("train_fp32", "train_fp32_packed", "train_bf16"):
        d = detail.get(k, {})
        if "ms_per_step" in d:
            achieved = flops["train_flops"] / (d["ms_per_step"] / 1e3)
            mfu[k] = {"achieved_tflops": round(achieved / 1e12, 2),
                      "mfu_vs_bf16_peak": round(achieved / peak, 4) if peak else None}
    mfu["analytic_train_gflops_per_step"] = round(flops["train_flops"] / 1e9, 1)
    mfu["peak_bf16_tflops"] = round(peak / 1e12, 0) if peak else None
    mfu["note"] = "matmul FLOPs only (lower bound); see docs/PERF.md"
    detail["mfu"] = mfu

    if platform == "tpu":
        try:
            detail["kernel_parity"] = bench_kernel_parity()
        except Exception as e:
            detail["kernel_parity"] = {"pass": False, "error": repr(e)}

    rays_s = detail["train_fp32"]["rays_per_sec"]
    vs = rays_s / baseline if baseline and np.isfinite(baseline) else None
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": rays_s,
        "unit": "rays/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
