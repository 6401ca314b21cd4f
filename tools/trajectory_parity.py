"""Paired-init, paired-batch TRAINING-STEP parity vs the torch reference.

Closes the last link in the parity chain (forward parity -> step parity ->
trained parity): proves the eelunet_tpu training step — loss + gradients +
Adam(weight_decay=1e-5) + StepLR(30, 0.5), the reference semantics of
train.py:35-46, utils/Loss.py:92-113, train.py:312,315 — computes the same
per-step update as the reference, not just the same forward pass.

Protocol, per family/seed:
  1. torch.manual_seed(seed); build the reference model (torch default init).
  2. Port that EXACT initial state_dict through eelunet_tpu.models.torch_port
     so both frameworks start from identical weights.
  3. Precompute one shared batch sequence (hard-synthetic samples, numpy,
     per-epoch permutation shuffle keyed by seed+epoch) — both frameworks
     consume the same float32 pixels in the same order.
  4. Train four runs for --steps optimizer steps, recording loss BEFORE each
     update: (a) torch reference loop (CPU f32, the run_seed semantics of
     tools/reference_accuracy_bench.py), (b) eelunet_tpu jitted train step
     (CPU f32, Trainer._get_step("train")), (c) the torch loop again with the
     FIRST batch perturbed by +1e-7 — the one-shot chaos floor: how fast the
     same framework's trajectory diverges from itself under one
     float-epsilon of input noise, and (d) the torch loop with a fresh
     deterministic ±1e-7 noise field on EVERY batch — the per-step drift
     floor (cross-framework reduction-order differences are injected every
     step; in a stable landscape they accumulate linearly, which (c) cannot
     represent — measured on malunet). Any |loss_jax - loss_torch| growth at
     or below max(c, d) is float drift, not a semantic difference.
  5. Port the torch run's FINAL state_dict and compare parameter trees
     elementwise (max abs / rel diff) — N steps later the weights themselves
     must still agree up to drift.

Fork detection (diagnosis mode, VERDICT r3 Weak #4): the first step where
the jax-vs-torch loss delta exceeds 100x the smoothed chaos floor AND 1e-3
relative — None on a clean run.

Run (self-scrubs into the pure-CPU env like tests/conftest.py):

    python tools/trajectory_parity.py --families all --steps 256
    python tools/trajectory_parity.py --families unext_s --seed 6345 \
        --steps 960   # the full 60-epoch collapse recipe, paired

Writes docs/results/trajectory_parity_r4/{family}_seed{seed}.json and prints
one JSON summary line per family.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)
sys.path.insert(0, REPO + "/tests")
sys.path.insert(0, REPO + "/tools")


def _ensure_cpu_env():
    """Re-exec once with the scrubbed pure-CPU environment (see
    tests/conftest.py — the axon sitecustomize patches JAX at interpreter
    start, so env changes inside this process are too late)."""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["EELUNET_TPU_TEST_ENV"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, REPO + "/tests", REPO + "/tools"]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon_site" not in p]
    )
    if env.get("EELUNET_TEST_COMPILE_CACHE", "1") != "0":
        env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser(
            os.path.join("~", ".cache", "eelunet_tpu", "xla-tests")))
    env["TF_CPP_MIN_LOG_LEVEL"] = "3"  # silence XLA AOT-loader glog spew
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def make_batches(seed: int, image_size: int, n_train: int, batch_size: int,
                 steps: int):
    """The shared batch sequence: numpy (images NHWC f32, masks NHWC f32),
    per-epoch permutation shuffle keyed by seed+epoch, drop-remainder."""
    from eelunet_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=n_train, image_size=(image_size, image_size),
                          seed=seed, difficulty="hard")
    imgs = np.stack([img for img, _ in ds.samples])   # (N,H,W,3) normalized
    msks = np.stack([m for _, m in ds.samples])       # (N,H,W,1) in {0,1}
    per_epoch = n_train // batch_size
    batches = []
    epoch = 0
    while len(batches) < steps:
        order = np.random.default_rng(seed + 7919 * epoch).permutation(n_train)
        for b in range(per_epoch):
            idx = order[b * batch_size:(b + 1) * batch_size]
            batches.append((imgs[idx], msks[idx]))
            if len(batches) == steps:
                break
        epoch += 1
    return batches, per_epoch


def run_torch(family: str, seed: int, batches, per_epoch: int, lr: float,
              perturb: float = 0.0, perturb_mode: str = "first", log=print):
    """Reference training loop (train.py:35-46 semantics), recording the loss
    of every optimizer step. Returns (losses, final_state_dict_numpy).

    perturb_mode="first": one-shot chaos floor (batch 0 only) — measures
    landscape sensitivity to a single epsilon. perturb_mode="every": a fresh
    deterministic ±perturb noise field on EVERY batch — the floor for
    PER-STEP numeric-drift accumulation (cross-framework f32 reduction-order
    differences are injected every step, so in a non-chaotic landscape they
    accumulate linearly and the one-shot floor under-represents them;
    measured on malunet, whose one-shot floor stays ~2e-7 for 30+ steps
    while both torch-vs-jax AND torch-vs-torch-every-step drift ~1e-3)."""
    import random

    import torch

    from reference_accuracy_bench import MODEL_ZOO
    from reference_loader import load_reference_module

    torch.set_num_threads(1)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    module_name, build, dispatch, logits_head = MODEL_ZOO[family]
    model = build(load_reference_module(module_name))
    loss_mod = load_reference_module("utils.Loss")
    if dispatch == "edge":
        criterion = loss_mod.edge_BceDiceLoss(wb=1, wd=1)
    elif dispatch == "gt":
        criterion = loss_mod.GT_BceDiceLoss(wb=1, wd=1)
    else:
        criterion = loss_mod.BceDiceLoss(wb=1, wd=1)
    optimizer = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, step_size=30, gamma=0.5)

    losses = []
    model.train()
    for step, (xi, yi) in enumerate(batches):
        if perturb and step == 0 and perturb_mode == "first":
            xi = xi + perturb
        elif perturb and perturb_mode == "every":
            noise = np.random.default_rng(10_000_019 + step).integers(
                0, 2, size=xi.shape).astype(np.float32) * 2.0 - 1.0
            xi = xi + perturb * noise
        inputs = torch.from_numpy(np.ascontiguousarray(xi.transpose(0, 3, 1, 2)))
        labels = torch.from_numpy(np.ascontiguousarray(yi.transpose(0, 3, 1, 2)))
        optimizer.zero_grad()
        if dispatch == "edge":          # calculate_loss, train.py:62-66
            seg_out, edge_outs = model(inputs)
            loss = criterion(edge_outs, seg_out, labels)
        elif dispatch == "gt":
            gt_pre, out = model(inputs)
            loss = criterion(gt_pre, out, labels)
        else:
            out = model(inputs)
            loss = criterion(torch.sigmoid(out) if logits_head else out, labels)
        loss.backward()
        optimizer.step()
        losses.append(float(loss.item()))
        # scheduler.step() per epoch (train.py:118)
        if (step + 1) % per_epoch == 0:
            scheduler.step()
        if (step + 1) % 50 == 0:
            log(f"    torch{'(pert)' if perturb else ''} step {step + 1}: "
                f"loss {losses[-1]:.6f}")
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return losses, sd


def run_jax(family: str, seed: int, batches, per_epoch: int, lr: float,
            init_sd, image_size: int, batch_size: int, log=print):
    """eelunet_tpu training loop from the SAME init: port the torch initial
    state_dict, run Trainer's jitted train step per shared batch (CPU f32).
    Returns (losses, final_params, final_batch_stats)."""
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.models.torch_port import port_state_dict, validate_against_model
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(TrainConfig(), [
        f"model.name={family}",
        "model.dtype=float32",
        f"data.image_size=[{image_size},{image_size}]",
        f"data.batch_size={batch_size}",
        f"seed={seed}",
        f"optimizer.lr={lr}",
        "donate_buffers=false",
    ])
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=per_epoch)
    variables = port_state_dict(family, init_sd)
    validate_against_model(family, variables, image_size=image_size)
    state = state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"]),
    )
    step_fn = trainer._get_step("train", state)
    losses = []
    for step, (xi, yi) in enumerate(batches):
        state, loss, _ok = step_fn(state, jnp.asarray(xi), jnp.asarray(yi))
        losses.append(float(loss))
        if (step + 1) % 50 == 0:
            log(f"    jax step {step + 1}: loss {losses[-1]:.6f}")
    params = jax.tree_util.tree_map(np.asarray, state.params)
    bstats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    return losses, params, bstats


def compare_trees(a, b):
    """Max abs / max rel elementwise difference across two pytrees."""
    import jax

    flat_a = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
              for p, v in jax.tree_util.tree_flatten_with_path(a)[0]}
    flat_b = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
              for p, v in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert flat_a.keys() == flat_b.keys(), (
        sorted(flat_a.keys() - flat_b.keys())[:5],
        sorted(flat_b.keys() - flat_a.keys())[:5])
    max_abs = max_rel = 0.0
    worst = ""
    for k in flat_a:
        d = np.abs(flat_a[k] - flat_b[k])
        r = d / (np.abs(flat_b[k]) + 1e-8)
        if d.size and float(d.max()) > max_abs:
            max_abs = float(d.max())
            worst = k
        if r.size:
            max_rel = max(max_rel, float(r.max()))
    return max_abs, max_rel, worst


def fork_step(d_jax, d_pert, ref_loss, window: int = 8):
    """First step where jax-vs-torch delta exceeds 100x the smoothed chaos
    floor AND 1e-3 relative; None if the trajectories never fork."""
    d_jax = np.asarray(d_jax)
    window = max(1, min(window, len(d_jax)))  # convolve('same') pads to max(M,N)
    floor = np.maximum.accumulate(
        np.convolve(np.asarray(d_pert), np.ones(window) / window,
                    mode="same")[: len(d_jax)])
    rel = d_jax / (np.abs(np.asarray(ref_loss)) + 1e-12)
    bad = (d_jax > 100.0 * np.maximum(floor, 1e-9)) & (rel > 1e-3)
    idx = np.nonzero(bad)[0]
    return int(idx[0]) if idx.size else None


def run_family(family: str, seed: int, args, outdir: str, log) -> dict:
    import time

    import torch

    from reference_accuracy_bench import MODEL_ZOO
    from reference_loader import load_reference_module

    t0 = time.time()
    batches, per_epoch = make_batches(
        seed, args.image_size, args.n_train, args.batch_size, args.steps)

    # Initial torch weights (the shared init): seed exactly as run_torch will.
    import random

    torch.set_num_threads(1)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    module_name, build, _, _ = MODEL_ZOO[family]
    init_model = build(load_reference_module(module_name))
    init_sd = {k: v.detach().cpu().numpy()
               for k, v in init_model.state_dict().items()}
    del init_model

    log(f"  [{family} seed {seed}] torch run ({args.steps} steps, "
        f"{per_epoch} steps/epoch)...")
    loss_t, final_sd = run_torch(family, seed, batches, per_epoch, args.lr, log=log)
    log(f"  [{family} seed {seed}] torch perturbed run (one-shot chaos floor)...")
    loss_p, final_sd_pert = run_torch(family, seed, batches, per_epoch, args.lr,
                                      perturb=1e-7, log=log)
    log(f"  [{family} seed {seed}] torch per-step-noise run (drift floor)...")
    loss_e, _final_sd_e = run_torch(family, seed, batches, per_epoch, args.lr,
                                    perturb=1e-7, perturb_mode="every", log=log)
    log(f"  [{family} seed {seed}] jax run (CPU f32, shared init)...")
    loss_j, params_j, bstats_j = run_jax(
        family, seed, batches, per_epoch, args.lr, init_sd,
        args.image_size, args.batch_size, log=log)

    from eelunet_tpu.models.torch_port import port_state_dict

    ported_final = port_state_dict(family, final_sd)
    p_abs, p_rel, p_worst = compare_trees(params_j, ported_final["params"])
    b_abs, b_rel, b_worst = compare_trees(bstats_j, ported_final["batch_stats"]) \
        if ported_final["batch_stats"] else (0.0, 0.0, "")
    # Chaos floor for PARAM drift: the same elementwise compare between the
    # unperturbed and float-eps-perturbed torch runs. Near-zero-gradient
    # params random-walk under Adam (update ~ lr*sign(m)), so |dparam| up to
    # ~2*lr*steps is expected from ANY epsilon — this column shows how much.
    ported_pert = port_state_dict(family, final_sd_pert)
    pp_abs, _, _ = compare_trees(ported_pert["params"], ported_final["params"])

    lt, lj, lp, le = (np.asarray(v) for v in (loss_t, loss_j, loss_p, loss_e))
    d_jax = np.abs(lj - lt)
    # Combined floor: one-shot (landscape chaos) OR per-step noise (numeric
    # drift accumulation) — jax-vs-torch differences are float-level EVERY
    # step, so either channel legitimately explains matching growth.
    d_pert = np.maximum(np.abs(lp - lt), np.abs(le - lt))

    def seg(d, a, b):
        d = d[a:b]
        return float(d.max()) if d.size else 0.0

    n = len(lt)
    summary = {
        "family": family, "seed": seed, "steps": n,
        "per_epoch": per_epoch, "lr": args.lr,
        "image_size": args.image_size, "batch_size": args.batch_size,
        "step0_abs_dloss": float(d_jax[0]),
        "step0_rel_dloss": float(d_jax[0] / (abs(lt[0]) + 1e-12)),
        "max_abs_dloss_steps_0_10": seg(d_jax, 0, 10),
        "max_abs_dloss_steps_0_50": seg(d_jax, 0, 50),
        "max_abs_dloss_all": seg(d_jax, 0, n),
        "chaos_floor_steps_0_10": seg(d_pert, 0, 10),
        "chaos_floor_steps_0_50": seg(d_pert, 0, 50),
        "chaos_floor_all": seg(d_pert, 0, n),
        "oneshot_floor_all": seg(np.abs(lp - lt), 0, n),
        "everystep_floor_all": seg(np.abs(le - lt), 0, n),
        "final_loss": {"torch": float(lt[-1]), "jax": float(lj[-1]),
                       "torch_pert": float(lp[-1]),
                       "torch_pert_every": float(le[-1])},
        "final_param_max_abs": p_abs, "final_param_max_rel": p_rel,
        "final_param_worst": p_worst,
        "final_param_max_abs_chaos_floor": pp_abs,
        "adam_drift_bound_2_lr_steps": 2.0 * args.lr * n,
        "final_bstats_max_abs": b_abs, "final_bstats_max_rel": b_rel,
        "final_bstats_worst": b_worst,
        "fork_step": fork_step(d_jax, d_pert, lt),
        "wall_s": round(time.time() - t0, 1),
    }
    summary["verdict"] = "PASS" if summary["fork_step"] is None else "FORK"
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, f"{family}_seed{seed}.json"), "w") as f:
        json.dump({**summary,
                   "loss_torch": [round(float(v), 8) for v in lt],
                   "loss_jax": [round(float(v), 8) for v in lj],
                   "loss_torch_pert": [round(float(v), 8) for v in lp],
                   "loss_torch_pert_every": [round(float(v), 8) for v in le]},
                  f, indent=1)
    return summary


FAMILIES = ("eelunet", "unet", "unext", "unext_s", "egeunet", "malunet")


def main(argv=None):
    _ensure_cpu_env()
    p = argparse.ArgumentParser()
    p.add_argument("--families", nargs="+", default=["all"],
                   help=f"subset of {FAMILIES} or 'all'")
    p.add_argument("--seed", type=int, default=7686)
    p.add_argument("--steps", type=int, default=256,
                   help="256 = 32 epochs at the default geometry, crossing "
                   "the StepLR(30) boundary so the schedule path is paired too")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--n_train", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)  # train.py:229
    p.add_argument("--outdir", default=os.path.join(
        REPO, "docs", "results", "trajectory_parity_r4"))
    args = p.parse_args(argv)

    fams = FAMILIES if args.families == ["all"] else tuple(args.families)
    log = lambda m: print(m, file=sys.stderr, flush=True)
    rows = []
    for fam in fams:
        s = run_family(fam, args.seed, args, args.outdir, log)
        rows.append(s)
        print(json.dumps(s), flush=True)
    log("\n| family | step0 |Δloss| | max|Δ| 0-50 | chaos 0-50 | max|Δ| all "
        "| chaos all | param max|Δ| | param chaos | fork | verdict |")
    log("|---|---|---|---|---|---|---|---|---|---|")
    for s in rows:
        log(f"| {s['family']} | {s['step0_abs_dloss']:.2e} "
            f"| {s['max_abs_dloss_steps_0_50']:.2e} "
            f"| {s['chaos_floor_steps_0_50']:.2e} "
            f"| {s['max_abs_dloss_all']:.2e} | {s['chaos_floor_all']:.2e} "
            f"| {s['final_param_max_abs']:.2e} "
            f"| {s['final_param_max_abs_chaos_floor']:.2e} | {s['fork_step']} "
            f"| {s['verdict']} |")
    return 0 if all(s["verdict"] == "PASS" for s in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
