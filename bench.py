"""Benchmark harness — north-star metric: EELUnet images/sec/chip at 512x512
inference (BASELINE.json), vs a CPU baseline of the same model (>=5x target).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline = TPU images/sec / CPU images/sec (CPU measured in a subprocess on
the same JAX graph; cached in .bench_cpu_baseline.json because the CPU number
is a property of the host, not of TPU-side changes).

Extra detail (per-model 256/512 sweeps) goes to stderr / BENCH_DETAIL.json.
"""

import json
import os
import subprocess
import sys
import time

IMAGE = 512
# Headline batch: 16 is the measured single-chip optimum at 512^2 (128.1
# img/s vs 123.6 @8 and 126.8 @32, docs/PERF.md sweep). Secondary metrics
# keep batch 8 for cross-round comparability.
BATCH = 16
DETAIL_BATCH = 8
WARMUP = 1
ITERS = 20
CPU_ITERS = 2
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")


def _measure(model_name: str, image: int, batch: int, iters: int, warmup: int, dtype: str = "bfloat16") -> float:
    """Measure forward images/sec.

    The ``iters`` forward passes run inside ONE jitted ``lax.scan`` with a
    single scalar readback at the end: under the axon TPU tunnel,
    ``block_until_ready`` does not actually synchronize and a per-iteration
    host readback would pay a ~50ms relay round trip per step. Each scan step
    perturbs the input by a tiny iteration-dependent epsilon so XLA cannot
    hoist the loop-invariant forward out of the scan.
    """
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.registry import create_model, seg_probabilities

    model, meta = create_model(ModelConfig(name=model_name, dtype=dtype))
    x = jnp.zeros((batch, image, image, 3), jnp.float32)
    # All models are fully convolutional: params are independent of H/W, so
    # initialize at 64x64 (fast compile) and reuse for the target size.
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    # Eval-time BN folding where a fold map exists (bnfold.py) — the
    # Predictor's default inference config since round 5 (+4.8% on eelunet
    # 512^2 b16: BN affines ride as jit arguments, so XLA can't fold them
    # out itself; exactness pinned by tests/test_bnfold.py).
    from eelunet_tpu.bnfold import FOLDABLE_MODELS, fold_bn_eval

    if model_name in FOLDABLE_MODELS:
        p2, b2, n_folded = fold_bn_eval(
            model_name, variables["params"], variables.get("batch_stats", {}))
        if n_folded:
            model = model.clone(bn_folded=True)
            variables = {
                "params": jax.tree_util.tree_map(jnp.asarray, p2),
                "batch_stats": jax.tree_util.tree_map(jnp.asarray, b2),
            }

    # Weights are passed as jit ARGUMENTS, never closed over: closed-over
    # params become jaxpr constants, and XLA keeps their f32->bf16
    # weight-prep inside the scan body instead of hoisting it — measured
    # 82.8 vs 64.7 ms/batch on the SAME eelunet 512^2 forward (+22% from
    # this one-line harness distinction; the Predictor/Trainer paths always
    # pass weights as arguments).
    @jax.jit
    def run_n(vs, images, n_arr):
        def body(carry, i):
            out = model.apply(vs, images + i * 1e-9, train=False)
            return carry + jnp.sum(seg_probabilities(out, meta)), None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), n_arr)
        return s

    n_arr = jnp.arange(iters, dtype=jnp.float32)
    # AOT-compile so the SAME executable also yields XLA's static memory
    # analysis (peak HBM estimate) without a second compile.
    compiled = run_n.lower(variables, x, n_arr).compile()
    mem = None
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_hbm_estimate_bytes": int(ma.argument_size_in_bytes + ma.temp_size_in_bytes + ma.output_size_in_bytes),
        }
    except Exception:
        pass
    float(compiled(variables, x, n_arr))  # warm
    t0 = time.perf_counter()
    float(compiled(variables, x, n_arr))
    dt = time.perf_counter() - t0
    return batch * iters / dt, mem


def _measure_train(model_name: str, image: int, batch: int, iters: int = 10,
                   dtype: str = "bfloat16", extra_set=()) -> dict:
    """Training-step throughput (fwd+bwd+Adam+BN) with MFU + peak-HBM.

    Steps chain through the donated TrainState, so one final loss readback
    syncs the whole run. Train FLOPs come from the step's OWN jaxpr
    (count_matmul_flops over fwd+bwd+update contractions — exact, not the
    3x-forward heuristic); peak HBM from the compiled executable's static
    memory analysis."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.parallel.mesh import create_mesh
    from eelunet_tpu.train.trainer import Trainer
    from eelunet_tpu.utils.flops import count_matmul_flops, mfu_pct

    cfg = apply_overrides(
        TrainConfig(),
        [
            f"model.name={model_name}",
            f"model.dtype={dtype}",
            f"data.image_size=[{image},{image}]",
            f"data.batch_size={batch}",
            "seed=0",
            *extra_set,
        ],
    )
    trainer = Trainer(cfg, mesh=create_mesh(1, 1))
    state = trainer.init_state(steps_per_epoch=100)
    step = trainer._get_step("train", state)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((batch, image, image, 3)), jnp.float32)
    yb = jnp.asarray((rng.uniform(size=(batch, image, image, 1)) > 0.5), jnp.float32)
    out = {}
    try:
        flops_per_step = count_matmul_flops(step, state, xb, yb)
        out["flops_per_step"] = flops_per_step
    except Exception as e:
        print(f"train flops counting failed: {e}", file=sys.stderr)
        flops_per_step = None
    compiled = step.lower(state, xb, yb).compile()
    try:
        ma = compiled.memory_analysis()
        out["peak_hbm_estimate_bytes"] = int(
            ma.argument_size_in_bytes + ma.temp_size_in_bytes + ma.output_size_in_bytes
        )
    except Exception:
        pass
    state, loss = compiled(state, xb, yb)[:2]
    float(loss)  # sync after compile
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = compiled(state, xb, yb)[:2]
    float(loss)
    dt = time.perf_counter() - t0
    out["images_per_sec"] = round(batch * iters / dt, 2)
    out["ms_per_step"] = round(dt / iters * 1e3, 2)
    if flops_per_step is not None:
        m = mfu_pct(out["images_per_sec"] / batch, flops_per_step,
                    jax.devices()[0].device_kind)
        out["mfu_pct"] = round(m, 2) if m is not None else None
    return out


def _measure_slim_eelunet(image: int, batch: int, amount: float = 0.5, iters: int = 20) -> float:
    """Physically pruned EELUnet forward (prune_physical.py)."""
    import time

    import jax
    import jax.numpy as jnp

    from eelunet_tpu.models.eelunet import EELUnet
    from eelunet_tpu.prune_physical import physical_prune_eelunet, slim_eelunet

    full = EELUnet(dtype=jnp.bfloat16)
    variables = full.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    sp, sb, widths = physical_prune_eelunet(variables["params"], variables["batch_stats"], amount, 32)
    model = slim_eelunet(widths, dtype=jnp.bfloat16)
    sp = jax.tree_util.tree_map(jnp.asarray, sp)
    sb = jax.tree_util.tree_map(jnp.asarray, sb)
    x = jnp.zeros((batch, image, image, 3), jnp.float32)

    @jax.jit
    def run_n(vs, images, n_arr):
        def body(carry, i):
            out = model.apply(vs, images + i * 1e-9, train=False)
            return carry + jnp.sum(out.seg), None
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), n_arr)
        return s

    vs = {"params": sp, "batch_stats": sb}  # as ARGUMENTS (see _measure)
    n_arr = jnp.arange(iters, dtype=jnp.float32)
    float(run_n(vs, x, n_arr))
    t0 = time.perf_counter()
    float(run_n(vs, x, n_arr))
    return batch * iters / (time.perf_counter() - t0)


def _cpu_baseline() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["images_per_sec"]
    code = (
        "import json,sys;sys.path.insert(0, %r);import bench;"
        "print(json.dumps({'images_per_sec': bench._measure('eelunet', %d, 1, %d, 1, 'float32')[0]}))"
        % (os.path.dirname(os.path.abspath(__file__)), IMAGE, CPU_ITERS)
    )
    # Scrub the axon sitecustomize/remote-compile hooks: they break the pure
    # CPU backend (same scrub as tests/conftest.py).
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon_site" not in p
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=3000
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    val = json.loads(line)["images_per_sec"]
    with open(CACHE, "w") as f:
        json.dump({"images_per_sec": val}, f)
    return val


def _device_init_watchdog(timeout_s: float = 2700.0):
    """Fail loudly instead of hanging forever when the TPU tunnel is wedged
    (a killed client can leave the terminal unclaimable; make_c_api_client
    then blocks indefinitely — docs/PERF.md measurement hazards). The budget
    is generous on purpose: observed wedges clear when the server-side lease
    expires, typically within 20-40 min — giving up at 15 min reports a
    zero-value bench right before init would have succeeded."""
    import threading

    done = threading.Event()
    failure = []

    def init():
        try:
            import jax

            jax.devices()
        except Exception as e:  # fast failure (e.g. libtpu version mismatch)
            failure.append(f"{type(e).__name__}: {e}")
        finally:
            done.set()

    t = threading.Thread(target=init, daemon=True)
    t.start()
    waited = 0.0
    while not done.wait(60.0):
        waited += 60.0
        if waited >= timeout_s:
            break
        print(f"bench: waiting on TPU device init ({waited:.0f}s; wedged "
              f"leases usually clear within 20-40 min)", file=sys.stderr)
    if not done.is_set() or failure:
        reason = (
            failure[0]
            if failure
            else f"init exceeded {timeout_s:.0f}s — tunnel wedged/unreachable"
        )
        print(f"bench: TPU backend unavailable: {reason}; reporting value 0",
              file=sys.stderr)
        print(json.dumps({
            "metric": "eelunet_512x512_inference",
            "value": 0,
            "unit": "images/sec/chip",
            "vs_baseline": 0,
        }))
        # stdout is block-buffered when piped (the normal harness setup);
        # os._exit skips interpreter teardown, so flush or the line is lost.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(1)


def main():
    # Persistent XLA compilation cache: repeat bench runs (same shapes) load
    # compiled programs instead of re-paying the remote-compile minutes.
    from eelunet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("auto")
    _device_init_watchdog()
    detail = {}
    tpu_ips, mem = _measure("eelunet", IMAGE, BATCH, ITERS, WARMUP, "bfloat16")
    detail[f"eelunet_{IMAGE}_bf16"] = tpu_ips
    if mem:
        detail[f"eelunet_{IMAGE}_bf16_memory"] = mem

    # FLOPs / MFU accounting (utils/flops.py): analytic conv+dot FLOPs per
    # image, utilization against the chip's dense-bf16 peak.
    try:
        import jax

        from eelunet_tpu.utils.flops import mfu_pct, model_forward_flops

        fpi = model_forward_flops("eelunet", IMAGE, batch=1)
        kind = jax.devices()[0].device_kind
        detail["device_kind"] = kind
        detail["flops_per_image"] = fpi
        m = mfu_pct(tpu_ips, fpi, kind)
        detail["mfu_pct"] = round(m, 2) if m is not None else None
    except Exception as e:
        print(f"flops accounting failed: {e}", file=sys.stderr)
    try:
        cpu_ips = _cpu_baseline()
    except Exception as e:  # CPU baseline is best-effort
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu_ips = None
    detail["cpu_eelunet_512_f32"] = cpu_ips

    # Training throughput is part of the benchmark contract (not just prose):
    # fwd+bwd+Adam+BN at 512^2 batch 8, same dtype as the headline.
    train_block = None
    try:
        train_block = _measure_train("eelunet", IMAGE, DETAIL_BATCH)
        detail[f"eelunet_{IMAGE}_bf16_train"] = train_block
    except Exception as e:
        print(f"train bench failed: {e}", file=sys.stderr)
        detail[f"eelunet_{IMAGE}_bf16_train"] = f"error: {e}"

    # Secondary sweep (BENCH_FULL=1): lightweight families + training step.
    # Off by default — every extra model costs minutes of remote compile and
    # the driver only records the primary JSON line.
    if os.environ.get("BENCH_FULL") == "1":
        for name in ("unet", "egeunet", "unext", "malunet"):
            try:
                detail[f"{name}_256_bf16"] = _measure(name, 256, DETAIL_BATCH, 10, 2, "bfloat16")[0]
            except Exception as e:
                detail[f"{name}_256_bf16"] = f"error: {e}"
        try:
            detail["eelunet_256_train_bf16"] = _measure_train("eelunet", 256, DETAIL_BATCH)
        except Exception as e:
            detail["eelunet_256_train_bf16"] = f"error: {e}"
        try:
            detail["eelunet_slim50_512_bf16"] = _measure_slim_eelunet(IMAGE, DETAIL_BATCH)
        except Exception as e:
            detail["eelunet_slim50_512_bf16"] = f"error: {e}"

    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        # only report when the backend actually provides it (the axon tunnel
        # returns none; the static peak_hbm_estimate_bytes fields cover HBM)
        if stats.get("peak_bytes_in_use") is not None:
            detail["peak_bytes_in_use"] = stats["peak_bytes_in_use"]
    except Exception:
        pass

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)
        f.write("\n")
    print(json.dumps(detail, indent=2), file=sys.stderr)

    vs = (tpu_ips / cpu_ips) if cpu_ips else 0.0
    line = {
        "metric": "eelunet_512x512_inference",
        "value": round(tpu_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2),
    }
    if isinstance(train_block, dict):
        # train-step numbers ride the same driver-captured line so
        # regressions are caught mechanically (BENCH_r{N}.json)
        line["train_images_per_sec"] = train_block.get("images_per_sec")
        line["train_ms_per_step"] = train_block.get("ms_per_step")
        line["train_mfu_pct"] = train_block.get("mfu_pct")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
