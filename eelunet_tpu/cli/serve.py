"""Serve a checkpoint over HTTP with dynamic micro-batching.

    python -m eelunet_tpu.cli.serve --model_type eelunet \
        --checkpoint checkpoints/eelunet/eelunet_best_dice \
        --image_size 512 --port 8500 --max_batch 16 --window_ms 5

Deployment counterpart of cli.predict (offline export). Protocol and
batching semantics: eelunet_tpu/serving.py. The reference has no serving
path (test.py is offline only); this is a beyond-reference subsystem.
"""

from __future__ import annotations

from eelunet_tpu.cli.common import base_parser, load_config


def _ckpt_fingerprint(path):
    """Newest mtime_ns + entry count under the checkpoint dir — changes when
    a new checkpoint lands at the same path (orbax rewrites the whole dir)."""
    import os

    newest, count = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            count += 1
            try:
                newest = max(newest, os.stat(os.path.join(root, f)).st_mtime_ns)
            except OSError:
                pass  # file replaced mid-walk; next poll sees the final state
    return (newest, count)


def start_checkpoint_watcher(service, checkpoint: str, interval_s: float):
    """Poll ``checkpoint`` and hot-swap weights when it changes (the
    --reload_watch flag). Skips a poll while the dir is mid-write (orbax
    commits atomically via a tmp dir, so a fingerprint that is still moving
    between two consecutive polls means a write is in progress)."""
    import threading
    import time

    def loop():
        last = _ckpt_fingerprint(checkpoint)
        while True:
            time.sleep(interval_s)
            now = _ckpt_fingerprint(checkpoint)
            if now == last or now[1] == 0:
                continue
            settle = _ckpt_fingerprint(checkpoint)
            if settle != now:
                continue  # still being written; reload on a later poll
            try:
                out = service.reload_checkpoint(checkpoint)
                print(f"[reload_watch] weights reloaded ({out['reloads']} total)")
                last = now
            except Exception as e:  # keep serving old weights; retry later
                print(f"[reload_watch] reload failed, keeping old weights: {e}")

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    return t


def main(argv=None):
    p = base_parser("Serve segmentation over HTTP (micro-batched)")
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--artifact", type=str, default="",
                   help="serve a cli.export StableHLO artifact dir instead "
                   "of a checkpoint (no model code needed)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--window_ms", type=float, default=5.0)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--quantize", type=str, default="", choices=["", "int8"],
                   help="int8: W8A8 dynamic-scale convs (eelunet_tpu.quantize)")
    p.add_argument("--tile", type=int, default=0,
                   help="serve at NATIVE input resolution via fixed-shape "
                   "sliding windows of this size (0 = resize to image_size)")
    p.add_argument("--tile_overlap", type=int, default=64)
    p.add_argument("--max_pending", type=int, default=128,
                   help="admission bound on pending work (queued + in "
                   "flight); beyond it requests shed with 503 + Retry-After "
                   "(0 = unbounded)")
    p.add_argument("--deadline_ms", type=float, default=0.0,
                   help="default per-request deadline; a request still "
                   "queued past it fails with 504 (0 = none; per-request "
                   "override via ?deadline_ms=)")
    p.add_argument("--reload_watch", type=float, default=0.0,
                   help="poll --checkpoint every N seconds and hot-swap the "
                   "weights when its contents change (zero dropped "
                   "requests; also available on demand via POST /v1/reload)")
    args = p.parse_args(argv)
    cfg = load_config(args)

    from eelunet_tpu.serving import SegmentationService, make_server

    d = cfg.data
    if args.artifact:
        if args.quantize:
            p.error("--quantize applies at trace time; StableHLO artifacts are "
                    "already compiled — re-export or serve from a checkpoint")
        if args.tile:
            p.error("--tile needs a checkpoint-backed Predictor; StableHLO "
                    "artifacts are fixed-shape programs")
        from eelunet_tpu.export import ExportedModel

        predictor = ExportedModel(args.artifact)
        name = predictor.meta["model"]
        image_size = tuple(predictor.meta["image_size"])
        # coalesced batches can't exceed the largest exported bucket
        args.max_batch = min(args.max_batch, max(predictor.meta["batch_sizes"]))
    else:
        if not args.checkpoint:
            p.error("one of --checkpoint or --artifact is required")
        import jax

        from eelunet_tpu.inference import Predictor
        from eelunet_tpu.parallel.mesh import create_mesh

        # multi-chip batch-parallel serving: --set mesh.data_axis=N (or the
        # default -1 = all local devices when more than one is attached)
        mesh = None
        if len(jax.devices()) > 1 or cfg.mesh.data_axis > 1:
            mesh = create_mesh(cfg.mesh.data_axis, 1)
        predictor = Predictor(
            cfg.model, checkpoint=args.checkpoint, threshold=args.threshold,
            normalize_mean=tuple(d.normalize_mean), normalize_std=tuple(d.normalize_std),
            mesh=mesh, tta=cfg.tta, quantize=args.quantize or None,
        )
        name = cfg.model.name
        image_size = d.image_size
    service = SegmentationService(
        predictor, image_size,
        max_batch=args.max_batch, window_ms=args.window_ms,
        threshold=args.threshold,
        tile=args.tile, tile_overlap=args.tile_overlap,
        max_pending=args.max_pending, deadline_ms=args.deadline_ms,
    )
    if args.reload_watch > 0:
        if args.artifact:
            p.error("--reload_watch needs a checkpoint-backed Predictor")
        start_checkpoint_watcher(service, args.checkpoint, args.reload_watch)
    server = make_server(service, name, args.host, args.port)
    h, w = image_size
    print(f"serving {name} at {h}x{w} on "
          f"http://{server.server_address[0]}:{server.server_address[1]} "
          f"(max_batch={args.max_batch}, window={args.window_ms}ms)")
    # Orchestrators stop containers with SIGTERM: convert it to the same
    # graceful path as ^C (stop accepting, drain the batcher queue).
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
