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


def main(argv=None):
    p = base_parser("Serve segmentation over HTTP (micro-batched)")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--window_ms", type=float, default=5.0)
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args(argv)
    cfg = load_config(args)

    from eelunet_tpu.inference import Predictor
    from eelunet_tpu.serving import SegmentationService, make_server

    d = cfg.data
    predictor = Predictor(
        cfg.model, checkpoint=args.checkpoint, threshold=args.threshold,
        normalize_mean=tuple(d.normalize_mean), normalize_std=tuple(d.normalize_std),
    )
    service = SegmentationService(
        predictor, d.image_size, d.normalize_mean, d.normalize_std,
        max_batch=args.max_batch, window_ms=args.window_ms,
    )
    server = make_server(service, cfg.model.name, args.host, args.port)
    h, w = d.image_size
    print(f"serving {cfg.model.name} at {h}x{w} on "
          f"http://{server.server_address[0]}:{server.server_address[1]} "
          f"(max_batch={args.max_batch}, window={args.window_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
