"""Serving load benchmark: latency/throughput of the micro-batched HTTP path.

Spins up serving.make_server in-process, fires concurrent single-image
clients (the worst case for a per-request design — exactly what the
micro-batcher exists for), and reports throughput, latency percentiles and
the realized average device batch. Run on TPU (default env) for real
numbers or under the CPU scrub env for a smoke check:

    python tools/serving_bench.py [--model eelunet] [--image_size 512]
        [--clients 32] [--requests 256] [--max_batch 16] [--window_ms 5]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="eelunet")
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--output", default="proba", choices=["proba", "mask"],
                    help="mask: request device-thresholded uint8-wire masks "
                    "(?output=mask) — the serving fast path")
    args = ap.parse_args()

    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.inference import Predictor
    from eelunet_tpu.serving import SegmentationService, make_server

    s = args.image_size
    predictor = Predictor(ModelConfig(name=args.model, dtype=args.dtype))
    service = SegmentationService(
        predictor, (s, s), max_batch=args.max_batch, window_ms=args.window_ms
    )
    server = make_server(service, args.model, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://{server.server_address[0]}:{server.server_address[1]}/v1/predict"

    rng = np.random.default_rng(0)
    bodies = []
    for _ in range(8):  # a few distinct payloads; uint8 npy like a real client
        buf = io.BytesIO()
        np.save(buf, rng.integers(0, 256, (s, s, 3), dtype=np.uint8))
        bodies.append(buf.getvalue())

    # Warm every batch bucket the run can hit (compiles stay outside the
    # timed window — the micro-batcher forms batches of ANY size <= max_batch,
    # and each power-of-two bucket is its own XLA program).
    b = 1
    warm = (predictor.predict_mask_wire if args.output == "mask"
            else predictor.predict_proba)
    while True:
        warm(np.zeros((b, s, s, 3), np.uint8))
        if b >= args.max_batch:
            break
        b = min(b * 2, args.max_batch)
    if args.output == "mask":
        url += "?output=mask"
    # One HTTP round-trip to warm the server path itself.
    req = urllib.request.Request(url, data=bodies[0],
                                 headers={"Content-Type": "application/octet-stream"})
    urllib.request.urlopen(req, timeout=600).read()

    n_batches0 = service.batcher.batches
    n_items0 = service.batcher.batched_items
    latencies = []
    lat_lock = threading.Lock()
    per_client = args.requests // args.clients

    def client(ci):
        for k in range(per_client):
            body = bodies[(ci + k) % len(bodies)]
            t0 = time.perf_counter()
            r = urllib.request.urlopen(
                urllib.request.Request(url, data=body,
                                       headers={"Content-Type": "application/octet-stream"}),
                timeout=600,
            )
            r.read()
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    lat = np.sort(np.asarray(latencies)) * 1e3
    nb = service.batcher.batches - n_batches0
    ni = service.batcher.batched_items - n_items0
    stats_url = (f"http://{server.server_address[0]}"
                 f":{server.server_address[1]}/v1/stats")
    stats = json.loads(urllib.request.urlopen(stats_url, timeout=60).read())
    print(json.dumps({
        "model": args.model, "output": args.output,
        "image_size": s, "clients": args.clients,
        "requests": len(latencies), "wall_s": round(wall, 2),
        "throughput_img_s": round(len(latencies) / wall, 1),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 1),
        "latency_ms_max": round(float(lat[-1]), 1),
        "avg_device_batch": round(ni / nb, 2) if nb else 0.0,
        "max_batch": args.max_batch, "window_ms": args.window_ms,
        # Server-side split: per-batch device time vs end-to-end request
        # latency — separates TPU cost from host/HTTP queueing.
        "server_device_ms": stats.get("device_ms"),
        "server_latency_ms": stats.get("latency_ms"),
    }))
    server.shutdown()
    service.close()


if __name__ == "__main__":
    main()
