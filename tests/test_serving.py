"""Serving subsystem: micro-batching semantics + HTTP protocol round trips.

The batcher must (a) return each caller exactly its own row, in any
interleaving, (b) coalesce concurrent singles into shared device batches,
and (c) propagate forward errors to every waiter instead of hanging them.
The HTTP layer must round-trip npy and PNG payloads and reject bad input
with 400s (not 500s or hangs)."""

from __future__ import annotations

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from eelunet_tpu.config import ModelConfig
from eelunet_tpu.inference import Predictor
from eelunet_tpu.serving import MicroBatcher, SegmentationService, make_server


def _post(url, body, ctype="application/octet-stream"):
    req = urllib.request.Request(url, data=body, headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def _npy(arr) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


# ---------------------------------------------------------------- batcher

def test_microbatcher_rows_routed_and_coalesced():
    calls = []

    def run(batch):
        calls.append(batch.shape[0])
        return batch * 2.0

    mb = MicroBatcher(run, max_batch=8, window_ms=30.0)
    try:
        xs = [np.full((2, 2), i, np.float32) for i in range(12)]
        futs = [mb.submit(x) for x in xs]
        outs = [f.result(timeout=10) for f in futs]
        for i, (kind, o) in enumerate(outs):
            assert kind == "proba"
            np.testing.assert_array_equal(o, xs[i] * 2.0)  # own row back
        assert mb.requests == 12
        assert mb.batches < 12          # coalescing happened
        assert sum(calls) == 12
    finally:
        mb.stop()


def test_microbatcher_error_propagates_to_all_waiters():
    def run(batch):
        raise RuntimeError("boom")

    mb = MicroBatcher(run, max_batch=4, window_ms=20.0)
    try:
        futs = [mb.submit(np.zeros((1,), np.float32)) for _ in range(3)]
        for f in futs:
            with pytest.raises(RuntimeError, match="boom"):
                f.result(timeout=10)
    finally:
        mb.stop()


# ------------------------------------------------------------ http server

@pytest.fixture(scope="module")
def served():
    predictor = Predictor(ModelConfig(name="unet"), bucket_batches=True)
    service = SegmentationService(predictor, (32, 32), max_batch=8, window_ms=10.0)
    server = make_server(service, "unet", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{server.server_address[0]}:{server.server_address[1]}"
    yield base, predictor, service
    server.shutdown()
    service.close()


def test_healthz_and_stats(served):
    base, _, _ = served
    with urllib.request.urlopen(base + "/v1/healthz", timeout=10) as r:
        h = json.loads(r.read())
    assert h == {"status": "ok", "model": "unet", "image_size": [32, 32],
                 "tile": None}
    with urllib.request.urlopen(base + "/v1/stats", timeout=10) as r:
        s = json.loads(r.read())
    assert {"requests", "batches", "avg_batch"} <= set(s)


def test_predict_npy_uint8_matches_direct(served):
    base, predictor, _ = served
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    code, body, ctype = _post(base + "/v1/predict", _npy(u8))
    assert code == 200 and ctype == "application/octet-stream"
    probs = np.load(io.BytesIO(body))
    assert probs.shape == (1, 32, 32, 1) and probs.dtype == np.float32
    want = predictor.predict_proba(u8[None])
    np.testing.assert_allclose(probs, want, atol=1e-6)


def test_predict_npy_batched_and_mask_output(served):
    base, predictor, _ = served
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    code, body, _ = _post(base + "/v1/predict?output=mask", _npy(u8))
    assert code == 200
    masks = np.load(io.BytesIO(body))
    assert masks.shape == (3, 32, 32, 1)
    assert set(np.unique(masks)).issubset({0.0, 1.0})
    want = (predictor.predict_proba(u8) > 0.5).astype(np.float32)
    np.testing.assert_array_equal(masks, want)


def test_predict_png_roundtrip(served):
    from PIL import Image

    base, predictor, _ = served
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)  # resized to 32x32
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    code, body, ctype = _post(base + "/v1/predict", buf.getvalue(), "image/png")
    assert code == 200 and ctype == "image/png"
    mask = np.asarray(Image.open(io.BytesIO(body)))
    assert mask.shape == (32, 32)
    assert set(np.unique(mask)).issubset({0, 255})
    # parity with the dataset-style resize + direct predictor
    resized = np.asarray(Image.fromarray(rgb).resize((32, 32), Image.BILINEAR))
    want = (predictor.predict_proba(resized[None])[0, ..., 0] > 0.5)
    np.testing.assert_array_equal(mask > 0, want)


def test_predict_rejects_bad_input(served):
    base, _, _ = served
    code, body, _ = _post(base + "/v1/predict", _npy(np.zeros((8, 8, 3), np.uint8)))
    assert code == 400 and b"expected" in body
    code, body, _ = _post(base + "/v1/predict", b"not an npy")
    assert code in (400, 500)


def test_service_over_exported_artifact(tmp_path):
    """SegmentationService accepts an ExportedModel (cli.serve --artifact):
    checkpoint-free serving must match the live Predictor."""
    from eelunet_tpu.config import ModelConfig
    from eelunet_tpu.export import ExportedModel, export_model

    out = str(tmp_path / "art")
    export_model(ModelConfig(name="unet"), None, (32, 32), (1, 4), out,
                 platforms=("cpu",))
    service = SegmentationService(ExportedModel(out), (32, 32),
                                  max_batch=4, window_ms=5.0)
    try:
        rng = np.random.default_rng(5)
        u8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        probs = np.load(io.BytesIO(service.predict_npy(_npy(u8))))
        want = Predictor(ModelConfig(name="unet"),
                         bucket_batches=False).predict_proba(u8[None])
        np.testing.assert_allclose(probs, want, atol=1e-6)
    finally:
        service.close()


def test_concurrent_singles_coalesce(served):
    base, _, service = served
    before = service.batcher.batches
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(8)]
    results = [None] * 8

    def call(i):
        code, body, _ = _post(base + "/v1/predict", _npy(imgs[i]))
        assert code == 200
        results[i] = np.load(io.BytesIO(body))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None and r.shape == (1, 32, 32, 1) for r in results)
    # 8 concurrent singles must not have taken 8 separate device batches
    assert service.batcher.batches - before < 8


def test_microbatcher_stop_fails_pending_and_rejects_new():
    """stop() must resolve queued futures (waiters would otherwise block
    forever in Future.result()) and reject post-stop submissions."""
    import threading

    from eelunet_tpu.serving import MicroBatcher

    release = threading.Event()

    def slow_run(batch):
        release.wait(timeout=10)
        return batch.astype(np.float32)

    b = MicroBatcher(slow_run, max_batch=2, window_ms=1.0)
    first = b.submit(np.zeros((2, 2, 3), np.uint8))   # occupies the worker
    import time as _t

    _t.sleep(0.1)                                      # worker picks it up
    queued = b.submit(np.ones((2, 2, 3), np.uint8))    # sits in the queue
    release.set()
    first.result(timeout=10)
    b.stop()
    late = b.submit(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(RuntimeError):
        late.result(timeout=5)
    # `queued` either ran before stop drained it or was failed by stop —
    # it must be RESOLVED either way, never left pending.
    assert queued.done()


def test_latency_percentiles_reported(served):
    """After traffic, /v1/stats must report request-latency and device-time
    percentiles (recent-window tail latency, a serving SLO surface the
    offline reference has no equivalent for)."""
    base, _, service = served
    x = np.random.default_rng(3).integers(0, 255, (1, 32, 32, 3), np.uint8)
    for _ in range(3):
        status, _, _ = _post(base + "/v1/predict", _npy(x))
        assert status == 200
    with urllib.request.urlopen(base + "/v1/stats", timeout=10) as r:
        s = json.loads(r.read())
    for key in ("latency_ms", "device_ms"):
        p = s[key]
        assert p is not None and set(p) == {"p50", "p95", "p99"}
        assert 0.0 <= p["p50"] <= p["p95"] <= p["p99"]
    # wall latency includes the device time it wraps
    assert s["latency_ms"]["p50"] >= s["device_ms"]["p50"] * 0.5


def test_tiled_serving_native_resolution():
    """--tile mode: PNG and npy requests of ANY size come back at their
    native resolution (fixed-shape sliding windows under the device lock),
    and stats account for the traffic."""
    from PIL import Image

    predictor = Predictor(ModelConfig(name="unet"), bucket_batches=True)
    service = SegmentationService(predictor, (32, 32), max_batch=8,
                                  window_ms=5.0, tile=32, tile_overlap=8)
    try:
        # odd-sized PNG -> same-sized mask
        rng = np.random.default_rng(11)
        rgb = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        out = service.predict_png(buf.getvalue())
        mask = np.asarray(Image.open(io.BytesIO(out)))
        assert mask.shape == (50, 70)
        assert set(np.unique(mask)) <= {0, 255}

        # odd-sized npy batch passes the (relaxed) shape check
        arr = rng.integers(0, 256, (2, 40, 48, 3), dtype=np.uint8)
        probs = np.load(io.BytesIO(service.predict_npy(_npy(arr))))
        assert probs.shape == (2, 40, 48, 1)
        assert service.batcher.requests == 3
        assert service.stats()["tile"] == 32
    finally:
        service.close()


def test_tiled_serving_rejects_artifact_predictor():
    class FixedShapeOnly:
        def predict_proba(self, b):
            return b

    with pytest.raises(ValueError, match="tiled serving"):
        SegmentationService(FixedShapeOnly(), (32, 32), tile=32)


def test_predict_npy_single_mask_device_wire(served):
    """A single-image ?output=mask request rides the coalesced mask wire
    (uint8 device threshold) and returns the same float32 {0,1} npy response
    as the host-threshold path."""
    base, predictor, _ = served
    rng = np.random.default_rng(9)
    u8 = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    code, body, _ = _post(base + "/v1/predict?output=mask", _npy(u8))
    assert code == 200
    mask = np.load(io.BytesIO(body))
    assert mask.shape == (1, 32, 32, 1) and mask.dtype == np.float32
    want = (predictor.predict_proba(u8[None]) > 0.5).astype(np.float32)
    np.testing.assert_array_equal(mask, want)


def test_microbatcher_double_buffered_dispatch_collect():
    """Two-phase mode: the worker dispatches batch N+1 before collecting
    batch N (overlap), every row still routes to its own future, and an
    in-flight batch resolves on idle (no new traffic) and on stop()."""
    import time as _t

    events = []

    def dispatch(batch):
        events.append(("dispatch", batch.shape[0]))
        return ("h", batch)

    def collect(handle):
        tag, batch = handle
        events.append(("collect", batch.shape[0]))
        return batch * 3.0

    mb = MicroBatcher(
        run_batch=lambda b: b * 3.0, max_batch=4, window_ms=10.0,
        dispatch_batch=dispatch, dispatch_batch_mask=dispatch, collect=collect,
    )
    try:
        xs = [np.full((2, 2), i, np.float32) for i in range(10)]
        futs = [mb.submit(x) for x in xs]
        outs = [f.result(timeout=10) for f in futs]
        for i, (kind, o) in enumerate(outs):
            assert kind == "proba"
            np.testing.assert_array_equal(o, xs[i] * 3.0)
        assert events and events[0][0] == "dispatch"
        assert sum(n for e, n in events if e == "dispatch") == 10
        # idle resolution: collects caught up with dispatches
        assert sum(n for e, n in events if e == "collect") == 10
        # a lone in-flight batch must resolve without further traffic
        lone = mb.submit(np.full((2, 2), 42, np.float32))
        kind, o = lone.result(timeout=10)
        np.testing.assert_array_equal(o, np.full((2, 2), 126.0, np.float32))
    finally:
        mb.stop()


def test_microbatcher_double_buffered_stop_resolves_inflight():
    """stop() while a dispatched batch is uncollected must still resolve
    its futures (the loop drains pending on exit)."""
    slow = threading.Event()

    def dispatch(batch):
        return batch

    def collect(handle):
        slow.wait(timeout=5)
        return handle + 1.0

    mb = MicroBatcher(
        run_batch=lambda b: b + 1.0, max_batch=2, window_ms=1.0,
        dispatch_batch=dispatch, dispatch_batch_mask=dispatch, collect=collect,
    )
    fut = mb.submit(np.zeros((2, 2), np.float32))
    slow.set()
    kind, out = fut.result(timeout=10)
    np.testing.assert_array_equal(out, np.ones((2, 2), np.float32))
    mb.stop()


# ---------------------------------------------------------- backpressure

class _SlowPredictor:
    """Minimal predictor (predict_proba only) with a controllable service
    time, for overload tests that must not depend on compile latency."""

    def __init__(self, delay_s=0.05):
        self.delay_s = delay_s

    def predict_proba(self, batch):
        time.sleep(self.delay_s)
        b, h, w, _ = batch.shape
        return np.full((b, h, w, 1), 0.75, np.float32)


def _slow_batcher(delay_s=0.2, **kw):
    def run(batch):
        time.sleep(delay_s)
        return batch.astype(np.float32)

    return MicroBatcher(run, **kw)


def test_microbatcher_sheds_on_max_pending():
    """Beyond max_pending queued items, submit() raises Overloaded and the
    shed counter advances; after the backlog drains, admission reopens."""
    from eelunet_tpu.serving import Overloaded

    mb = _slow_batcher(delay_s=0.3, max_batch=1, window_ms=1.0, max_pending=3)
    try:
        ok, shed = [], 0
        for i in range(12):
            try:
                ok.append(mb.submit(np.full((2, 2), i, np.float32)))
            except Overloaded:
                shed += 1
        assert shed > 0 and len(ok) >= 1
        assert mb.shed == shed
        # pending never exceeded the bound (qsize is the queued backlog)
        assert mb._q.qsize() <= mb.max_pending
        for f in ok:
            f.result(timeout=30)
        # backlog drained -> new work admitted again
        mb.submit(np.zeros((2, 2), np.float32)).result(timeout=30)
    finally:
        mb.stop()


def test_microbatcher_deadline_fails_queued_only():
    """A deadline expires a request only while QUEUED; once its batch has
    started it always completes. Expired futures fail with DeadlineExceeded
    and advance the expired counter."""
    from eelunet_tpu.serving import DeadlineExceeded

    mb = _slow_batcher(delay_s=0.4, max_batch=1, window_ms=1.0)
    try:
        # first occupies the worker; generous deadline — must complete even
        # though service time (0.4s) exceeds it after start
        first = mb.submit(np.zeros((2, 2), np.float32), deadline_s=10.0)
        time.sleep(0.1)  # worker picked it up
        # queued behind a 0.4s batch with a 1ms deadline -> expires
        doomed = mb.submit(np.ones((2, 2), np.float32), deadline_s=0.001)
        with pytest.raises(DeadlineExceeded):
            doomed.result(timeout=30)
        kind, out = first.result(timeout=30)
        assert kind == "proba"
        assert mb.expired == 1
    finally:
        mb.stop()


def test_run_exclusive_deadline_and_admission():
    """Direct jobs (pre-batched npy path) respect both the admission bound
    and the deadline while waiting on the device lock."""
    from eelunet_tpu.serving import DeadlineExceeded, Overloaded

    mb = _slow_batcher(delay_s=0.0, max_batch=1, window_ms=1.0, max_pending=2)
    try:
        hold = threading.Event()
        started = threading.Event()

        def blocker():
            def thunk():
                started.set()
                hold.wait(timeout=10)
                return 0

            mb.run_exclusive(thunk, items=1)

        t = threading.Thread(target=blocker)
        t.start()
        assert started.wait(timeout=5)

        # a direct job queued behind the blocker with a tiny deadline fails
        errs = []

        def waiter():
            try:
                mb.run_exclusive(lambda: 1, items=1, deadline_s=0.05)
            except DeadlineExceeded as e:
                errs.append(e)

        t2 = threading.Thread(target=waiter)
        t2.start()
        time.sleep(0.2)
        # blocker holds the device (not counted), waiter waits (1 pending);
        # 4 more direct items > max_pending=2 -> shed at admission
        with pytest.raises(Overloaded):
            mb.run_exclusive(lambda: 2, items=4)
        hold.set()
        t.join(timeout=10)
        t2.join(timeout=10)
        assert len(errs) == 1 and mb.expired >= 1 and mb.shed >= 4
    finally:
        mb.stop()


def test_http_503_retry_after_and_504_deadline():
    """HTTP layer: saturation -> 503 + Retry-After; a queued request whose
    deadline_ms passes -> 504. Stats expose the backpressure counters."""
    service = SegmentationService(
        _SlowPredictor(delay_s=0.4), (8, 8), max_batch=1, window_ms=1.0,
        max_pending=2,
    )
    server = make_server(service, "slow", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{server.server_address[0]}:{server.server_address[1]}"
    try:
        img = np.zeros((8, 8, 3), np.uint8)

        def call(out, dl=None):
            url = base + "/v1/predict"
            if dl is not None:
                url += f"?deadline_ms={dl}"
            req = urllib.request.Request(
                url, data=_npy(img),
                headers={"Content-Type": "application/octet-stream"})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    out.append((r.status, dict(r.headers)))
            except urllib.error.HTTPError as e:
                out.append((e.code, dict(e.headers)))

        flood: list = []
        threads = [threading.Thread(target=call, args=(flood,))
                   for _ in range(10)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        codes = [c for c, _ in flood]
        assert 503 in codes, codes
        assert 200 in codes, codes
        assert all(h.get("Retry-After") for c, h in flood if c == 503)

        # deadline: one slow batch in flight, then a 1ms-deadline request
        inflight: list = []
        doomed: list = []
        t1 = threading.Thread(target=call, args=(inflight,))
        t1.start()
        time.sleep(0.1)
        call(doomed, dl=1)
        t1.join(timeout=30)
        assert doomed[0][0] == 504, doomed

        with urllib.request.urlopen(base + "/v1/stats", timeout=10) as r:
            s = json.loads(r.read())
        assert s["max_pending"] == 2
        assert s["shed"] >= 1 and s["expired"] >= 1
        assert "queue_depth" in s
    finally:
        server.shutdown()
        service.close()


def test_overload_bounded_latency_and_queue():
    """Sustained 2x overload: accepted-request p99 stays bounded by the
    admission bound (max_pending * service_time + slack), the queue never
    grows past max_pending, and throughput holds at device capacity. This
    is the load test for the bounded-queue design — without max_pending the
    backlog and tail latency grow linearly with offered load."""
    delay, max_pending = 0.05, 4
    mb = _slow_batcher(delay_s=delay, max_batch=1, window_ms=0.5,
                       max_pending=max_pending)
    from eelunet_tpu.serving import Overloaded

    try:
        futs, lat, shed, depth_max = [], [], 0, 0
        t_end = time.monotonic() + 3.0
        # offered load ~2x capacity: capacity = 1/delay = 20 rps, we offer
        # one submit every delay/2 without waiting on results
        while time.monotonic() < t_end:
            t0 = time.monotonic()
            try:
                f = mb.submit(np.zeros((2, 2), np.float32))
            except Overloaded:
                shed += 1
            else:
                f.add_done_callback(
                    lambda _f, _t0=t0: lat.append(time.monotonic() - _t0))
                futs.append(f)
            depth_max = max(depth_max, mb._q.qsize())
            time.sleep(delay / 2)
        for f in futs:
            f.result(timeout=30)
        assert shed > 0                      # genuinely overloaded
        assert depth_max <= max_pending      # bounded backlog == bounded RSS
        # accepted-request p99 is bounded by (backlog drain + own service
        # time); without max_pending it would grow with the 2x excess
        p99 = sorted(lat)[max(0, int(len(lat) * 0.99) - 1)]
        assert p99 < (max_pending + 2) * delay + 0.5
    finally:
        mb.stop()


def test_service_two_phase_matches_sync_values(served):
    """The served fixture's Predictor supports dispatch/collect, so the
    batcher runs double-buffered — responses must equal the direct
    predictor outputs (already asserted by the roundtrip tests; here we
    assert the mode is actually ON so those tests cover the pipeline)."""
    _, predictor, service = served
    assert service.batcher._dispatch is not None
    assert service.batcher._collect is not None
    # collect(dispatch(x)) == predict_proba(x) (f32 contract preserved)
    x = np.random.default_rng(21).integers(0, 256, (2, 32, 32, 3), np.uint8)
    got = predictor.collect(predictor.dispatch_proba(x))
    np.testing.assert_array_equal(got, predictor.predict_proba(x))
    m = predictor.collect(predictor.dispatch_mask_wire(x))
    np.testing.assert_array_equal(m, predictor.predict_mask_wire(x))


# ---------------------------------------------------------- hot reload

def _save_weights_ckpt(path, params, batch_stats):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), {"params": params, "batch_stats": batch_stats})
    ckptr.wait_until_finished()
    return str(path)


def test_hot_reload_zero_failed_requests(tmp_path):
    """Weight hot-swap under live traffic: every request succeeds (200),
    the swap actually lands (post-reload outputs equal the new weights'
    predictions), and stats count the reload."""
    import jax

    predictor = Predictor(ModelConfig(name="unet"), bucket_batches=True)
    # Two weight sets with visibly different outputs: the boot weights and
    # a scaled copy saved as an orbax checkpoint.
    new_params = jax.tree_util.tree_map(lambda x: x * 1.5, predictor.params)
    ckpt = _save_weights_ckpt(tmp_path / "w2", new_params, predictor.batch_stats)

    service = SegmentationService(predictor, (32, 32), max_batch=8, window_ms=5.0)
    server = make_server(service, "unet", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{server.server_address[0]}:{server.server_address[1]}"
    try:
        rng = np.random.default_rng(3)
        x = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        # Expected outputs for both weight sets, computed through the same
        # program before traffic starts.
        probs_old = predictor.predict_proba(x[None])
        saved = predictor.params
        predictor.params = new_params
        probs_new = predictor.predict_proba(x[None])
        predictor.params = saved

        results = []
        stop = threading.Event()

        def client():
            while not stop.is_set():
                code, body, _ = _post(base + "/v1/predict", _npy(x))
                results.append((code, np.load(io.BytesIO(body)) if code == 200 else None))

        threads = [threading.Thread(target=client) for _ in range(4)]
        for th in threads:
            th.start()
        time.sleep(0.3)  # in-flight traffic on the old weights
        code, body, _ = _post(base + "/v1/reload",
                              json.dumps({"checkpoint": ckpt}).encode(),
                              ctype="application/json")
        assert code == 200, body
        assert json.loads(body)["reloads"] == 1
        # Traffic on the new weights: wait until at least one post-reload
        # response lands (deadline-bounded, not a fixed sleep — on a loaded
        # 1-core host a 0.3 s window can see zero client turnarounds, which
        # flaked this test while a TPU eval hogged the core).
        # Each of the 4 clients may have one PRE-swap request still in
        # flight, so demand two more turnarounds per client: the second
        # necessarily STARTED after the reload response, i.e. post-swap.
        seen_before = len(results)
        deadline = time.time() + 30.0
        while len(results) < seen_before + 8 and time.time() < deadline:
            time.sleep(0.05)
        stop.set()
        for th in threads:
            th.join(timeout=30)

        assert results, "clients made no requests"
        codes = {c for c, _ in results}
        assert codes == {200}, f"failed requests during reload: {codes}"
        # every response is exactly one of the two weight sets' outputs —
        # never a torn mix
        n_new = 0
        for _, probs in results:
            d_old = float(np.abs(probs - probs_old).max())
            d_new = float(np.abs(probs - probs_new).max())
            assert min(d_old, d_new) < 1e-5, (d_old, d_new)
            n_new += d_new < d_old
        assert n_new > 0, "no request observed the new weights"
        # the service now serves the new weights
        code, body, _ = _post(base + "/v1/predict", _npy(x))
        assert code == 200
        np.testing.assert_allclose(np.load(io.BytesIO(body)), probs_new, atol=1e-6)
        with urllib.request.urlopen(base + "/v1/stats", timeout=10) as r:
            s = json.loads(r.read())
        assert s["reloads"] == 1 and s["checkpoint"] == ckpt
    finally:
        server.shutdown()
        service.close()


def test_hot_reload_bad_requests():
    """Reload error paths: missing body field -> 400; a predictor without
    stage/commit (StableHLO artifact) -> ValueError."""
    predictor = Predictor(ModelConfig(name="unet"), bucket_batches=True)
    service = SegmentationService(predictor, (32, 32))
    server = make_server(service, "unet", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{server.server_address[0]}:{server.server_address[1]}"
    try:
        code, body, _ = _post(base + "/v1/reload", b"{}", ctype="application/json")
        assert code == 400 and b"checkpoint" in body
        code, body, _ = _post(base + "/v1/reload",
                              json.dumps({"checkpoint": "/does/not/exist"}).encode(),
                              ctype="application/json")
        assert code in (400, 500) and service.reloads == 0
    finally:
        server.shutdown()
        service.close()

    class _Frozen:  # artifact-style predictor: no stage/commit
        predict_proba = staticmethod(lambda b: b)

    svc = SegmentationService(_Frozen(), (32, 32))
    try:
        with pytest.raises(ValueError, match="hot reload"):
            svc.reload_checkpoint("/tmp/x")
    finally:
        svc.close()
