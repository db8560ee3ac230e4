"""HTTP serving CLI (vqa_tpu/cli/serve.py) over a trained fixture run."""

import json
import os
import threading
import urllib.error
import urllib.request

import pytest

from vqa_tpu.cli.serve import AnswerService, build_server
from vqa_tpu.cli.train import main as train_main
from vqa_tpu.datasets.fixtures import generate
from vqa_tpu.predictor import Predictor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("servefix"))
    generate(d, n_images=10, n_questions=48, seed=5)
    logs = os.path.join(d, "logs")
    rc = train_main([
        "--path_opt", os.path.join(REPO, "options/vqa2/concat_att.yaml"),
        "--dir_logs", logs, "--epochs", "1", "--batch_size", "16",
        "--print_freq", "0",
        "--opt", f"vqa.dir={d}/vqa2", "--opt", f"coco.dir={d}/coco",
        "--opt", "vqa.nans=20",
        "--opt", "model.seq2vec.emb_size=12", "--opt", "model.seq2vec.hidden_size=16",
        "--opt", "model.attention.dim_h=12", "--opt", "model.classif.dim_h=12",
    ])
    assert rc == 0
    predictor = Predictor.from_run(logs, resume="best")
    service = AnswerService(predictor, max_batch=4)
    service.warmup()
    server = build_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield predictor, service, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:  # non-2xx still carries a JSON body
        return e.code, json.loads(e.read())


def test_healthz(served):
    _, _, base = served
    with urllib.request.urlopen(base + "/healthz") as resp:
        assert json.loads(resp.read()) == {"ok": True}


def test_answer_matches_predictor(served):
    predictor, _, base = served
    image = predictor.dataset.split.image_names[0]
    status, body = _post(base + "/answer",
                         {"question": "What color is the cat?", "image": image,
                          "topk": 3})
    assert status == 200
    direct = predictor.answer("What color is the cat?", image, topk=3)
    assert [a for a, _ in body["answers"]] == [a for a, _ in direct]
    for (_, p1), (_, p2) in zip(body["answers"], direct):
        assert abs(p1 - p2) < 1e-4


def test_batch_chunks_past_max_batch(served):
    predictor, service, base = served
    images = predictor.dataset.split.image_names[:3]
    questions = [f"Is object {i} red?" for i in range(9)]
    status, body = _post(base + "/batch",
                         {"questions": questions,
                          "images": [images[i % 3] for i in range(9)]})
    assert status == 200
    assert len(body["answers"]) == 9  # 9 > max_batch 4: chunked + padded
    # same (question, image) must yield the same answers regardless of
    # chunk position — catches pad-row leakage / row misalignment
    direct = predictor.answer_batch(questions, [images[i % 3] for i in range(9)])
    for served, want in zip(body["answers"], direct):
        assert [a for a, _ in served] == [a for a, _ in want]


def test_bad_requests(served):
    _, _, base = served
    status, body = _post(base + "/answer", {"question": "missing image"})
    assert status == 400 and "image" in body["error"]
    status, body = _post(base + "/batch",
                         {"questions": ["a", "b"], "images": ["only-one"]})
    assert status == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/nope")
    assert e.value.code == 404


def test_unknown_image_is_404_not_missing_field(served):
    _, _, base = served
    status, body = _post(
        base + "/answer", {"question": "q", "image": "no-such-image"}
    )
    # a feature-store miss is a lookup failure (404 with the store's own
    # message), not a malformed request ("missing field") — the two
    # KeyError sources used to be conflated
    assert status == 404
    assert "no-such-image" in body["error"]
    assert "missing field" not in body["error"]


def test_topk_validation(served):
    _, service, base = served
    image_req = {"question": "q", "image": "img"}
    for bad in (0, -3, service.num_answers + 1):
        status, body = _post(base + "/answer", dict(image_req, topk=bad))
        assert status == 400 and "topk" in body["error"]


def test_missing_content_length_is_411(served):
    _, _, base = served
    import http.client
    from urllib.parse import urlparse

    u = urlparse(base)
    conn = http.client.HTTPConnection(u.hostname, u.port)
    try:
        # hand-rolled request with no Content-Length (chunked body)
        conn.putrequest("POST", "/answer", skip_accept_encoding=True)
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        body = b'{"question": "q", "image": "img"}'
        conn.send(b"%x\r\n%s\r\n0\r\n\r\n" % (len(body), body))
        resp = conn.getresponse()
        assert resp.status == 411
        assert "Content-Length" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_dynamic_batcher_coalesces_and_matches(served):
    """Concurrent single requests share forwards (micro-batching) and the
    answers match the plain service exactly; per-request topk is honored."""
    from vqa_tpu.cli.serve import DynamicBatcher

    predictor, service, _ = served
    dyn = DynamicBatcher(AnswerService(predictor, max_batch=4), max_wait_ms=250)
    names = predictor.dataset.split.image_names
    n = 8
    qs = [f"is object number {i} red" for i in range(n)]
    ims = [str(names[i % len(names)]) for i in range(n)]
    expected = service.answer_batch(qs, ims, topk=3)

    # coalescing is timing-dependent (a scheduler stall can close groups
    # solo); correctness is asserted every round, coalescing within 3 tries
    coalesced = False
    for _ in range(3):
        results = [None] * n
        barrier = threading.Barrier(n)

        def hit(i):
            barrier.wait()
            results[i] = dyn.answer_batch([qs[i]], [ims[i]], topk=3)[0]

        before = dyn.forwards
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for got, expect in zip(results, expected):
            assert [a for a, _ in got] == [a for a, _ in expect]
            assert all(abs(p - q) < 1e-6 for (_, p), (_, q) in zip(got, expect))
        # fully-uncoalesced would be n forwards for the round
        if dyn.forwards - before < n:
            coalesced = True
            break
    assert coalesced, "no coalescing observed in 3 concurrent rounds"
    # per-request topk slices the shared (max-topk) forward
    assert len(dyn.answer_batch([qs[0]], [ims[0]], topk=1)[0]) == 1
    dyn.shutdown()  # leaked parked threads starve small hosts (r5s25)


def test_dynamic_batcher_isolates_bad_request(served):
    """One unknown image in a coalesced group must not fail its neighbors
    (the worker retries individually), and the bad one surfaces its error."""
    from vqa_tpu.cli.serve import DynamicBatcher

    predictor, _, _ = served
    dyn = DynamicBatcher(AnswerService(predictor, max_batch=4), max_wait_ms=250)
    good_im = str(predictor.dataset.split.image_names[0])
    outcomes = [None, None]
    barrier = threading.Barrier(2)

    def hit(i, image):
        barrier.wait()
        try:
            outcomes[i] = dyn.answer_batch(["what is it"], [image], topk=2)[0]
        except KeyError as e:
            outcomes[i] = e

    threads = [
        threading.Thread(target=hit, args=(0, good_im)),
        threading.Thread(target=hit, args=(1, "NO_SUCH_IMAGE")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert isinstance(outcomes[1], KeyError)
    assert isinstance(outcomes[0], list) and len(outcomes[0]) == 2
    dyn.shutdown()


def test_metrics_endpoint(served):
    predictor, service, base = served
    before = service.stats()
    _post(base + "/answer",
          {"question": "metrics probe", "image": str(predictor.dataset.split.image_names[0])})
    with urllib.request.urlopen(base + "/metrics") as resp:
        m = json.loads(resp.read())
    assert m["requests"] > before["requests"]
    assert m["forwards"] >= m["requests"]  # chunking can only add forwards
    assert m["rows"] >= m["requests"]
    assert m["device_seconds"] > 0
    assert m["rows_per_forward"] is not None


def test_stats_readable_while_forward_blocked():
    """/metrics must not block behind the device lock: the counters are the
    operator's wedge diagnostics."""
    import time as _time

    release = threading.Event()

    class BlockingPredictor:
        class dataset:  # noqa: N801 — duck-typed attribute bag
            num_answers = 5

        def answer_batch(self, q, im, topk=5):
            release.wait(60)  # event-gated, not sleep(3600): the thread
            return [[("?", 0.0)]] * len(q)  # must exit with the test

    svc = AnswerService(BlockingPredictor(), max_batch=2)
    t = threading.Thread(target=lambda: svc.answer_batch(["q"], ["i"]), daemon=True)
    t.start()
    _time.sleep(0.2)  # let the forward take the device lock
    t0 = _time.monotonic()
    s = svc.stats()
    blocked = _time.monotonic() - t0
    release.set()
    t.join(timeout=10)
    assert blocked < 1.0, "stats blocked behind the device lock"
    assert s["requests"] == 1 and s["forwards"] == 0


def test_dynamic_batcher_request_timeout():
    """A wedged backend (forward never returns) must 504 the client within
    the deadline instead of hanging it forever."""
    import time as _time

    from vqa_tpu.cli.serve import DynamicBatcher

    release = threading.Event()

    class WedgedService:
        max_batch = 4
        num_answers = 5

        def answer_batch(self, questions, images, topk=5):
            release.wait(60)  # event-gated wedge: exits with the test
            return [[("?", 0.0)]] * len(questions)

    dyn = DynamicBatcher(WedgedService(), max_wait_ms=1, request_timeout_s=0.5)
    t0 = _time.monotonic()
    with pytest.raises(TimeoutError, match="unresponsive"):
        dyn.answer_batch(["q"], ["img"], topk=1)
    assert _time.monotonic() - t0 < 5.0
    release.set()
    dyn.shutdown()


def test_dynamic_batcher_drops_abandoned_requests():
    """A request whose client already 504'd must never reach the device
    when its turn comes (retries would double the load at recovery)."""
    import time as _time

    from vqa_tpu.cli.serve import DynamicBatcher

    class GatedService:
        max_batch = 1
        num_answers = 5

        def __init__(self):
            self.calls = []
            self.gate = threading.Event()

        def answer_batch(self, qs, ims, topk=5):
            self.calls.append(list(qs))
            if qs[0] == "A":
                self.gate.wait()
            return [[("yes", 1.0)]] * len(qs)

    svc = GatedService()
    dyn = DynamicBatcher(svc, max_wait_ms=1, request_timeout_s=0.3)
    a = threading.Thread(
        target=lambda: dyn.answer_batch(["A"], ["img"], topk=1), daemon=True
    )
    a.start()
    _time.sleep(0.1)  # A is in-flight, holding the worker
    with pytest.raises(TimeoutError):
        dyn.answer_batch(["B"], ["img"], topk=1)  # queued behind A, times out
    svc.gate.set()  # device "recovers"
    a.join(timeout=5)
    out = dyn.answer_batch(["C"], ["img"], topk=1)  # sanity: service live again
    assert out[0][0][0] == "yes"
    assert ["B"] not in svc.calls, "abandoned request still hit the device"
    # BOTH A and B timed out (A was in-flight past its own deadline — its
    # forward necessarily completes; only still-queued B could be dropped)
    assert dyn.stats()["batcher"]["timeouts"] == 2
    dyn.shutdown()


def test_concurrent_requests_serialize_correctly(served):
    """ThreadingHTTPServer + the service lock: concurrent posts both get
    correct, row-aligned answers (device work serializes, requests don't
    corrupt each other)."""
    import threading

    predictor, _, base = served
    images = predictor.dataset.split.image_names[:2]
    want = [predictor.answer(f"Is it {i}?", images[i], topk=2) for i in range(2)]
    results = [None, None]

    def hit(i):
        _, body = _post(base + "/answer",
                        {"question": f"Is it {i}?", "image": images[i], "topk": 2})
        results[i] = body["answers"]

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got, expect in zip(results, want):
        assert [a for a, _ in got] == [a for a, _ in expect]


def test_server_absorbs_connection_churn():
    """Regression for the r3 ConnectionResetError(104)s: the kernel listen
    queue must be deep enough to absorb one-connection-per-request churn
    while the accept loop waits on the GIL (stdlib default backlog of 5
    overflowed at 16 clients; the kernel RSTs past the queue), and HTTP/1.1
    keep-alive must be on so well-behaved clients stay out of it."""
    from vqa_tpu.cli.serve import VQAHTTPServer, make_handler

    assert VQAHTTPServer.request_queue_size >= 128
    assert VQAHTTPServer.daemon_threads

    class _Svc:  # make_handler only needs .num_answers for topk validation
        num_answers = 10

    assert make_handler(_Svc()).protocol_version == "HTTP/1.1"


def test_dynamic_batcher_quiescence_window(served):
    """A staggered burst (arrivals a few ms apart) coalesces into ONE group:
    each arrival re-arms the inter-arrival gap, so the group closes one quiet
    gap after the LAST straggler — not batch_wait_ms after the first (which
    caught ~half the burst in SERVE_r03)."""
    import time

    from vqa_tpu.cli.serve import DynamicBatcher

    predictor, _, _ = served
    names = predictor.dataset.split.image_names
    n = 6
    # gap 60ms, stagger 25ms: a first-arrival-only window (60ms) would close
    # after ~2 arrivals; the re-armed gap must catch all n
    dyn = DynamicBatcher(AnswerService(predictor, max_batch=16),
                         max_wait_ms=60, window_ms=2000)
    coalesced = False
    for _ in range(3):  # timing-dependent: retry like the coalescing test
        before = dyn.forwards
        results = [None] * n

        def hit(i):
            results[i] = dyn.answer_batch(
                [f"is object {i} red"], [str(names[i % len(names)])], topk=1
            )[0]

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
            time.sleep(0.025)
        for t in threads:
            t.join()
        assert all(r is not None for r in results)
        if dyn.forwards - before == 1:
            coalesced = True
            break
    assert coalesced, "staggered burst did not coalesce into one forward"
    dyn.shutdown()


def test_dynamic_batcher_shutdown_stops_worker():
    """shutdown() must actually end the worker thread (leaked parked threads
    outlive their test and add scheduler load on small hosts — the r5s25
    full-suite aborts were XLA:CPU rendezvous starvation on 1 vCPU), be
    idempotent, and not disturb in-flight semantics before it's called."""
    from vqa_tpu.cli.serve import DynamicBatcher

    class EchoService:
        max_batch = 4
        num_answers = 5

        def answer_batch(self, qs, ims, topk=5):
            return [[("yes", 1.0)]] * len(qs)

    dyn = DynamicBatcher(EchoService(), max_wait_ms=1, request_timeout_s=5)
    assert dyn.answer_batch(["q"], ["img"], topk=1)[0][0][0] == "yes"
    assert dyn._worker.is_alive()
    dyn.shutdown()
    assert not dyn._worker.is_alive(), "worker survived shutdown()"
    dyn.shutdown()  # idempotent
