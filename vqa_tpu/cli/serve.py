"""Serving CLI: an HTTP answer service over a run dir (production-side
complement to SURVEY.md C23's demo; the Predictor API made deployable).

  python -m vqa_tpu.cli.serve --dir_logs logs/vqa2/mutan_att \
      [--resume best | --no_resume] [--host 127.0.0.1] [--port 8080] \
      [--max_batch 64]

AOT mode — serve a frozen ``cli.export`` artifact instead of a run dir (no
model code on the load path, zero runtime compiles; batch is fixed at the
exported shape):

  python -m vqa_tpu.cli.serve --exported exported/ [--coco_dir data/coco]

Endpoints (JSON over POST, plus GET /healthz and GET /metrics — request/
row/forward counters, device seconds, rows-per-forward, batcher queue
depth/timeouts):
  /answer  {"question": str, "image": str, "topk"?: int}
           -> {"answers": [[answer, prob], ...]}
  /batch   {"questions": [str], "images": [str], "topk"?: int}
           -> {"answers": [[[answer, prob], ...], ...]}

TPU-shape discipline: every forward pads the batch dim to --max_batch, so
the server compiles exactly ONE program at startup (a warmup request) and
never recompiles, whatever request sizes arrive. Requests larger than
--max_batch are chunked. stdlib-only (ThreadingHTTPServer); device work is
serialized under a lock — batching, not concurrency, is the throughput
lever on one chip. --dynamic_batching coalesces concurrent requests into
shared forwards (micro-batching: up to --max_batch rows per forward; the
group closes --batch_wait_ms after the LAST arrival, capped at
--batch_window_ms total), so concurrent singles ride the batch dimension
instead of queueing whole forwards.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence, Tuple


class AnswerService:
    """Shape-stable batched wrapper around a Predictor."""

    def __init__(self, predictor, max_batch: int = 64):
        self.predictor = predictor
        self.max_batch = max_batch
        self._lock = threading.Lock()
        # counters get their OWN mutex: /metrics must stay readable while a
        # forward holds the device lock (the wedged-device case is exactly
        # when the operator needs the numbers)
        self._stats_lock = threading.Lock()
        # 'requests'/'rows' count answer_batch CALLS (under DynamicBatcher
        # one call == one coalesced group; client counts live in the
        # batcher block of /metrics)
        self._stats = {"requests": 0, "rows": 0, "forwards": 0,
                       "device_seconds": 0.0}

    @property
    def num_answers(self) -> int:
        return self.predictor.dataset.num_answers

    def warmup(self) -> None:
        image = self.predictor.dataset.split.image_names[0]
        self.answer_batch(["warmup question"], [image], topk=1)

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
        s["rows_per_forward"] = round(s["rows"] / s["forwards"], 2) if s["forwards"] else None
        return s

    def _bump(self, **deltas) -> None:
        with self._stats_lock:
            for k, v in deltas.items():
                self._stats[k] += v

    def answer_batch(
        self, questions: Sequence[str], images: Sequence[str], topk: int = 5
    ) -> List[List[Tuple[str, float]]]:
        if len(questions) != len(images):
            raise ValueError(
                f"{len(questions)} questions vs {len(images)} images"
            )
        out: List[List[Tuple[str, float]]] = []
        with self._lock:  # one device, one queue
            self._bump(requests=1, rows=len(questions))
            for start in range(0, len(questions), self.max_batch):
                q = list(questions[start : start + self.max_batch])
                im = list(images[start : start + self.max_batch])
                n = len(q)
                pad = self.max_batch - n  # fixed shape -> zero recompiles
                q += [q[-1]] * pad
                im += [im[-1]] * pad
                t0 = time.perf_counter()
                out.extend(self.predictor.answer_batch(q, im, topk=topk)[:n])
                self._bump(forwards=1,
                           device_seconds=time.perf_counter() - t0)
        return out


class DynamicBatcher:
    """Coalesce concurrent requests into shared forwards (micro-batching).

    The plain AnswerService pads every request to the fixed serving batch,
    so N concurrent single-question requests cost N forwards. This wrapper
    queues incoming rows and a worker drains up to ``max_batch`` of them per
    forward (waiting at most ``max_wait_ms`` after the first row arrives),
    so concurrent load rides the batch dimension — the TPU's throughput
    axis — instead of the queue. Same interface as AnswerService; single
    requests gain up to max_batch× throughput under concurrency, and an
    idle service adds at most ``max_wait_ms`` latency.
    """

    def __init__(
        self,
        service: AnswerService,
        max_wait_ms: float = 5.0,
        window_ms: Optional[float] = None,
        request_timeout_s: Optional[float] = None,
    ):
        self.service = service
        self.max_wait = max_wait_ms / 1000.0
        # Coalescing is QUIESCENCE-based (r4, SERVE_r03 showed 7.7 rows/
        # forward vs max_batch 32 at 16-client saturation): each arrival
        # extends the collection window by max_wait, bounded by an absolute
        # cap. Closed-loop clients answer a finished forward with a burst of
        # new requests staggered over a few ms each; a FIXED 5ms wait from
        # the first arrival caught only the head of the burst, while a 5ms
        # inter-arrival gap catches the whole burst and still closes the
        # group 5ms after the last straggler. The cap bounds worst-case
        # added latency for an idle service.
        self.window = (window_ms if window_ms is not None
                       else 8.0 * max_wait_ms) / 1000.0
        self.request_timeout = request_timeout_s
        self._q: "queue.Queue" = queue.Queue()
        self._stats_lock = threading.Lock()
        self._stats = {"client_requests": 0, "client_rows": 0,
                       "groups": 0, "timeouts": 0}
        self._shutdown = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def shutdown(self, timeout_s: float = 5.0) -> None:
        """Stop the worker thread gracefully (drains nothing: pending items
        keep their bounded client-side waits). Idempotent. Without this,
        every batcher leaks a parked thread for the process lifetime — at
        best untidy for embedders/tests, at worst extra scheduler load on
        a small host (the r5s25 suite aborts were rendezvous starvation on
        1 vCPU with a dozen leaked test threads parked)."""
        self._shutdown = True
        self._q.put(None)  # sentinel: wakes the q.get at the loop head
        self._worker.join(timeout_s)

    @property
    def forwards(self) -> int:  # coalesced group count (tests + tools)
        return self._stats["groups"]

    def _bump(self, **deltas) -> None:
        with self._stats_lock:
            for k, v in deltas.items():
                self._stats[k] += v

    def stats(self) -> dict:
        s = getattr(self.service, "stats", dict)()
        with self._stats_lock:
            b = dict(self._stats)
        b["queue_depth"] = self._q.qsize()
        s["batcher"] = b
        return s

    @property
    def num_answers(self) -> int:
        return self.service.num_answers

    def warmup(self) -> None:
        self.service.warmup()

    def answer_batch(
        self, questions: Sequence[str], images: Sequence[str], topk: int = 5
    ) -> List[List[Tuple[str, float]]]:
        if len(questions) != len(images):
            raise ValueError(f"{len(questions)} questions vs {len(images)} images")
        done = threading.Event()
        item = {
            "q": list(questions), "im": list(images), "topk": topk,
            "done": done, "out": None, "err": None, "abandoned": False,
        }
        self._bump(client_requests=1, client_rows=len(questions))
        self._q.put(item)
        # bounded wait: a wedged device (see the perf ledger's tunnel notes)
        # otherwise hangs every client forever behind the stuck forward
        if not done.wait(self.request_timeout):
            # mark it so the worker drops it instead of burning a forward
            # on a result nobody will read (client retries would otherwise
            # double the device load right at recovery)
            item["abandoned"] = True
            self._bump(timeouts=1)
            raise TimeoutError(
                f"serving backend unresponsive for {self.request_timeout:.0f}s"
            )
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def _loop(self) -> None:
        max_batch = self.service.max_batch
        carry = None  # an item that didn't fit the previous group
        while True:
            if self._shutdown:
                return
            head = carry if carry is not None else self._q.get()
            if head is None or self._shutdown:  # shutdown sentinel
                return
            group = [head]
            carry = None
            size = len(group[0]["q"])
            cap = time.monotonic() + self.window  # absolute latency bound
            gap_deadline = time.monotonic() + self.max_wait
            while size < max_batch:
                remaining = min(gap_deadline, cap) - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:  # shutdown sentinel mid-collection: finish
                    break        # this group; the loop-head check exits
                if size + len(nxt["q"]) > max_batch:
                    carry = nxt  # seed of the next group: keep the
                    break        # one-forward-per-group contract
                group.append(nxt)
                size += len(nxt["q"])
                # each arrival re-arms the gap: collect the whole burst,
                # close the group one quiet gap after the last straggler
                gap_deadline = time.monotonic() + self.max_wait
            # drop requests whose client already 504'd: nobody reads the
            # result, and executing them would double the device load with
            # retries exactly when a stalled device comes back
            group = [it for it in group if not it["abandoned"]]
            if not group:
                continue
            qs = [q for it in group for q in it["q"]]
            ims = [im for it in group for im in it["im"]]
            topk = max(it["topk"] for it in group)
            try:
                rows = self.service.answer_batch(qs, ims, topk=topk)
                self._bump(groups=1)
                pos = 0
                for it in group:
                    n = len(it["q"])
                    it["out"] = [r[: it["topk"]] for r in rows[pos : pos + n]]
                    pos += n
            except Exception:  # isolate the bad request: retry individually
                for it in group:
                    if it["abandoned"]:
                        continue
                    try:
                        it["out"] = self.service.answer_batch(
                            it["q"], it["im"], topk=it["topk"]
                        )
                        self._bump(groups=1)
                    except Exception as e:
                        it["err"] = e
            for it in group:
                it["done"].set()


def make_handler(service: AnswerService):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every response carries Content-Length (see
        # _send), so persistent connections are safe — and they keep
        # closed-loop clients OUT of the kernel accept queue. Root-caused
        # r4: the SERVE_r03 ConnectionResetError(104)s were kernel listen-
        # queue overflows (netstat ListenOverflows incremented in lockstep)
        # — the GIL-starved accept loop lagged one-connection-per-request
        # churn at 16 clients over the stdlib default backlog of 5.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/metrics":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        MAX_BODY = 8 * 1024 * 1024  # cap request buffering (OOM guard)

        def do_POST(self):
            try:
                if self.headers.get("Content-Length") is None:
                    # chunked / absent lengths would read an empty body and
                    # surface as a confusing "missing field" 400
                    self.close_connection = True  # body unread: cannot reuse
                    self._send(411, {"error": "Content-Length required"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length > self.MAX_BODY:
                    self.close_connection = True  # body unread: cannot reuse
                    self._send(413, {"error": f"body exceeds {self.MAX_BODY} bytes"})
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                topk = int(req.get("topk", 5))
                if not 1 <= topk <= service.num_answers:
                    self._send(400, {
                        "error": f"topk must be in [1, {service.num_answers}]",
                    })
                    return
                fields = {"/answer": ("question", "image"),
                          "/batch": ("questions", "images")}.get(self.path)
                if fields is None:
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                missing = [k for k in fields if k not in req]
                if missing:
                    # explicit check: a KeyError from deeper in the service
                    # (e.g. an unknown image name) must not masquerade as a
                    # malformed request
                    self._send(400, {"error": f"missing field(s) {missing}"})
                    return
                if self.path == "/answer":
                    answers = service.answer_batch(
                        [req["question"]], [req["image"]], topk=topk
                    )[0]
                    self._send(200, {"answers": answers})
                else:
                    answers = service.answer_batch(
                        req["questions"], req["images"], topk=topk
                    )
                    self._send(200, {"answers": answers})
            except TimeoutError as e:
                self._send(504, {"error": str(e)})
            except KeyError as e:
                # the feature store raises KeyError for unknown image names
                self._send(404, {"error": e.args[0] if e.args else str(e)})
            except (ValueError, TypeError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
            except Exception:  # noqa: BLE001 — internal failure, not the client's
                import traceback

                traceback.print_exc()
                self._send(500, {"error": "internal error"})

    return Handler


class VQAHTTPServer(ThreadingHTTPServer):
    # Deep listen backlog: bursts of new connections must be absorbed by the
    # kernel while the accept loop waits on the GIL (host-side tokenization/
    # readback work holds it for ms at a time). The stdlib default of 5
    # overflowed at 16 one-connection-per-request clients and the kernel
    # RST anything past the queue — observed as client-side
    # ConnectionResetError(104) with zero server-side trace (SERVE_r03).
    request_queue_size = 1024
    daemon_threads = True


def build_server(service: AnswerService, host: str, port: int) -> ThreadingHTTPServer:
    return VQAHTTPServer((host, port), make_handler(service))


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir_logs", default=None)
    p.add_argument("--exported", default=None,
                   help="serve a cli.export artifact dir instead of a run dir")
    p.add_argument("--coco_dir", default=None,
                   help="feature-table dir override for --exported mode")
    p.add_argument("--path_opt", default=None,
                   help="defaults to the run dir's own options.yaml")
    p.add_argument("--resume", default="best", help="best | latest | <epoch>")
    p.add_argument("--no_resume", action="store_true",
                   help="serve init params (a model.pretrained_params import)")
    p.add_argument("--platform", default=None, metavar="cpu|tpu|...",
                   help="force the jax backend (config API; see cli/train.py)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=None,
                   help="serving batch (default 64; fixed by the artifact "
                        "in --exported mode)")
    p.add_argument("--dynamic_batching", action="store_true",
                   help="coalesce concurrent requests into shared forwards")
    p.add_argument("--batch_wait_ms", type=float, default=5.0,
                   help="coalescing inter-arrival gap: the group closes "
                        "this long after the last queued request")
    p.add_argument("--batch_window_ms", type=float, default=None,
                   help="absolute cap on the coalescing window "
                        "(default 8x batch_wait_ms)")
    p.add_argument("--request_timeout_s", type=float, default=None,
                   help="with --dynamic_batching: bound each request's wait "
                        "(504 instead of hanging behind a wedged device)")
    args = p.parse_args(argv)

    from vqa_tpu.utils import enable_compile_cache

    from vqa_tpu.utils import force_platform

    force_platform(args.platform)
    enable_compile_cache()
    if (args.exported is None) == (args.dir_logs is None):
        p.error("exactly one of --dir_logs / --exported is required")
    if args.request_timeout_s is not None and not args.dynamic_batching:
        p.error("--request_timeout_s requires --dynamic_batching (the plain "
                "service runs the forward on the request thread and cannot "
                "abandon it)")
    if args.exported is not None:
        # fail loudly on flags the artifact makes meaningless — a silently
        # ignored --max_batch would benchmark the wrong batch size
        ignored = [
            name for name, bad in [
                ("--max_batch", args.max_batch is not None),
                ("--path_opt", args.path_opt is not None),
                ("--no_resume", args.no_resume),
                ("--resume", args.resume != "best"),
            ] if bad
        ]
        if ignored:
            p.error(
                f"{', '.join(ignored)} cannot be used with --exported: the "
                "artifact fixes the batch and already contains the weights"
            )
        from vqa_tpu.export import load_export

        predictor = load_export(args.exported, coco_dir=args.coco_dir)
        # the exported program's batch dim is frozen; serve at exactly it
        args.max_batch = predictor.batch
    else:
        from vqa_tpu.predictor import Predictor

        predictor = Predictor.from_run(
            args.dir_logs, args.path_opt,
            resume=None if args.no_resume else args.resume,
        )
    service = AnswerService(predictor, max_batch=args.max_batch or 64)
    if args.dynamic_batching:
        service = DynamicBatcher(service, max_wait_ms=args.batch_wait_ms,
                                 window_ms=args.batch_window_ms,
                                 request_timeout_s=args.request_timeout_s)
    print("warming up (one compile at the fixed serving shape)...", flush=True)
    service.warmup()
    server = build_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(max_batch {args.max_batch})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
