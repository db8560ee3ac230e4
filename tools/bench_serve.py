"""Serving load benchmark: latency percentiles + throughput over the real
HTTP stack, with and without dynamic micro-batching.

Builds a synthetic fixture + tiny-or-flagship model in-process, starts the
actual ThreadingHTTPServer (cli/serve.py), then fires closed-loop concurrent
clients at /answer and measures end-to-end request latency (encode -> HTTP
-> pad -> forward -> decode -> response). Reports p50/p95/p99 and QA/s for
the plain service vs --dynamic_batching, which shows the coalescing win
under concurrency (N singles share forwards instead of each paying one).

Usage: python tools/bench_serve.py [--platform cpu] [--flagship]
       [--clients 16] [--requests 200] [--max_batch 32] [--out FILE]
Env: SERVE_APPEND=<file> appends the JSON line for artifact assembly.

On the real chip, run tools/device_ready.py first (perf-ledger discipline).
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(service, image_names, clients: int, requests: int) -> dict:
    import urllib.request

    from vqa_tpu.cli.serve import build_server

    server = build_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    latencies = []
    errors = []
    lock = threading.Lock()
    idx = [0]

    def client():
        while True:
            with lock:
                i = idx[0]
                if i >= requests:
                    return
                idx[0] += 1
            body = json.dumps({
                "question": f"what color is object number {i}",
                "image": str(image_names[i % len(image_names)]),
                "topk": 3,
            }).encode()
            req = urllib.request.Request(
                base + "/answer", body, {"Content-Type": "application/json"}
            )
            try:
                t0 = time.perf_counter()
                with urllib.request.urlopen(req) as resp:
                    payload = json.loads(resp.read())
                dt = time.perf_counter() - t0
                assert len(payload["answers"]) == 3
            except Exception as e:  # count, don't skew the stats silently
                with lock:
                    errors.append(repr(e))
                continue
            with lock:
                latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()
    server.server_close()
    if not latencies:
        return {"requests": requests, "clients": clients,
                "errors": len(errors), "error_sample": errors[:3]}
    latencies.sort()

    def pct(p):
        return round(1000 * latencies[min(len(latencies) - 1, int(p * len(latencies)))], 1)

    out = {
        "requests": requests,
        "clients": clients,
        # throughput over COMPLETED requests only (failed ones don't count)
        "qa_per_sec": round(len(latencies) / wall, 1),
        "latency_ms": {"p50": pct(0.50), "p95": pct(0.95), "p99": pct(0.99)},
    }
    if errors:
        out["errors"] = len(errors)
        out["error_sample"] = errors[:3]
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None)
    p.add_argument("--flagship", action="store_true",
                   help="flagship dims (TPU); default tiny dims (CPU-friendly)")
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=200)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--batch_wait_ms", type=float, default=5.0)
    p.add_argument("--batch_window_ms", type=float, default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    from vqa_tpu.utils import force_platform

    force_platform(args.platform)

    import tempfile

    from vqa_tpu.cli.serve import AnswerService, DynamicBatcher
    from vqa_tpu.cli.train import main as train_main
    from vqa_tpu.datasets.fixtures import generate
    from vqa_tpu.predictor import Predictor
    from vqa_tpu.utils import enable_compile_cache

    enable_compile_cache()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as d:
        from tools.common import REDUCED_MUTAN_ATT_OVERRIDES, as_opt_flags

        generate(d, n_images=32, n_questions=96, seed=7)
        logs = os.path.join(d, "logs")
        dims = [] if args.flagship else as_opt_flags(REDUCED_MUTAN_ATT_OVERRIDES)
        rc = train_main([
            "--path_opt", os.path.join(repo, "options/vqa2/mutan_att.yaml"),
            "--dir_logs", logs, "--epochs", "1", "--batch_size", "16",
            "--print_freq", "0",
            "--opt", f"vqa.dir={d}/vqa2", "--opt", f"coco.dir={d}/coco",
            "--opt", "vqa.nans=20",
        ] + dims + (["--platform", args.platform] if args.platform else []))
        assert rc == 0
        predictor = Predictor.from_run(logs, resume="best")
        names = predictor.dataset.split.image_names

        from vqa_tpu.cli.export import main as export_main
        from vqa_tpu.export import load_export

        exp_dir = os.path.join(d, "exported")
        rc = export_main(["--dir_logs", logs, "--out", exp_dir,
                          "--batch", str(args.max_batch)]
                         + (["--platform", args.platform] if args.platform else []))
        assert rc == 0

        results = {}
        for mode in ("plain", "dynamic", "aot_dynamic"):
            backend = load_export(exp_dir) if mode == "aot_dynamic" else predictor
            service = AnswerService(backend, max_batch=args.max_batch)
            if mode != "plain":
                service = DynamicBatcher(service, max_wait_ms=args.batch_wait_ms,
                                         window_ms=args.batch_window_ms)
            service.warmup()
            # one throwaway round to settle compiles/thread pools
            _measure(service, names, clients=args.clients, requests=args.clients)
            before = service.forwards if mode != "plain" else 0
            results[mode] = _measure(
                service, names, clients=args.clients, requests=args.requests
            )
            if mode != "plain":
                # delta over the measured round only (the warm round above
                # would otherwise inflate the coalescing ratio)
                fwd = service.forwards - before
                results[mode]["forwards"] = fwd
                if fwd:  # 1 row per request in this bench
                    results[mode]["rows_per_forward"] = round(args.requests / fwd, 1)

    line = json.dumps({
        "metric": "serve_throughput",
        "dims": "flagship" if args.flagship else "tiny",
        "platform": jax.devices()[0].platform,
        "max_batch": args.max_batch,
        "batch_wait_ms": args.batch_wait_ms,
        "batch_window_ms": args.batch_window_ms,
        "modes": results,
    })
    print(line)
    for path in (args.out, os.environ.get("SERVE_APPEND")):
        if path:
            with open(path, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
