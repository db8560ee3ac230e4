"""Device-readiness probe: is the tunneled TPU clean enough to record?

Times the same chained-GEMM calibration bench.py uses and prints one JSON
line {tflops, ready}. The perf ledger's backlog rule: after a dense stretch
of runs (or a killed process that left enqueued work), the device can read
2-3x off its ~97-TFLOPS sustained rate for tens of minutes; recording any
artifact in that state measures the backlog, not the code. Gate artifact
runs on ready=true (threshold 40 TFLOPS, same as bench.py's calibration).

Usage: python tools/device_ready.py [--wait]   (--wait: idle-poll every 45s
until ready or 10 min, then report)

--enum_only: don't run the calibration — just check that the tunnel answers
device ENUMERATION within --timeout seconds. The ledger's hard-wedge
signature is jax.devices() itself blocking forever (distinct from backlog,
which is slow-but-alive); this mode turns that into a bounded yes/no probe
instead of a hung shell.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vqa_tpu.utils import enable_compile_cache

N, K, THRESH = 4096, 96, 40.0


def probe_tflops() -> float:
    a = jnp.ones((N, N), jnp.bfloat16)
    b = jnp.ones((N, N), jnp.bfloat16) * 1e-3

    @jax.jit
    def chain(a, b):
        def body(c, _):
            return jnp.tanh(c @ b), None
        c, _ = jax.lax.scan(body, a, None, length=K)
        return c.astype(jnp.float32).sum()

    _ = float(chain(a, b))  # compile + first execute off the clock
    t0 = time.perf_counter()
    _ = float(chain(a, b))
    return 2.0 * K * N**3 / (time.perf_counter() - t0) / 1e12


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wait", action="store_true")
    p.add_argument("--enum_only", action="store_true",
                   help="bounded tunnel-wedge probe (no calibration)")
    p.add_argument("--timeout", type=float, default=240.0,
                   help="enumeration budget for --enum_only, seconds")
    args = p.parse_args()
    enable_compile_cache()
    if args.enum_only:
        import threading

        answered = threading.Event()

        def bail():
            if answered.is_set():  # enumeration won the race: stay silent
                return
            print(json.dumps({
                "ready": False,
                "error": f"device enumeration wedged >{args.timeout:.0f}s "
                         "(tunnel hard-wedge — see perf ledger)",
            }), flush=True)
            os._exit(3)

        t = threading.Timer(args.timeout, bail)
        t.daemon = True
        t.start()
        d = jax.devices()[0]
        answered.set()
        t.cancel()
        print(json.dumps({"ready": True, "platform": d.platform,
                          "device_kind": d.device_kind}))
        return
    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"tflops": None, "ready": True, "note": "not a TPU"}))
        return
    deadline = time.perf_counter() + 600.0
    waits = 0
    while True:
        tf = probe_tflops()
        if tf >= THRESH or not args.wait or time.perf_counter() > deadline:
            break
        waits += 1
        time.sleep(45.0)
    print(json.dumps({"tflops": round(tf, 1), "ready": tf >= THRESH,
                      "waits": waits}))


if __name__ == "__main__":
    main()
