"""On-device validation of AOT export artifacts (companion to cli/export.py).

Exports the flagship MutanAtt two ways and runs both on the CURRENT
platform, comparing against the live ``model.apply``:

  * baked constants at reduced dims (a baked flagship would embed ~100MB of
    weights in the HLO — remote-compile helpers cap request sizes, the
    CLAUDE.md 413 trap; reduced dims keep the program small while still
    exercising the constants path),
  * the same baked path with int8-quantized weights (in-program dequant;
    the oracle applies the identical eager dequant, so the check is exact
    mechanics, not quantization accuracy), and
  * external params at FLAGSHIP dims (weight-free program: the big-model
    deployment path — this is the one that must hold on real TPU).

Prints one JSON line; EXPORT_APPEND=<file> appends it for artifact assembly.
Run on the real chip after tools/device_ready.py; also passes on CPU.

Usage: python tools/check_export.py [--platform cpu|tpu]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REGIONS, DIM = 36, 2048


def _build(num_words, num_answers, tiny):
    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory

    from tools.common import REDUCED_MUTAN_ATT_OVERRIDES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    overrides = list(REDUCED_MUTAN_ATT_OVERRIDES) if tiny else []
    opt = load_options(
        os.path.join(repo, "options/vqa2/mutan_att.yaml"), overrides
    )
    return factory(opt.model, num_words, num_answers, dtype="float32"), opt


def _check(
    params_mode: str, tiny: bool, batch: int, seq: int, int8: bool = False
) -> dict:
    from vqa_tpu.export import dequantize_int8, export_forward, quantize_int8

    num_words, num_answers = (500, 40) if tiny else (12_000, 2_000)
    model, _ = _build(num_words, num_answers, tiny)
    rng = np.random.default_rng(0)
    visual = jnp.asarray(rng.standard_normal((batch, REGIONS, DIM)), jnp.float32)
    question = jnp.asarray(rng.integers(1, num_words, (batch, seq)), jnp.int32)
    lengths = jnp.asarray(rng.integers(1, seq + 1, (batch,)), jnp.int32)
    params = model.init(jax.random.key(0), visual[:2], question[:2], lengths[:2])[
        "params"
    ]
    if int8:
        params = quantize_int8(params)

    # the live oracle runs the same (dequantized, for int8) params — the
    # check pins artifact MECHANICS exactly, not quantization accuracy
    live_params = dequantize_int8(params) if int8 else params
    live = np.asarray(
        jax.jit(lambda p, v, q, l: model.apply({"params": p}, v, q, l))(
            live_params, visual, question, lengths
        )
    )
    exported = export_forward(
        model, params, batch=batch, seq=seq,
        feature_shape=(REGIONS, DIM), params_mode=params_mode, quantized=int8,
    )
    # serialize/deserialize round trip — what a serving host actually loads
    from jax import export as jax_export

    blob = exported.serialize()
    call = jax.jit(jax_export.deserialize(bytearray(blob)).call)
    if params_mode == "external":
        frozen = np.asarray(
            call(_roundtrip_params(params), visual, question, lengths)
        )
    else:
        frozen = np.asarray(call(visual, question, lengths))
    diff = float(np.max(np.abs(frozen - live)))
    return {
        "params_mode": params_mode,
        "weights": "int8" if int8 else "f32",
        "dims": "reduced" if tiny else "flagship",
        "batch": batch,
        "program_bytes": len(blob),
        "max_abs_diff": diff,
        "ok": bool(diff <= 1e-4),
    }


def _roundtrip_params(params):
    """npz write/read round trip (the sidecar path a serving host takes)."""
    from vqa_tpu.export import _flatten_params, _unflatten_params

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.npz")
        np.savez(path, **_flatten_params(params))
        with np.load(path) as flat:
            return _unflatten_params(flat)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    from vqa_tpu.utils import force_platform

    force_platform(args.platform)

    from vqa_tpu.utils import enable_compile_cache

    enable_compile_cache()
    platform = jax.devices()[0].platform
    checks = [
        _check("baked", tiny=True, batch=64, seq=26),
        _check("baked", tiny=True, batch=64, seq=26, int8=True),
        _check("external", tiny=False, batch=64, seq=26),
    ]
    line = json.dumps({
        "metric": "export_check",
        "platform": platform,
        "checks": checks,
        "ok": all(c["ok"] for c in checks),
    })
    print(line)
    if os.environ.get("EXPORT_APPEND"):
        with open(os.environ["EXPORT_APPEND"], "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
