"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in this environment; sharding paths are
validated with XLA's forced host-platform device count (SURVEY.md section 4,
"Distributed without a cluster"). These env vars must be set before the first
jax import, hence this conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
