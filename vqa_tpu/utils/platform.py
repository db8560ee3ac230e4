"""``--platform`` backend forcing, one place for every entry point.

``jax_platforms`` matches PJRT *plugin registration names*, which are not
always the name a user would type: on this image the TPU plugin registers
as ``axon`` (its devices still report ``.platform == "tpu"``) while the
stock ``tpu`` plugin is present but fails to initialize ("no jellyfish
device"). A literal ``jax.config.update("jax_platforms", "tpu")`` therefore
errors out on the only machine that *has* a TPU. ``force_platform`` keeps
the literal fast path and, when backend init fails, falls back to JAX's
default platform priority — accepting it iff the resolved devices report
the requested platform name.
"""

from __future__ import annotations

from typing import Optional

import jax


def force_platform(name: Optional[str], *, defer: bool = False) -> None:
    """Force the JAX backend for this process (the ``--platform`` flag).

    No-op when ``name`` is falsy. Must run before any JAX device use
    (backends initialize once); the config API wins over env vars even
    where a site hook rewrites ``JAX_PLATFORMS``.

    ``defer=True`` skips the eager plugin-name verification (which calls
    ``jax.devices()``) for callers that must not initialize backends yet —
    e.g. before ``jax.distributed.initialize`` — at the cost of the
    registration-name fallback described in the module docstring.
    """
    if not name:
        return
    jax.config.update("jax_platforms", name)
    if defer or name == "cpu":
        return
    try:
        jax.devices()
    except RuntimeError as err:
        # Plugin may register under a different name than its devices
        # report. Resolve by default priority and verify the platform.
        jax.config.update("jax_platforms", "")
        try:
            resolved = {d.platform for d in jax.devices()}
        except RuntimeError:
            raise err
        if name not in resolved:
            raise RuntimeError(
                f"requested --platform {name!r}, but no registered plugin "
                f"initializes under that name and the default backend "
                f"resolves to {sorted(resolved)}"
            ) from err
