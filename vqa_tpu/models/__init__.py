"""Model layer (SURVEY.md L3: C8-C14).

Flax modules for question encoding, glimpse attention, the bilinear fusion
zoo, MFB/MFH co-attention and Chain-of-Reasoning, assembled by the factory.
Everything is jnp/XLA by default; fused Pallas kernels (vqa_tpu.ops) slot in
behind the same signatures when engine.pallas is enabled.
"""

from vqa_tpu.models.factory import factory  # noqa: F401
