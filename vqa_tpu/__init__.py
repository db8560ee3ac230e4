"""vqa_tpu — a TPU-native VQA framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the PyTorch
reference `bupt-cist/vqa-playground-pytorch` (see SURVEY.md for the component
inventory this package implements). The compute path is jnp/XLA with optional
fused Pallas TPU kernels; scale-out is jax.sharding over an ICI mesh.

Reference provenance: at build time the reference mount /root/reference was
empty (see SURVEY.md header), so reference citations in this package point at
SURVEY.md sections (which carry their own provenance tags) rather than
reference file:line.
"""

__version__ = "0.1.0"
