"""Data layer (SURVEY.md L2: C3-C7).

Host-side prep (raw VQA json -> interim -> processed npz artifacts), HDF5
region-feature store, dataset classes, and the batching pipeline feeding
device-resident tensors.
"""

from vqa_tpu.datasets.factory import factory  # noqa: F401
