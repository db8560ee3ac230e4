"""Engine layer (SURVEY.md L4: C16-C22).

Jitted train/eval steps + host-side epoch loops, metric meters, JSONL
experiment logging, Orbax checkpointing, and OpenEnded results emission.
"""

from vqa_tpu.engine.engine import train, validate, test  # noqa: F401
