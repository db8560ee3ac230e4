"""Optimizer + criterion factories (SURVEY.md C17, C18).

optax chain mirroring the reference's YAML fields: adam/sgd(momentum),
optional weight decay, per-epoch multiplicative lr decay, optional grad clip.
"""

from __future__ import annotations

import optax

from vqa_tpu.config import OptimOptions


def make_schedule(opt: OptimOptions, steps_per_epoch: int):
    if opt.lr_decay is None:
        return opt.lr
    return optax.exponential_decay(
        init_value=opt.lr,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=opt.lr_decay,
        staircase=True,
    )


def factory(opt: OptimOptions, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    schedule = make_schedule(opt, steps_per_epoch)
    if opt.optimizer == "adam":
        core = optax.adam(schedule)
    elif opt.optimizer == "sgd":
        core = optax.sgd(schedule, momentum=opt.momentum)
    else:
        raise KeyError(f"unknown optimizer {opt.optimizer!r}; known: adam, sgd")

    chain = []
    if opt.grad_clip:
        chain.append(optax.clip_by_global_norm(opt.grad_clip))
    if opt.weight_decay:
        chain.append(optax.add_decayed_weights(opt.weight_decay))
    chain.append(core)
    return optax.chain(*chain)


def criterion_factory(name: str = "cross_entropy"):
    """C17: CE over a single sampled/most-frequent ground-truth answer id."""
    if name == "cross_entropy":
        return optax.softmax_cross_entropy_with_integer_labels
    raise KeyError(f"unknown criterion {name!r}")
