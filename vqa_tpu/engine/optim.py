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
    # The inner optimizer's step count advances once per APPLIED update;
    # under grad_accum=k that is steps_per_epoch/k per data epoch, so the
    # per-epoch decay boundary must shrink by the same factor.
    applied_per_epoch = max(steps_per_epoch // max(opt.grad_accum, 1), 1)
    return optax.exponential_decay(
        init_value=opt.lr,
        transition_steps=applied_per_epoch,
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
    tx = optax.chain(*chain)
    if opt.grad_accum > 1:
        # k micro-batches of size B accumulate (mean) into one applied
        # update — semantically a batch of k*B that need not fit in HBM.
        # Clip/decay sit inside, so they see the averaged gradient exactly
        # as a real k*B batch would. NOTE: MultiSteps wraps the opt_state,
        # so checkpoints do not resume across a grad_accum on/off change.
        tx = optax.MultiSteps(tx, every_k_schedule=opt.grad_accum)
    return tx


def criterion_factory(name: str = "cross_entropy"):
    """C17: CE over a single sampled/most-frequent ground-truth answer id."""
    if name == "cross_entropy":
        return optax.softmax_cross_entropy_with_integer_labels
    raise KeyError(f"unknown criterion {name!r}")
