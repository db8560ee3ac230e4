"""Host-side metric meters (engine/meters.py; SURVEY.md C16/C21).

Exercised indirectly by every engine loop test through metrics.jsonl; this
pins the weighted-average arithmetic directly.
"""

from vqa_tpu.engine.meters import AverageMeter, MeterBank


def test_average_meter_weighted():
    m = AverageMeter()
    m.update(1.0, n=3)
    m.update(5.0, n=1)
    assert m.val == 5.0
    assert m.count == 4
    assert m.avg == (1.0 * 3 + 5.0) / 4


def test_average_meter_empty_and_reset():
    m = AverageMeter()
    assert m.avg == 0.0  # no division-by-zero on an empty meter
    m.update(2.0)
    m.reset()
    assert m.avg == 0.0 and m.count == 0


def test_meter_bank_named_updates_and_epoch_time():
    b = MeterBank()
    b.update({"loss": 2.0, "acc1": 0.5}, n=2)
    b.update({"loss": 1.0}, n=2)
    assert "loss" in b and "acc1" in b
    assert b["loss"].avg == 1.5
    avgs = b.averages()
    assert avgs["loss"] == 1.5 and avgs["acc1"] == 0.5
    assert avgs["epoch_time"] >= 0.0
