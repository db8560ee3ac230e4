"""force_platform: the --platform flag's plugin-name fallback (utils/platform).

The image's TPU PJRT plugin registers as "axon" while its devices report
.platform == "tpu", and a stock "tpu" plugin exists but fails to initialize
— so the literal jax_platforms update errors on exactly the machine that
has the TPU. These tests pin the fallback logic with a fake jax.devices
(no real backend is touched; conftest keeps the suite on CPU).
"""

import jax
import pytest

from vqa_tpu.utils import force_platform
from vqa_tpu.utils import platform as platform_mod


class _FakeDevice:
    def __init__(self, platform):
        self.platform = platform


@pytest.fixture(autouse=True)
def _restore_platforms():
    before = jax.config.jax_platforms
    yield
    jax.config.update("jax_platforms", before)


def test_noop_without_name():
    before = jax.config.jax_platforms
    force_platform(None)
    force_platform("")
    assert jax.config.jax_platforms == before


def test_cpu_sets_config_without_device_init(monkeypatch):
    def boom():
        raise AssertionError("cpu forcing must not initialize backends")

    monkeypatch.setattr(platform_mod.jax, "devices", boom)
    force_platform("cpu")
    assert jax.config.jax_platforms == "cpu"


def test_defer_skips_verification(monkeypatch):
    def boom():
        raise AssertionError("defer=True must not initialize backends")

    monkeypatch.setattr(platform_mod.jax, "devices", boom)
    force_platform("tpu", defer=True)
    assert jax.config.jax_platforms == "tpu"


def test_literal_name_that_initializes_is_kept(monkeypatch):
    monkeypatch.setattr(
        platform_mod.jax, "devices", lambda: [_FakeDevice("tpu")]
    )
    force_platform("tpu")
    assert jax.config.jax_platforms == "tpu"


def test_fallback_to_default_priority_when_plugin_name_differs(monkeypatch):
    def fake_devices():
        # literal "tpu" plugin fails; default priority resolves the
        # differently-registered plugin whose devices report "tpu"
        if jax.config.jax_platforms == "tpu":
            raise RuntimeError("Unable to initialize backend 'tpu'")
        return [_FakeDevice("tpu")]

    monkeypatch.setattr(platform_mod.jax, "devices", fake_devices)
    force_platform("tpu")
    assert jax.config.jax_platforms == ""


def test_fallback_rejects_wrong_resolved_platform(monkeypatch):
    def fake_devices():
        if jax.config.jax_platforms == "tpu":
            raise RuntimeError("Unable to initialize backend 'tpu'")
        return [_FakeDevice("cpu")]

    monkeypatch.setattr(platform_mod.jax, "devices", fake_devices)
    with pytest.raises(RuntimeError, match="requested --platform 'tpu'"):
        force_platform("tpu")


def test_fallback_reraises_when_nothing_resolves(monkeypatch):
    def fake_devices():
        raise RuntimeError("no backend at all")

    monkeypatch.setattr(platform_mod.jax, "devices", fake_devices)
    with pytest.raises(RuntimeError, match="no backend at all"):
        force_platform("tpu")
