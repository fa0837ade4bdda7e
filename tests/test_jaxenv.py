"""Platform-pin helper (utils/jaxenv.py): env intent must reach
jax.config even when the plugin ignores JAX_PLATFORMS."""

import os

import jax

from image_stitcher_tpu.utils import jaxenv


def test_requested_platforms_precedence(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "tpu,cpu")
    monkeypatch.setenv("IMAGE_STITCHER_JAX_PLATFORM", "cpu")
    assert jaxenv.requested_platforms() == "cpu"
    monkeypatch.delenv("IMAGE_STITCHER_JAX_PLATFORM")
    assert jaxenv.requested_platforms() == "tpu,cpu"
    monkeypatch.delenv("JAX_PLATFORMS")
    assert jaxenv.requested_platforms() is None


def test_pin_applies_config_and_is_idempotent(monkeypatch):
    # the suite runs pinned to cpu (conftest); re-pinning to the same
    # value must be a no-op that still reports success
    monkeypatch.setenv("IMAGE_STITCHER_JAX_PLATFORM", "cpu")
    monkeypatch.setattr(jaxenv, "_pinned", None)
    assert jaxenv.pin_jax_platform() == "cpu"
    assert jax.config.jax_platforms == "cpu"
    assert jaxenv.pin_jax_platform() == "cpu"  # cached path


def test_pin_noop_without_env(monkeypatch):
    monkeypatch.delenv("IMAGE_STITCHER_JAX_PLATFORM", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(jaxenv, "_pinned", None)
    before = jax.config.jax_platforms
    assert jaxenv.pin_jax_platform() is None
    assert jax.config.jax_platforms == before
