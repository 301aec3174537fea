"""Test configuration: run everything on a faked 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-host behavior is testable without
TPUs via XLA's host-platform device-count override.

The environment pre-imports jax with a TPU platform plugin registered from
sitecustomize, so env-var-only forcing is too late; switch the platform via
jax.config before any backend is initialized instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
