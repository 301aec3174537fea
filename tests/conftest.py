"""Test configuration: run everything on a faked 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-host behavior is testable without
TPUs via XLA's host-platform device-count override.  Must run before the
first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
