"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's multi-device test strategy: sharded gallery /
distributed top-k / dedup paths are exercised on
`--xla_force_host_platform_device_count=8` without TPU hardware.
Must run before jax initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

import jax  # noqa: E402

# Some environments pre-register an accelerator backend from sitecustomize
# (before this file runs); the config update wins over the env var there.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# The CPU backend's default matmul precision is reduced (oneDNN bf16-class);
# parity tests compare against f64/torch oracles, so force true f32 matmuls.
# On TPU the production path controls precision explicitly via compute_dtype.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    """Two test tiers: the DEFAULT tier (`pytest tests/ -q`, target <5 min
    on a 1-core box) skips tests marked `slow`; the FULL tier runs with
    `RUN_SLOW=1 pytest tests/ -q` (or `-m slow` for the slow tier alone).
    Every slow test has a faster sibling covering the same code path in
    the default tier."""
    if os.environ.get("RUN_SLOW") == "1":
        return
    if "slow" in (config.option.markexpr or ""):
        return  # user selected by marker; don't override
    skip = pytest.mark.skip(
        reason="slow tier: RUN_SLOW=1 (or -m slow) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
