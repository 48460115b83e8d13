"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (SURVEY.md section 4):
real TPU pods are not available in CI, and the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip.

Note: the environment may export JAX_PLATFORMS=axon (the TPU tunnel plugin),
which overrides a plain env default — force the config explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
