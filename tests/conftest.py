"""Test harness: 8 virtual CPU devices (SURVEY §4 test strategy).

The reference has no tests; multi-device behavior was only ever exercised on
a real 4-GPU node.  Here every sharded program is validated on an 8-way
virtual CPU mesh — the JAX-native way to test pjit programs without TPUs.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin registers itself as platform "tpu" and ignores the
# JAX_PLATFORMS env var; the config flag does win.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
