"""Test configuration: run JAX on 8 virtual CPU devices.

Sharding tests need a multi-device mesh; the driver's real-TPU bench runs
separately. Setting the platform before jax import is mandatory.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers a TPU backend at interpreter
# start and overrides JAX_PLATFORMS, so pin the platform via jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the full-size goldens test compiles a 347M f32
# program that costs minutes on this host's throttled CPU; repeat runs hit
# the cache instead.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/biogpt_xla_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
assert jax.devices()[0].platform == "cpu", jax.devices()
