"""Test configuration: force a virtual 8-device CPU platform for JAX.

Note: this environment's sitecustomize registers the `axon` TPU plugin in
every Python process and forces it into `jax_platforms`, so the env var alone
is not enough — we must override the config after importing jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the slow suite's cost is dominated by repeated
# XLA:CPU compiles of near-identical train/eval/decode programs; caching them
# cuts reruns of the heavy modules severalfold (first run still pays).
# HOST-KEYED (utils/cache.py): /tmp persists across heterogeneous CI hosts,
# and XLA:CPU AOT entries from a different machine can SIGSEGV on load
# (observed mid-suite) — a fingerprinted dir makes them unreachable.
from scoreperformer_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/sp_jax_cache_tests")
