"""Pytest root conftest.

Forces JAX onto a virtual 8-device CPU platform so multi-chip sharding logic
(data/tensor parallel) is testable without TPU hardware.

Note: this environment preimports jax at interpreter startup (an axon
sitecustomize registers the tunneled TPU backend), so plain env vars in
conftest are too late — we override through jax.config before any backend is
instantiated. Bench and real-TPU runs do NOT import this file.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (possibly already imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the fast tier's wall time on this 1-core
# box is dominated by CPU compiles of while_loop decode graphs (~35-55 s
# each). Entries are keyed by HLO hash, so source changes recompile exactly
# the graphs they alter; unchanged tests hit the cache and drop to trace+load
# time. ~60 MB steady-state under ~/.cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tal_asrd_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
