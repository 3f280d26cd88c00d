"""Test config: run everything on a virtual 8-device CPU mesh so the GSPMD
data-parallel path is exercised without TPU hardware (the idiomatic JAX
equivalent of 'test multi-node without a cluster' — SURVEY.md §4).

NOTE this box's sitecustomize imports jax and registers the axon TPU plugin
before ANY user code runs, so env vars (JAX_PLATFORMS / XLA_FLAGS) are read
too late — the overrides must go through jax.config.update, which works as
long as no backend has been initialized yet."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# single-core box: persist compiled executables across pytest runs.
# RCDMS_TEST_CACHE_DIR overrides (point at an empty dir for honest
# cold-start timing without clobbering the shared warm cache).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RCDMS_TEST_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
