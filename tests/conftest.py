"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: the session's sitecustomize (axon TPU plugin) imports jax at interpreter
startup, so JAX_PLATFORMS in os.environ is captured *before* conftest runs.
We must use jax.config.update() instead — it works any time before backend
initialization.  Unit tests must run on CPU: the axon TPU tunnel makes every
jit compile take minutes, and tests shouldn't contend for the bench chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # in case jax is not yet imported

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
