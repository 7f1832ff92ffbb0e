"""Test environment: force a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising pjit/shard_map multi-chip code
paths without TPU hardware (SURVEY.md section 4, point 3).  bench.py and the
production pipeline do NOT import this — they run on the real TPU backend.

Note: this image's sitecustomize registers a remote-TPU PJRT plugin and
forces ``jax_platforms='axon,cpu'`` via jax.config (env vars are ignored),
so we must override through jax.config as well, before any backend is
initialised.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
