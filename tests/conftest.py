"""Test harness configuration.

Forces the CPU backend with 8 virtual devices so multi-device sharding logic
is exercised without a pod (the standard JAX fake-multidevice technique).
Set SMCNUTS_TEST_TPU=1 to run the suite on the real accelerator instead.
"""

import os

if not os.environ.get("SMCNUTS_TEST_TPU"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
