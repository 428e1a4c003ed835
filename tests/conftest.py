import os

# Tests run on a virtual 8-device CPU mesh so sharding/collective paths are
# exercised without TPU hardware (SURVEY.md §4).
os.environ["JAX_PLATFORMS"] = "cpu"  # the image sets JAX_PLATFORMS=axon (TPU
# tunnel) globally; tests must override, not setdefault
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
