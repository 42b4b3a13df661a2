"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the full multi-chip sharding
path compiles and executes without TPU hardware (the driver separately
dry-runs the multichip path; the bench runs on the real chip). The env vars
must be set before the first ``import jax`` anywhere in the process.
"""

import os
import sys

# Force CPU: JAX_PLATFORMS alone is not enough on this host — the axon TPU
# plugin registers itself from sitecustomize.py when PALLAS_AXON_POOL_IPS is
# set, so clear it before anything imports jax.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Install-verification mode (ci/install_check.sh): leave the repo root OFF
# sys.path so `import rocjpeg_tpu` resolves to the INSTALLED package — the
# analog of the reference's installed-tree test package
# (test/CMakeLists.txt:53-207).
if os.environ.get("ROCJPEG_TPU_INSTALLED") != "1":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, overriding the env var; force it back before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_IMAGES = "/root/reference/data/images"


@pytest.fixture(scope="session")
def corpus():
    """The bundled reference test corpus (BASELINE.md: data/images)."""
    import glob
    paths = sorted(glob.glob(os.path.join(REFERENCE_IMAGES, "*.jpg")))
    assert paths, "reference image corpus not found"
    return {os.path.splitext(os.path.basename(p))[0]: open(p, "rb").read()
            for p in paths}
