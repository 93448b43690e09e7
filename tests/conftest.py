"""Test harness configuration.

By default tests run on a virtual 8-device CPU mesh so that the multi-chip
sharding/halo-exchange paths are exercised without TPU hardware (the same
technique the driver's ``dryrun_multichip`` uses).  Set
``CANNY_TPU_TEST_PLATFORM=tpu`` to run the identical suite on real TPU chips.
"""

import os

if os.environ.get("CANNY_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The environment may pre-import jax at interpreter startup (TPU plugin
    # sitecustomize), in which case env vars are read too late; override the
    # live config as well (safe before any backend is initialized).
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # Real-TPU runs compile hundreds of distinct Mosaic/XLA programs; the
    # persistent cache (shared with bench.py) makes the suite rerunnable
    # in minutes instead of hours on targets with remote-compile latency.
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TEST_IMAGE = "/root/reference/tests/test.jpg"


@pytest.fixture(scope="session")
def test_image() -> np.ndarray:
    """256x256 grayscale test image.

    Prefers the reference repo's ``tests/test.jpg`` loaded exactly as the
    reference does (cv2 IMREAD_GRAYSCALE, tests/utils/test_utils.cpp:48-49);
    falls back to a deterministic synthetic image of the same shape.
    """
    if os.path.exists(REFERENCE_TEST_IMAGE):
        import cv2

        img = cv2.imread(REFERENCE_TEST_IMAGE, cv2.IMREAD_GRAYSCALE)
        assert img is not None and img.shape == (256, 256)
        return img.astype(np.uint8)
    return synthetic_image(256, 256)


# single source of truth for the deterministic test frame
from canny_edge_tpu.io.imageio import synthetic_image  # noqa: E402,F401
