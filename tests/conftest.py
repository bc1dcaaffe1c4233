"""Test env: CPU backend with 8 virtual devices (SURVEY.md §5.5).

Must run before jax initializes, hence env vars at import time. Sharding
tests exercise the Mesh/shard_map paths on the fake 8-device CPU topology;
numerical tests get deterministic float32 CPU math to compare against the
numpy oracle.
"""

import os

# jax is pre-imported by this environment's sitecustomize with platform
# "axon" (TPU tunnel), so env vars alone are too late — override via config
# before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from facerecon_tpu.config import tiny_config  # noqa: E402
from facerecon_tpu.utils.bfm import synthetic_bfm  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def assets(cfg):
    return synthetic_bfm(cfg, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_coeff(cfg, rng, batch=None, scale=0.3):
    """Random but plausible coefficient vector(s)."""
    shape = (cfg.n_coeff,) if batch is None else (batch, cfg.n_coeff)
    c = (rng.standard_normal(shape) * scale).astype(np.float32)
    # keep pose mild and centered so the face stays in frame
    c[..., cfg.coeff_split[2]:cfg.coeff_split[3]] *= 0.3   # angles
    c[..., cfg.coeff_split[4]:] *= 0.1                     # trans
    return c
