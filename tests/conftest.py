import gzip
import os
import shutil
import sys
from pathlib import Path

# Force a deterministic 8-device CPU mesh for all JAX-touching tests. The
# environment may have imported jax already (an axon sitecustomize registers
# the tunneled-TPU plugin at interpreter start), so the env vars alone are
# too late — use jax.config as well, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest

FIXTURES = Path(__file__).resolve().parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory):
    """Fixture inputs decompressed into a session temp dir."""
    out = tmp_path_factory.mktemp("fx")
    for gz in FIXTURES.glob("*.fq.gz"):
        plain = out / gz.name[:-3]
        with gzip.open(gz, "rb") as src, open(plain, "wb") as dst:
            shutil.copyfileobj(src, dst)
        shutil.copy(gz, out / gz.name)
    for rfq in FIXTURES.glob("*.rfq"):
        shutil.copy(rfq, out / rfq.name)
    return out
