import gzip
import os
import shutil
import sys
from pathlib import Path

# Force a deterministic 8-device CPU mesh for all JAX-touching tests; must be
# set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
