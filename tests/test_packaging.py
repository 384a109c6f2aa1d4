"""Packaging contract: pyproject.toml is well-formed and every declared
console entry point resolves to a callable. (The full wheel-build + isolated
install smoke is exercised manually — `pip wheel --no-build-isolation
--no-deps -w /tmp/wheels .` then import with PYTHONPATH=<target install> —
because building wheels inside the unit suite is slow on the 1-core dev box.)
"""

import importlib
import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_pyproject_parses_and_entry_points_resolve():
    with open(REPO / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "videopainter-tpu"
    assert "jax" in " ".join(proj["dependencies"])
    for name, target in proj["scripts"].items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), (name, target)


def test_package_data_ships_native_source():
    pkg_data = None
    with open(REPO / "pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    pkg_data = meta["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkg_data["videopainter_tpu.native"]
    assert (REPO / "videopainter_tpu/native/connected_components.cpp").exists()
