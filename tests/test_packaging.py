"""Packaging metadata sanity: pyproject.toml parses, matches the package
version, and its console entry point resolves to a real callable."""

import importlib
import os
import tomllib

import nfdpm_tpu

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_version_matches_package():
    proj = load_pyproject()["project"]
    assert proj["version"] == nfdpm_tpu.__version__


def test_console_scripts_resolve():
    for target in load_pyproject()["project"]["scripts"].values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn)


def test_package_discovery_covers_all_subpackages():
    """Every nfdpm_tpu directory with Python files is a real package (has
    __init__.py) so `pip install` ships it."""
    pkg_root = os.path.join(ROOT, "nfdpm_tpu")
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        if "__pycache__" in dirpath:
            continue
        if any(f.endswith(".py") for f in filenames):
            assert "__init__.py" in filenames, f"{dirpath} missing __init__.py"
