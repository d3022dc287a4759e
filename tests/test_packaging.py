"""Packaging surface: pyproject + console script (reference parity:
reference pyproject.toml:33-35 ships `finance-etl = finance_etl.cli:app`).

The container forbids pip installs and lacks the `wheel` backend, so
instead of a live `pip install -e .` these tests verify exactly what an
install would wire up: the declared entry point resolves to a callable,
and the CLI behaves as the generated console script would invoke it
(`sys.exit(main(argv))`).
"""

from __future__ import annotations

import subprocess
import sys

import pytest


def _pyproject() -> dict:
    # tomllib is 3.11+; pyproject declares >=3.10, so skip (not error)
    # where the stdlib parser is absent
    tomllib = pytest.importorskip("tomllib")
    with open("pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_console_script_target_resolves():
    scripts = _pyproject()["project"]["scripts"]
    target = scripts["finance-etl-spark"]
    mod_name, func_name = target.split(":")
    import importlib

    fn = getattr(importlib.import_module(mod_name), func_name)
    assert callable(fn)


def test_cli_help_exits_zero():
    proc = subprocess.run(
        [sys.executable, "-m", "finance_etl_pipeline_spark.cli", "--help"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0
    assert "finance-etl-spark" in proc.stdout


def test_cli_version_and_queries():
    proc = subprocess.run(
        [sys.executable, "-m", "finance_etl_pipeline_spark.cli", "version"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0
    proc = subprocess.run(
        [sys.executable, "-m", "finance_etl_pipeline_spark.cli",
         "queries", "--tag", "bench"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0
    assert "dd_minhash_lsh_pairs" in proc.stdout


def test_package_discovery_covers_all_subpackages():
    """setuptools find() with the declared include must pick up every
    runtime subpackage (a missing __init__.py silently drops one)."""
    import os

    for sub in ("operators", "sources", "functions", "plans", "streaming"):
        assert os.path.exists(
            os.path.join("finance_etl_pipeline_spark", sub, "__init__.py")
        ), sub
