"""Thin setuptools shim: metadata lives in pyproject.toml.

Kept so legacy editable installs (`pip install -e . --no-use-pep517`)
work on hosts without the `wheel` package, where the PEP 660 editable
build backend cannot run.
"""
from setuptools import setup

setup()
