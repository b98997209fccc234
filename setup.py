"""Shim for environments whose setuptools predates wheel-less PEP-660
editable installs (`pip install -e .` needs the `wheel` package before
setuptools 70.1).  All metadata lives in pyproject.toml; offline boxes
can fall back to `python setup.py develop`."""

from setuptools import setup

setup()
