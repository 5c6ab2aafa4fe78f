"""Shim for legacy editable installs (``pip install -e . --no-use-pep517``)
in environments without the ``wheel`` package — PEP 660 editable builds
require wheel, the legacy ``setup.py develop`` path does not. All project
metadata lives in pyproject.toml; this file must stay empty of it."""

from setuptools import setup

setup()
