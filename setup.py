#!/usr/bin/env python
"""Install shim (detectron.jittor documents `python setup.py install`,
README.md:256-259). Metadata lives in pyproject.toml."""
from setuptools import setup

setup()
