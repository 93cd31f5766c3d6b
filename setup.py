"""Legacy-install shim. All metadata lives in ``pyproject.toml``; this file
exists so environments without the ``wheel`` package (where PEP 517 builds
fail on ``bdist_wheel``) can still ``pip install --no-use-pep517 .`` —
mirroring the reference's setup.py distribution (/root/reference/setup.py)."""

from setuptools import setup

setup()
