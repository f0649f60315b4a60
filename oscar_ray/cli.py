"""Console entry points (pyproject [project.scripts]) — thin wrappers over
the scripts/ CLIs so an installed package exposes `oscar-ray-create` and
`oscar-ray-cmd`."""

from __future__ import annotations

import os
import runpy
import sys

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


def _run(script: str) -> None:
    path = os.path.join(_SCRIPTS, script)
    if os.path.exists(path):
        runpy.run_path(path, run_name="__main__")
    else:  # installed package: scripts shipped alongside the module
        sys.exit(f"script {script} not found next to package")


def create_main() -> None:
    _run("oscar_create.py")


def cmd_main() -> None:
    _run("oscar_cmd.py")
