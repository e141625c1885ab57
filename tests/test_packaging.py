"""Packaging contract: the engine is a pip-installable distribution, not
a sys.path hack.

This container ships setuptools but not the ``wheel`` module, so
``pip install .`` cannot build a wheel here (``error: invalid command
'bdist_wheel'``) — the backend path that IS available offline is
``build_sdist``. Building the sdist through the declared PEP 517 backend
and importing the package from the EXTRACTED distribution alone proves
the three things a wheel install would: pyproject.toml parses and the
backend accepts it, the distribution contains every subpackage (a
missing ``__init__`` or an over-tight package filter fails the import),
and the package tree is self-contained — no dependency on repo-root
files like __spark_entry__.py. On a machine with ``wheel`` present,
``pip install -e .`` works directly.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tarfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SUBPACKAGE_IMPORTS = (
    "import drill_logfile_plugin_spark as m; "
    "from drill_logfile_plugin_spark import artifacts, config, pipeline, registry; "
    "from drill_logfile_plugin_spark.operators import ("
    "dedup, similarity, multimodal, jpeg, bpe, chunking, text); "
    "from drill_logfile_plugin_spark.sources import ("
    "log_reader, log_datasource, sinks, tables, jsonl, formats); "
    "from drill_logfile_plugin_spark.functions import exprs, skew; "
    "from drill_logfile_plugin_spark.streaming import windows; "
    "import inspect; "
    "print(Path(inspect.getfile(m)).resolve())"
)


def test_sdist_builds_and_installs_standalone(tmp_path):
    dist = tmp_path / "dist"
    dist.mkdir()
    build = subprocess.run(
        [
            sys.executable,
            "-c",
            "from setuptools import build_meta; "
            f"print(build_meta.build_sdist({str(dist)!r}))",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert build.returncode == 0, build.stderr
    sdists = list(dist.glob("*.tar.gz"))
    assert len(sdists) == 1, sdists

    extract = tmp_path / "extracted"
    with tarfile.open(sdists[0]) as tf:
        tf.extractall(extract)
    (pkg_root,) = [p for p in extract.iterdir() if p.is_dir()]
    assert (pkg_root / "pyproject.toml").is_file()
    assert (pkg_root / "drill_logfile_plugin_spark" / "__init__.py").is_file()
    # the distribution is the LIBRARY: driver-contract and bench files
    # stay repo-only
    assert not (pkg_root / "__spark_entry__.py").exists()

    # import every subpackage from the extracted distribution ONLY
    # (cwd far from the repo; PYTHONPATH = distribution root, deps come
    # from the interpreter's site-packages as they would post-install)
    env = dict(os.environ, PYTHONPATH=str(pkg_root))
    check = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pathlib import Path; " + SUBPACKAGE_IMPORTS,
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert check.returncode == 0, check.stderr
    resolved = check.stdout.strip().splitlines()[-1]
    assert str(pkg_root.resolve()) in resolved, (
        f"package imported from {resolved}, not the extracted distribution"
    )
