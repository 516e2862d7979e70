"""Repo-relative resource paths, importable without a SparkSession.

Everything that needs the committed golden parquet oracles (the query
registry's oracle SQL strings, tools/make_goldens.py) derives the
location from ``__file__`` so a checkout at any path works — the same
convention session.py uses for the package zip.
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: committed golden parquet oracles (tools/make_goldens.py regenerates
#: them Spark-free from the parity-tested pure-Python kernels)
GOLDEN_DIR = os.path.join(REPO_ROOT, "resources", "goldens")
