"""Testdata root resolution — one place, env-overridable for CI.

The build sandbox pre-bakes driver-generated parquet at /root/testdata;
a fresh checkout (CI) generates an equivalent instance with
``tools/gen_testdata.py`` and points ``SEQUILA_TESTDATA`` at it.
"""

from __future__ import annotations

import os

ROOT = os.environ.get("SEQUILA_TESTDATA", "/root/testdata")
SF0_001 = f"{ROOT}/sf0.001"
