"""On-hardware test tier (VERDICT r4 item 5).

Unlike tests/ (which re-execs onto a virtual CPU mesh), this suite runs
on the REAL backend and is skipped entirely when no TPU is attached.
It exists because XLA:TPU miscompiles are real here and CPU runs do not
reproduce them (two instances so far: the r3/r4 seed-stats gather
composition, and the r5 mega prepare gather fusion — both returned
element-0 broadcasts only on TPU, only when fused, only at >= 512 KiB
caps).

Invocation (documented in CLAUDE.md):
    python -m pytest tests_tpu/ -q
First run pays the production kernel compiles (minutes on the remote
transport); later in-process runs are warm.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


def pytest_collection_modifyitems(config, items):
    import jax
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="no TPU backend attached")
    for item in items:
        item.add_marker(skip)
