"""Shared test fixtures: one local SparkSession + synthetic imaging catalog
tables mirroring the reference's own test fixtures
(tests/database/db_operations_tests.py:18-82: a 6-frame dataset of
3 channels x 2 slices built with itertools.product, non-0-based time/pos
indices, a parent/child dataset pair, a frames=false file dataset)."""

from __future__ import annotations

import itertools
import sys
from datetime import datetime
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagingdb_spark.catalog import (
    DATA_SET_SCHEMA,
    FILE_GLOBAL_SCHEMA,
    FRAMES_GLOBAL_SCHEMA,
    FRAMES_SCHEMA,
)
from imagingdb_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def imaging(spark):
    """dict of the 4 imaging catalog DataFrames with deterministic content."""
    datasets = [
        # (id, serial, description, microscope, frames, date_time, parent_id)
        (1, "TEST-2005-10-09-20-00-00-0001", "First dataset test", "scope1",
         True, datetime(2005, 10, 9, 20, 0, 0), None),
        (2, "TEST-2005-10-12-20-00-00-0001", "Second dataset test", "scope2",
         True, datetime(2005, 10, 12, 20, 0, 0), 1),
        (3, "MEOW-2006-01-01-08-00-00-0001", "Cat dataset", "scope1",
         True, datetime(2006, 1, 1, 8, 0, 0), None),
        (4, "TEST-2005-10-12-20-00-00-0002", "Raw file dataset", "scope2",
         False, datetime(2005, 10, 12, 20, 0, 0), None),
    ]
    channels = [(0, "brightfield"), (1, "phase"), (2, "405")]
    slices = [5, 6]  # non-0-based on purpose (data_storage.py:49-55)
    frames_rows = []
    fid = 0
    for ds_id, fg_id in ((1, 1), (2, 2), (3, 3)):
        for (c_idx, c_name), z in itertools.product(channels, slices):
            fid += 1
            frames_rows.append(
                (
                    fid, c_idx, z, 50, 7, c_name,
                    f"im_c{c_idx:03d}_z{z:03d}_t050_p007.png",
                    f"{'%064x' % (fid if fid % 5 else 1)}",  # planted dup sha
                    '{"local_key": "local_value"}',
                    fg_id,
                )
            )
    frames_global_rows = [
        (1, 6, 512, 256, 2, 3, 1, 1, 1, "uint16",
         "raw_frames/TEST-2005-10-09-20-00-00-0001",
         '{"status": "test", "protein_name": "TOPOR", "plate_id": "E1"}', 1),
        (2, 6, 512, 256, 2, 3, 1, 1, 1, "uint16",
         "raw_frames/TEST-2005-10-12-20-00-00-0001",
         '{"status": "test", "protein_name": "CCT7", "plate_id": "E2"}', 2),
        (3, 6, 512, 256, 2, 3, 1, 1, 1, "uint8",
         "raw_frames/MEOW-2006-01-01-08-00-00-0001",
         '{"protein_name": "TOPOR", "plate_id": "E1"}', 3),
    ]
    file_global_rows = [
        (1, "raw_files/TEST-2005-10-12-20-00-00-0002", "test_file.lif",
         '{"file_origin": "/path/to/test_file.lif"}', 4, "a" * 64),
    ]
    return {
        "data_set": spark.createDataFrame(datasets, DATA_SET_SCHEMA),
        "frames_global": spark.createDataFrame(frames_global_rows, FRAMES_GLOBAL_SCHEMA),
        "frames": spark.createDataFrame(frames_rows, FRAMES_SCHEMA),
        "file_global": spark.createDataFrame(file_global_rows, FILE_GLOBAL_SCHEMA),
    }


# --- slow-tier marking (round 12, VERDICT r11 item 1) -----------------------
# The full suite (1020 tests) measures ~46-97 min wall — past the driver's
# verify budget, so `VERIFY_r11.json` recorded tests_ok=false on a suite with
# ZERO failures. tests/slow_tests.txt lists every test measured at >= 3 s
# (soak/crash-matrix/stress tiers; durations archived in
# tools/test_durations_r12.txt); they get pytest.mark.slow here and
# pytest.ini deselects the mark by default, leaving a <10-min core selection
# that still covers every operator. The FULL suite remains one flag away
# (`pytest tests/ -m ''`) and the builder gate runs it.

import re as _re


def _slow_bases() -> set[str]:
    out = set()
    try:
        with open(Path(__file__).parent / "slow_tests.txt") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    out.add(line)
    except OSError:
        pass
    return out


def pytest_collection_modifyitems(config, items):
    slow = _slow_bases()
    if not slow:
        return
    for item in items:
        # exact node id first (single slow params of an otherwise-fast
        # parametrized test), then the param-stripped base (every param
        # of a slow test inherits the mark)
        if item.nodeid in slow or _re.sub(r"\[.*\]$", "", item.nodeid) in slow:
            item.add_marker(pytest.mark.slow)
