"""Session-scoped Ray fixture (one ray.init per pytest session) and shared
fixture data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    """400-clip fixture with planted duplicates, written once per session."""
    import pyarrow.parquet as pq

    from tools.make_fixtures import generate_clips

    d = tmp_path_factory.mktemp("clips")
    clips, truth = generate_clips(800, seed=42, dur_range=(300, 1200))
    pq.write_table(clips, str(d / "clips.parquet"))
    pq.write_table(truth, str(d / "truth_pairs.parquet"))
    return d


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
