"""Shared fixtures — ONE Ray session per pytest run."""

from __future__ import annotations

import os

import pytest
import ray

# The flagship-summary oracle SQL reads a parquet keyed by sf dir;
# point it at the tests' sf fixture BEFORE __ray_entry__ is imported.
os.environ.setdefault("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
