"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def ray_session():
    import os

    import ray

    # Ray workers inherit the env captured at ray.init — make the repo (and
    # tests/, for ref_sim) importable in workers regardless of driver cwd.
    root = str(Path(__file__).resolve().parents[1])
    extra = f"{root}:{root}/tests"
    prev = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra

    if not ray.is_initialized():
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
def sf_small_dir(tmp_path_factory) -> str:
    """Deterministic sf-small crawl corpus (pages/seeds/robots) generated
    once per session — FIXTURES.md §1–2."""
    from fixtures.gen import generate_corpus

    out = tmp_path_factory.mktemp("corpus_small")
    generate_corpus(str(out), n_pages=2000, n_hosts=40, seed=42)
    return str(out)
