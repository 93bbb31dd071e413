import shutil

import pytest

from fia_own_map_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="fia_own_map_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pages():
    """Deterministic tiny fixture: 1500 pages, ~125 entities (FIXTURES.md)."""
    from fia_own_map_spark.sources.webpages import generate_web_pages

    pages, truth = generate_web_pages(n_pages=1500, seed=42)
    return pages, truth


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = tmp_path / "ckpt"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
