from __future__ import annotations

import pytest

from translator_tm_provider_pipelines_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "localcluster: end-to-end smoke on local-cluster[2,4,4096] "
        "(separate executor JVMs; subprocess-hosted)",
    )
    config.addinivalue_line(
        "markers",
        "slow: minutes-scale artifact checks (e.g. PLANS.md freshness); "
        "run by default, deselect with -m 'not slow' while iterating",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
