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
        "slow: minutes-scale tests (multi-minute reconcile/e2e matrices, "
        "PLANS.md freshness); deselected by default via pytest.ini so the "
        "verify gate finishes in budget — run with -m slow (or -m '') ",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
