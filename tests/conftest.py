from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from akka_stream_contrib_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    yield s
    s.stop()
