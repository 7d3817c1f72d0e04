import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from sparkdedup.session import build_session

    s = build_session(app_name="sparkdedup-tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    from sparkdedup.fixtures import generate_corpus

    return generate_corpus(n_files=200, seed=42)
