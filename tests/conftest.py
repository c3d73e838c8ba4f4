import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from unstract_spark.session import get_spark  # noqa: E402

# Long-running soak/e2e tests (measured >= ~6.5 s each; together ~32 of
# the full suite's ~44 minutes) carry the `slow` marker and are excluded
# from the default run by addopts so CI fits its time budget. The list
# is data (one node id per line) rather than 98 scattered decorators.
# Full suite: pytest tests/ -m "slow or not slow". Slow only: -m slow.
_SLOW_FILE = Path(__file__).with_name("slow_tests.txt")
_SLOW_IDS = frozenset(
    line.strip()
    for line in _SLOW_FILE.read_text().splitlines()
    if line.strip() and not line.startswith("#")
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if f"{item.location[0]}::{item.name}" in _SLOW_IDS or item.nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
