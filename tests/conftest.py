import pytest

from blackroad_feature_store_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small local session for unit tests; bench/driver use local[32].
    s = get_spark(
        app_name="bfs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/bfs-warehouse"},
    )
    yield s
