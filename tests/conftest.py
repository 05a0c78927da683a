import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


@pytest.fixture(scope="session")
def spark():
    from ocr_lib_spark.session import get_spark

    s = get_spark(app="ocr-lib-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
