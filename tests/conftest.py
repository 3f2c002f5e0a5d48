import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # deeper fuzzing on demand: HYPOTHESIS_PROFILE=stress pytest ...
    from hypothesis import settings as _hyp_settings

    _hyp_settings.register_profile(
        "stress", max_examples=1000, deadline=None, derandomize=False
    )
    _hyp_settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "default"))
except ImportError:  # pragma: no cover
    pass

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from json_ld_spark.session import get_spark

    s = get_spark(app_name="json_ld_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
