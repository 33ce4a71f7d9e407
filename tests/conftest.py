from __future__ import annotations

import os

import pytest

from dbt_maxcompute_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="dbt_maxcompute_spark_tests",
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


# soak profile for one-off long hypothesis runs:
#   pytest --hypothesis-profile=soak tests/test_txnlog.py -k log_replay
from hypothesis import settings as _hyp_settings  # noqa: E402

_hyp_settings.register_profile("soak", max_examples=200)
