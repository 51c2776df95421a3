from __future__ import annotations

from monday_etl_automation_spark.plans.flagship import FLAGSHIP_ORACLE, flagship
from tests.oracle_compare import assert_matches_oracle


def test_flagship_matches_oracle(spark, sf_dir):
    df = flagship(spark, sf_dir)
    assert_matches_oracle(df, FLAGSHIP_ORACLE, sf_dir)


def test_flagship_nonempty(spark, sf_dir):
    assert flagship(spark, sf_dir).limit(1).count() == 1
