"""Two-regime join queries: the broadcast fast path (default at test scale)
and the distributed bucketed path (forced with broadcast_limit=0) must
produce identical results — the regime switch may change the plan, never
the answer."""

import pandas as pd
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestJoinRegimes:
    def test_revenue_by_region_regimes_agree(self, sf_dir):
        from schema_guru_ray.pipelines.queries import revenue_by_region

        broadcast = _canon(revenue_by_region(sf_dir))
        bucketed = _canon(revenue_by_region(sf_dir, broadcast_limit=0))
        assert len(broadcast) > 0
        pd.testing.assert_frame_equal(broadcast, bucketed)

    def test_order_priority_regimes_agree(self, sf_dir):
        from schema_guru_ray.pipelines.queries import order_priority_exists

        broadcast = _canon(order_priority_exists(sf_dir))
        joined = _canon(order_priority_exists(sf_dir, broadcast_limit=0))
        assert len(broadcast) > 0
        pd.testing.assert_frame_equal(broadcast, joined)

    @pytest.mark.parametrize(
        "fn_name",
        [
            "promo_revenue",
            "brand_supplier_distinct",
            "large_orders_having",
            "customer_order_distribution",
            "cohort_retention_events",
            "range_join_clicks_after_signup",
            "cross_source_leakage_documents",
        ],
    )
    def test_part_and_survivor_regimes_agree(self, sf_dir, fn_name):
        from schema_guru_ray.pipelines import queries

        fn = getattr(queries, fn_name)
        broadcast = _canon(fn(sf_dir))
        bucketed = _canon(fn(sf_dir, broadcast_limit=0))
        assert len(broadcast) > 0
        pd.testing.assert_frame_equal(broadcast, bucketed)
