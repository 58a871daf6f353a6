"""Driver-style correctness gate: run every ``queries()`` entry at the test
scale factor and compare SQL-expressible ones against their DuckDB oracle —
row count, column names, and order-insensitive values (mirrors the driver's
compare)."""

import math

import duckdb
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


@pytest.mark.usefixtures("ray_session")
class TestOracleParity:
    def _compare(self, name, sf_dir, con):
        import __ray_entry__ as e

        ray_df = _to_pandas(e.queries()[name](sf_dir))
        sql = e.oracle_sql().get(name)
        assert len(ray_df) >= 0
        if sql is None:
            assert len(ray_df) > 0 or name in ("clips_violations",)
            return
        ora_df = con.execute(sql).df()
        a, b = _canon(ray_df), _canon(ora_df)
        assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
        assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
        for c in a.columns:
            # the driver hashes VALUES: an int column degraded to float
            # ("77.0" vs "77") hash-mismatches even when numerically equal —
            # mirror that by requiring the same numeric kind
            if a[c].dtype.kind in "iuf" or b[c].dtype.kind in "iuf":
                assert (a[c].dtype.kind in "iu") == (
                    b[c].dtype.kind in "iu"
                ), f"{name}.{c}: numeric kind {a[c].dtype} vs {b[c].dtype}"
            if a[c].dtype.kind == "f":
                assert (
                    (a[c] - b[c]).abs().max() < 1e-9
                ), f"{name}.{c}: max diff {(a[c]-b[c]).abs().max()}"
            else:
                mism = (a[c].astype(str) != b[c].astype(str)).sum()
                assert mism == 0, f"{name}.{c}: {mism} mismatched values"

    @pytest.mark.parametrize(
        "name",
        [
            "q1_lineitem_agg",
            "grouped_stats_events",
            "column_stats_lineitem",
            "distinct_counts",
            "exact_quantiles_quantity",
            "referential_orphans",
            "sessionize_events",
            "top_customers_revenue",
            "token_counts_documents",
            "token_frequencies_documents",
            "quality_documents",
            "fingerprint_documents",
            "clean_documents",
            "bigram_frequencies_documents",
            "dedup_exact_documents",
            "sample_documents",
            "mixture_documents",
            "stratified_cap_events",
            "curate_documents",
            "near_dup_pairs_documents",
            "cross_source_leakage_documents",
            "label_centroid_confusion",
            "dup_components_documents",
            "ann_topk_embeddings",
            "embedding_near_dup",
            "join_orders_customers",
            "asof_latest_order_before_event",
            "asof_orders_bounded",
            "skew_salted_type_join",
            "range_join_clicks_after_signup",
            "windowed_events_daily",
            "hopping_events_daily_6h",
            "top_orders_per_customer",
            "schema_segmented_events",
            "schema_evolution_events",
            "simhash_documents",
            "window_functions_orders",
            "heavy_hitters_tokens",
            "tfidf_top_terms_documents",
            "rollup_revenue_lineitem",
            "value_drift_events",
            "customers_without_orders",
            "approx_distinct_users_events",
            "pack_documents",
            "pivot_events_daily",
            "melt_lineitem_measures",
            "decontaminate_documents",
            "repetition_documents",
            "scrub_pii_documents",
            "cluster_assign_embeddings",
            "users_active_both_halves",
            "left_join_customer_orders",
            "vocab_documents",
            "quantile_buckets_extendedprice",
            "shuffle_positions_documents",
            "corr_stats_lineitem",
            "split_assign_documents",
            "groupwise_dev_events",
            "revenue_by_region",
            "grouped_median_quantity",
            "rolling_revenue_customer",
            "nation_balance_full_outer",
            "edit_distance_adjacent_docs",
            "order_priority_exists",
            "customer_order_distribution",
            "promo_revenue",
            "large_orders_having",
            "brand_supplier_distinct",
            "modal_event_type_user",
            "duplicate_passages_documents",
            "group_split_events",
            "funnel_conversions_events",
            "cohort_retention_events",
            "prepare_training_corpus",
        ],
    )
    def test_sql_parity(self, name, sf_dir, con):
        self._compare(name, sf_dir, con)

    @pytest.mark.parametrize(
        "name",
        [
            "minhash_dedup_documents",
            "approx_quantiles_extendedprice",
            "clips_codec_verdicts",
            "clips_violations",
            "clips_duplicate_ids",
            "langid_documents",
            "ivf_topk_embeddings",
            "schema_infer_lineitem",
            "schema_infer_events_props",
            "schema_roundtrip_validate_events",
            "image_featurize_documents",
            "clips_schema_infer",
            "clips_profile",
            "clips_drift",
            "clips_audio_features",
            "clips_content_dedup",
            "clips_segments",
            "clips_resample_stats",
            "kmeans_embeddings",
            "clips_integrity",
            "image_phash_dedup_documents",
            "video_frame_sample_documents",
            "curate_clips_summary",
            "clips_windows",
            "clips_feature_prep",
            "clips_speed_perturb",
            "clips_noise_mix",
            "prepare_audio_training_set",
            "clips_drift_localize",
        ],
    )
    def test_rows_only(self, name, sf_dir, con):
        import __ray_entry__ as e

        df = _to_pandas(e.queries()[name](sf_dir))
        assert df is not None

    def test_every_query_is_covered(self):
        """Every queries() entry must appear in exactly one of the two
        parametrize lists above — a new query without a parity/rows-only
        test is a coverage hole."""
        import __ray_entry__ as e

        sql_names = set(self.test_sql_parity.pytestmark[0].args[1])
        rows_names = set(self.test_rows_only.pytestmark[0].args[1])
        assert sql_names.isdisjoint(rows_names)
        assert sql_names | rows_names == set(e.queries())
        # and every oracle belongs to a query checked as SQL parity
        assert set(e.oracle_sql()) == sql_names

    def test_driver_window_fully_oracled(self):
        """The correctness driver samples the FIRST 50 queries() entries;
        every one of them must carry a DuckDB oracle (ordering contract in
        queries/__init__.py). Round-5 rotation keeps the dedup family
        (embedding_near_dup / simhash / components / tfidf) in-window."""
        import __ray_entry__ as e

        window = list(e.queries())[:50]
        oracled = set(e.oracle_sql())
        assert [q for q in window if q not in oracled] == []
        for q in ("embedding_near_dup", "simhash_documents",
                  "dup_components_documents", "tfidf_top_terms_documents",
                  "prepare_training_corpus", "curate_documents"):
            assert q in window, q

    def test_entry_smoke(self):
        import __ray_entry__ as e

        res = _to_pandas(e.entry())
        assert len(res) > 0
        assert "passed" in res.columns
