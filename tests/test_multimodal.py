"""Multimodal plumbing: schema contract, Arrow batch shapes, per-row
decode error capture (the codec itself is a deterministic stub)."""

import pytest


class TestExtract:
    def test_schema_and_determinism(self, spark):
        from tuplex_spark.functions import multimodal as mm
        assets = mm.make_asset_frame(spark, n=50, partitions=4)
        out = mm.extract_features(assets)
        assert [f.name for f in out.schema.fields] == \
            ["asset_id", "width", "height", "features", "decode_error"]
        rows = {r["asset_id"]: r for r in out.collect()}
        assert len(rows) == 50
        assert all(r["decode_error"] is None for r in rows.values())
        assert all(len(r["features"]) == mm.FEATURE_DIM
                   for r in rows.values())
        # deterministic: second run produces identical features
        rows2 = {r["asset_id"]: r for r in mm.extract_features(assets)
                 .collect()}
        assert all(rows[k]["features"] == rows2[k]["features"]
                   for k in rows)

    def test_decode_errors_captured_per_row(self, spark):
        from tuplex_spark.functions import multimodal as mm
        assets = mm.make_asset_frame(spark, n=10)
        out = mm.extract_features(assets, decoder="image/real").collect()
        assert all(r["decode_error"] is not None
                   and "NotImplementedError" in r["decode_error"]
                   for r in out)

    def test_meta_struct_contract(self, spark):
        from tuplex_spark.functions import multimodal as mm
        assets = mm.make_asset_frame(spark, n=3)
        meta = assets.schema["meta"].dataType
        assert [f.name for f in meta.fields] == \
            [f.name for f in mm.MEDIA_META.fields]

    def test_partitioning_preserved(self, spark):
        from tuplex_spark.functions import multimodal as mm
        assets = mm.make_asset_frame(spark, n=100, partitions=7)
        out = mm.extract_features(assets)
        # mapInPandas is a narrow transform: no shuffle added
        assert out.rdd.getNumPartitions() == 7
