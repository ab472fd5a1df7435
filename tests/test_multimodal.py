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


class TestResize:
    def test_schema_and_determinism(self, spark):
        from tuplex_spark.functions import multimodal as mm
        assets = mm.make_asset_frame(spark, n=20, partitions=3)
        out = mm.resize_images(assets, 224, 224)
        assert [f.name for f in out.schema.fields] == \
            ["asset_id", "payload", "width", "height", "resize_error"]
        rows = {r["asset_id"]: r for r in out.collect()}
        assert len(rows) == 20
        assert all(r["resize_error"] is None for r in rows.values())
        assert all(r["width"] == 224 and r["height"] == 224
                   for r in rows.values())
        # output payload is a pure function of (input payload, dims)
        rows2 = {r["asset_id"]: r for r in
                 mm.resize_images(assets, 224, 224).collect()}
        assert all(bytes(rows[k]["payload"]) == bytes(rows2[k]["payload"])
                   for k in rows)
        other = {r["asset_id"]: r for r in
                 mm.resize_images(assets, 64, 64).collect()}
        assert all(bytes(rows[k]["payload"]) != bytes(other[k]["payload"])
                   for k in rows)

    def test_narrow_no_shuffle(self, spark):
        from tuplex_spark.functions import multimodal as mm
        assets = mm.make_asset_frame(spark, n=30, partitions=5)
        assert mm.resize_images(assets, 32, 32).rdd.getNumPartitions() == 5


class TestFrameSampling:
    def test_frame_count_follows_duration(self, spark):
        from tuplex_spark.functions import multimodal as mm
        vids = mm.make_asset_frame(spark, n=10, media_type="video")
        out = mm.sample_frames(vids, every_ms=1000)
        counts = {r["asset_id"]: 0 for r in out.collect()}
        per = {}
        for r in out.collect():
            per.setdefault(r["asset_id"], []).append(r)
        durs = {r["asset_id"]: r["meta"]["duration_ms"]
                for r in vids.collect()}
        for aid, rows in per.items():
            expect = max(-(-durs[aid] // 1000), 1)
            assert len(rows) == min(expect, 64), (aid, durs[aid])
            # timestamps step by every_ms from 0
            tss = sorted(r["ts_ms"] for r in rows)
            assert tss == [i * 1000 for i in range(len(rows))]

    def test_max_frames_caps_runaway_durations(self, spark):
        from tuplex_spark.functions import multimodal as mm
        vids = mm.make_asset_frame(spark, n=4, media_type="video")
        out = mm.sample_frames(vids, every_ms=1, max_frames=8)
        per = {}
        for r in out.collect():
            per.setdefault(r["asset_id"], 0)
            per[r["asset_id"]] += 1
        assert all(n == 8 for a, n in per.items() if a > 0), per

    def test_null_duration_yields_one_frame(self, spark):
        from tuplex_spark.functions import multimodal as mm
        imgs = mm.make_asset_frame(spark, n=5)  # duration_ms null
        out = mm.sample_frames(imgs, every_ms=1000)
        per = {}
        for r in out.collect():
            per.setdefault(r["asset_id"], 0)
            per[r["asset_id"]] += 1
        assert all(n == 1 for n in per.values())
