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

    def test_real_decoder_ppm_bmp_end_to_end(self, spark):
        # REAL bytes through the real-decode branch: a synthetic 4x2 PPM
        # and the equivalent 24-bit BMP must decode to identical dims,
        # pixel-derived features, and no decode_error
        import struct as st
        from tuplex_spark.functions import multimodal as mm
        w, h = 4, 2
        rgb = bytes([(x * 37 + y * 11 + c * 5) % 256
                     for y in range(h) for x in range(w)
                     for c in range(3)])
        ppm = mm.encode_ppm(w, h, rgb)
        # hand-rolled bottom-up BGR BMP of the same pixels
        stride = (w * 3 + 3) & ~3
        px = bytearray()
        for row in range(h - 1, -1, -1):
            line = bytearray()
            for x in range(w):
                r, g, b = rgb[(row * w + x) * 3:(row * w + x) * 3 + 3]
                line += bytes([b, g, r])
            px += line.ljust(stride, b"\0")
        bmp = (b"BM" + st.pack("<IHHI", 54 + len(px), 0, 0, 54)
               + st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                         2835, 2835, 0, 0) + bytes(px))
        assets = spark.createDataFrame(
            [(1, bytearray(ppm)), (2, bytearray(bmp)),
             (3, bytearray(b"\x89PNG not decodable here"))],
            "asset_id long, payload binary")
        rows = {r["asset_id"]: r for r in
                mm.extract_features(assets, decoder="image/real")
                .collect()}
        assert rows[1]["decode_error"] is None
        assert rows[2]["decode_error"] is None
        assert (rows[1]["width"], rows[1]["height"]) == (w, h)
        assert (rows[2]["width"], rows[2]["height"]) == (w, h)
        # same pixels -> identical real features regardless of container
        assert rows[1]["features"] == rows[2]["features"]
        # features are real pixel statistics: mean R channel
        exp_r = round(sum(rgb[0::3]) / (255.0 * w * h), 6)
        assert abs(rows[1]["features"][0] - exp_r) < 1e-6
        # undecodable format still lands in decode_error, not a crash
        assert "NotImplementedError" in rows[3]["decode_error"]

    def test_real_resize_ppm_roundtrip(self, spark):
        from tuplex_spark.functions import multimodal as mm
        w, h = 4, 4
        rgb = bytes([(x * 61 + y * 17 + c) % 256
                     for y in range(h) for x in range(w)
                     for c in range(3)])
        assets = spark.createDataFrame(
            [(7, bytearray(mm.encode_ppm(w, h, rgb)))],
            "asset_id long, payload binary")
        out = mm.resize_images(assets, 2, 2).collect()[0]
        assert out["resize_error"] is None
        nw, nh, npx = mm._decode_ppm(bytes(out["payload"]))
        assert (nw, nh) == (2, 2)
        # nearest-neighbor: output pixel (0,0) samples source (0,0)
        assert npx[0:3] == rgb[0:3]

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


class TestNetpbmFamily:
    """PGM (P5) and PBM (P4) decode natively alongside PPM/BMP —
    verified against hand-computable payloads."""

    def test_pgm_grayscale(self):
        from tuplex_spark.functions.multimodal import decode_image_real
        # 2x2 grayscale: 0, 85, 170, 255
        payload = b"P5\n# cmt\n2 2\n255\n" + bytes([0, 85, 170, 255])
        d = decode_image_real(payload)
        assert (d["width"], d["height"]) == (2, 2)
        # mean gray = (0+85+170+255)/4/255 = 0.5; R=G=B means
        assert abs(d["features"][0] - 0.5) < 1e-6
        assert abs(d["features"][3] - 0.5) < 1e-6  # luma of gray = gray

    def test_pbm_bitmap(self):
        from tuplex_spark.functions.multimodal import decode_image_real
        # 4x2: row0 = 1010 (black,white,black,white), row1 = 0101
        payload = b"P4\n4 2\n" + bytes([0b10100000, 0b01010000])
        d = decode_image_real(payload)
        assert (d["width"], d["height"]) == (4, 2)
        # half the pixels white -> mean channel = 0.5
        assert abs(d["features"][0] - 0.5) < 1e-6

    def test_pgm_truncated_is_loud(self):
        import pytest
        from tuplex_spark.functions.multimodal import decode_image_real
        with pytest.raises(ValueError, match="truncated PGM"):
            decode_image_real(b"P5\n4 4\n255\n" + b"\x00" * 3)

    def test_pbm_row_padding(self):
        from tuplex_spark.functions.multimodal import decode_image_real
        # 9 wide -> 2 bytes per row; all black
        payload = b"P4\n9 2\n" + bytes([0xFF, 0x80, 0xFF, 0x80])
        d = decode_image_real(payload)
        assert (d["width"], d["height"]) == (9, 2)
        assert abs(d["features"][0] - 0.0) < 1e-6

    def test_pgm_through_extract_features(self, spark):
        """End-to-end through the Arrow mapInPandas plumbing."""
        from tuplex_spark.functions.multimodal import extract_features
        rows = [(1, b"P5\n2 1\n255\n" + bytes([100, 200])),
                (2, b"P4\n2 1\n" + bytes([0b01000000])),
                (3, b"\x89PNG....")]
        df = spark.createDataFrame(rows, "asset_id long, payload binary")
        out = {r["asset_id"]: r for r in
               extract_features(df, decoder="image/real").collect()}
        assert out[1]["width"] == 2 and out[1]["decode_error"] is None
        assert out[2]["width"] == 2 and out[2]["decode_error"] is None
        assert out[3]["decode_error"] is not None \
            and "NotImplementedError" in out[3]["decode_error"]
