"""Unit tests for bench.py's per-sample contention adjudication.

Rounds 5-7 each burned a judge pass proving that sf1 blow-ups were host
CPU-delivery stalls rather than code regressions; measure_query now
stamps outlier samples with an immediate spin32 probe so the bench JSON
self-adjudicates.  These tests drive measure_query with deterministic
stub runners/probes (no Spark) and pin that logic.
"""

from __future__ import annotations

import bench


def _run(seq, probe_seq, iters=3):
    """Drive measure_query with scripted per-call durations and scripted
    probe results.  seq[0] is the warmup sample."""
    seq = list(seq)
    probe_seq = list(probe_seq)

    def runner(qs, name, spark, sf_dir):
        return seq.pop(0)

    def probe():
        return probe_seq.pop(0) if probe_seq else 0.3

    return bench.measure_query({}, "q", None, "", iters, probe,
                               runner=runner)


class TestContentionStamping:
    def test_clean_run_no_probes(self):
        m = _run([1.0, 1.1, 0.9, 1.0], [])
        assert m["median"] == m["median_raw"] == 1.0
        assert m["n_contended"] == 0
        assert not m["all_contended"]
        assert all("spin32" not in r for r in m["samples"])

    def test_outlier_probed_and_filtered_when_host_busy(self):
        # sample 2 is 5x the warmup; probe says the host is stalled
        m = _run([1.0, 1.1, 5.0, 0.9], [2.4])
        s = m["samples"][1]
        assert (s["t"], s["spin32"], s["contended"]) == (5.0, 2.4, True)
        # round-10: leg-position stamps on every sample
        assert all("pos" in r and "at" in r for r in m["samples"])
        assert [r["pos"] for r in m["samples"]] == sorted(
            r["pos"] for r in m["samples"])
        assert m["n_contended"] == 1
        assert m["median"] == 1.0       # median of [1.1, 0.9]
        assert m["median_raw"] == 1.1   # median of [1.1, 5.0, 0.9]
        assert m["min"] == 0.9 and m["max"] == 5.0
        assert m["max_clean"] == 1.1

    def test_outlier_kept_when_probe_comes_back_clean(self):
        # slow sample but the host probes fast: can't blame the
        # environment, so the sample stays in the median (charged to
        # the code)
        m = _run([1.0, 1.1, 5.0, 0.9], [0.3])
        assert m["samples"][1]["contended"] is False
        assert m["n_contended"] == 0
        assert m["median"] == 1.1

    def test_outlier_vs_best_so_far_not_just_warmup(self):
        # best drops to 0.2 at sample 1, so 0.9 (4.5x best) probes
        m = _run([1.0, 0.2, 0.9, 0.2], [2.0])
        assert m["samples"][1].get("contended") is True

    def test_all_contended_retries_then_recovers(self):
        # all 3 samples contended -> up to 2 force-probed retries;
        # first retry lands clean and becomes the median
        m = _run([1.0, 9.0, 9.5, 9.2, 1.2], [2.0, 2.1, 2.2, 0.3])
        assert len(m["samples"]) == 4
        assert not m["all_contended"]
        assert m["median"] == 1.2
        assert m["n_contended"] == 3

    def test_all_contended_falls_back_to_raw(self):
        # every sample including both retries is contended: raw median,
        # loud flag
        m = _run([1.0, 9.0, 9.5, 9.2, 9.1, 9.3],
                 [2.0, 2.1, 2.2, 2.3, 2.4])
        assert m["all_contended"]
        assert len(m["samples"]) == 5
        assert m["median"] == m["median_raw"] == 9.2
        assert "min_clean" not in m

    def test_pre_probe_recorded(self):
        probes = [0.25]

        def runner(qs, name, spark, sf_dir):
            return 1.0

        class _SC:
            class _jvm:
                class System:
                    @staticmethod
                    def gc():
                        pass

        class _Spark:
            sparkContext = _SC()

        m = bench.measure_query({}, "q", _Spark(), "", 2,
                                lambda: probes.pop(0) if probes else 0.3,
                                gc_before=True, pre_probe=True,
                                runner=runner)
        assert m["pre_spin32"] == 0.25


class TestStabilityConfAssert:
    def test_build_session_passes(self, spark):
        # the ctx fixture session comes from build_session — the assert
        # must accept it (a failure here means bench.py dies at start)
        bench.assert_stability_confs(spark)

    def test_missing_conf_fails_loudly(self, spark):
        class FakeConf:
            def get(self, k, d=None):
                return d

        class FakeSession:
            conf = FakeConf()

        import pytest
        with pytest.raises(AssertionError):
            bench.assert_stability_confs(FakeSession())
