"""Spark Connect graceful-degradation posture (VERDICT r15 #5).

This sandbox has no Connect server, so these tests SIMULATE the
Connect-visible symptom — the missing py4j handles (``df._jdf``,
``Observation._jo``/``._jvm``) — and pin that every plan-stat /
JVM-handle consumer degrades to its documented conservative path
instead of crashing. The real-session behavior of each conservative
path is covered by the ordinary tests (the paths are the same code).
"""

import pytest

import datafusion_functions_json_spark as jsonf
from datafusion_functions_json_spark.plans import plan_size_bytes


class _NoHandles:
    """An object with NO _jdf/_jvm/_jo — the shape a Connect DataFrame
    or Observation presents to getattr/attribute access."""


class _RaisingJdf:
    """Connect DataFrames actually raise on ._jdf access (the parent
    class defines it as a classic-only property in some versions) —
    cover the raising shape too, not just the missing one."""

    @property
    def _jdf(self):
        raise Exception("Spark Connect does not support this API")


class TestPlanStatDegradation:
    def test_plan_size_bytes_missing_handle_is_none(self):
        assert plan_size_bytes(_NoHandles()) is None
        assert plan_size_bytes(_RaisingJdf()) is None

    def test_multi_auto_treats_unknown_size_as_large(self):
        # 2 fields + permissive claim + unreadable stats -> the
        # conservative large-input tier (variant_perfield), never a
        # crash (multi._auto_tier step 3)
        from datafusion_functions_json_spark.functions.multi import _auto_tier

        two = [("i", "int", ("a",)), ("s", "str", ("b",))]
        claim = jsonf.JsonProfile()
        assert _auto_tier(two, claim, _NoHandles()) == "variant_perfield"
        assert _auto_tier(two, claim, _RaisingJdf()) == "variant_perfield"

    def test_cosine_topk_auto_resolves_hof_without_stats(self, spark):
        # similarity._plan_size_bytes -> None must resolve impl='auto'
        # to 'hof' (the 100 TB tier). We can't strip _jdf from a live
        # classic DataFrame without breaking .select, so pin the
        # resolution rule itself plus the shared helper's None path.
        from datafusion_functions_json_spark.operators.similarity import (
            _plan_size_bytes,
        )

        assert _plan_size_bytes(_NoHandles()) is None
        sz = None
        impl = "hof" if sz is None or sz > (64 << 20) else "vectorized"
        assert impl == "hof"
        # and the hof tier itself is a pure-Column path (no JVM handle
        # use outside normal DataFrame ops) — run it end-to-end
        from datafusion_functions_json_spark.operators.similarity import (
            cosine_topk,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id int, emb array<double>"
        )
        rows = cosine_topk(
            df, "emb", [1.0, 0.0], k=1, id_cols=("vec_id",), impl="hof"
        ).collect()
        assert rows[0].vec_id == 1


class TestMetricsDegradation:
    def test_report_skips_jvm_wait_without_handles(self):
        from datafusion_functions_json_spark.operators.metrics import (
            StageMetrics,
        )

        class _ConnectObs:
            # no _jo, no _jvm; .get is available (server-side in real
            # Connect)
            get = {"rows": 7}

        m = StageMetrics()
        m._stages["stage_a"] = _ConnectObs()
        out = m.report(timeout_s=0.1)
        assert out == {"stage_a": {"rows": 7}}

    def test_report_with_jo_but_no_jvm_does_not_crash(self):
        from datafusion_functions_json_spark.operators.metrics import (
            StageMetrics,
        )

        class _OddObs:
            _jo = object()  # handle present but _jvm unreachable
            get = {"rows": 1}

        m = StageMetrics()
        m._stages["s"] = _OddObs()
        assert m.report(timeout_s=0.1) == {"s": {"rows": 1}}

    def test_connect_blocking_get_honors_timeout(self):
        # ADVICE r17: real Connect blocks in .get for a
        # never-materialized Observation — the no-handle path must still
        # honor timeout_s instead of hanging report() forever.
        import threading
        import time

        from datafusion_functions_json_spark.operators.metrics import (
            StageMetrics,
        )

        class _BlockingObs:
            @property
            def get(self):
                threading.Event().wait()  # blocks forever

        m = StageMetrics()
        m._stages["never_ran"] = _BlockingObs()
        t0 = time.monotonic()
        out = m.report(timeout_s=0.3)
        assert out == {"never_ran": None}
        assert time.monotonic() - t0 < 5.0
        with pytest.raises(RuntimeError, match="never_ran"):
            m.report(strict=True, timeout_s=0.3)

    def test_connect_raising_get_maps_to_pending(self):
        from datafusion_functions_json_spark.operators.metrics import (
            StageMetrics,
        )

        class _RaisingObs:
            @property
            def get(self):
                raise RuntimeError("observation was not materialized")

        m = StageMetrics()
        m._stages["s"] = _RaisingObs()
        assert m.report(timeout_s=0.3) == {"s": None}
