"""Cross-engine exactness pins for the log-linear quantile sketch
(round 13). The sketch's correctness story rests on three claims, each
pinned here rather than assumed:

1. power(2, e) is EXACT for integer e on both engines (powers of two
   are exactly representable; the comparison-corrected log2 makes the
   octave immune to libm ulp noise) — so the same value maps to the
   same key and the same key maps to the same representative double on
   Spark and DuckDB.
2. The map merge is order/partitioning-independent (exact long adds),
   so any merge tree — routed, streaming fold, two-level scan — yields
   the same sketch.
3. The representative is within the documented 1/128 relative error of
   the value for |x| in [2^-300, 2^301), exact for zero.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from betfair_database_spark.rollup import (
    QSKETCH_EMAX,
    qsketch_key_sql,
    qsketch_rep_sql,
)


def _values():
    rng = np.random.default_rng(1307)
    return np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 1500),
            rng.lognormal(0, 40, 1500) * rng.choice([-1.0, 1.0], 1500),
            np.array(
                [
                    0.0, -0.0, 1.0, -1.0, 2.0, 0.5, 1e-310, -1e-310,
                    1e308, -1e308, 2.0 ** -300, 2.0 ** 301, 2.0 ** -301,
                    math.nextafter(1.0, 0.0), math.nextafter(1.0, 2.0),
                    float("nan"), float("inf"), float("-inf"),
                ]
            ),
        ]
    )


class TestCrossEngineExactness:
    def test_power_of_two_exact_both_engines(self, spark):
        import duckdb

        lo, hi = -QSKETCH_EMAX, QSKETCH_EMAX + 2
        sp = spark.sql(
            f"select e, power(2.0, e) p from "
            f"(select explode(sequence({lo}, {hi})) e)"
        ).toPandas()
        assert all(
            math.ldexp(1.0, int(e)) == p for e, p in zip(sp.e, sp.p)
        )
        dd = duckdb.sql(
            f"select e, power(2.0, e) p from "
            f"(select unnest(range({lo}, {hi + 1})) e)"
        ).df()
        assert all(
            math.ldexp(1.0, int(e)) == p for e, p in zip(dd.e, dd.p)
        )

    def test_key_and_rep_identical_spark_vs_duckdb(self, spark):
        import duckdb

        pdf = pd.DataFrame({"x": _values()})
        sdf = spark.createDataFrame(pdf)
        sdf.createOrReplaceTempView("qs_xengine")
        k = qsketch_key_sql("x")
        rep = qsketch_rep_sql("k")
        q = (
            f"select {k} as k from qs_xengine"
        )
        sk = spark.sql(q).toPandas()["k"]
        con = duckdb.connect()
        con.register("qs_xengine", pdf)
        dk = con.sql(f"select {k} as k from qs_xengine").df()["k"]
        assert len(sk) == len(dk)
        for i, (a, b) in enumerate(zip(sk, dk)):
            if pd.isna(a) or pd.isna(b):
                assert pd.isna(a) and pd.isna(b), (i, pdf.x[i], a, b)
            else:
                assert a == b, (i, pdf.x[i], a, b)
        sr = spark.sql(
            f"select {rep} as r from (select {k} as k from qs_xengine) "
            f"where k is not null"
        ).toPandas()["r"].to_numpy()
        dr = con.sql(
            f"select {rep} as r from (select {k} as k from qs_xengine) "
            f"where k is not null"
        ).df()["r"].to_numpy()
        assert (sr == dr).all()

    def test_representative_within_relative_bound(self, spark):
        k = qsketch_key_sql("x")
        rep = qsketch_rep_sql("k")
        pdf = pd.DataFrame({"x": _values()})
        spark.createDataFrame(pdf).createOrReplaceTempView("qs_bound")
        out = spark.sql(
            f"select x, {rep} as r from (select x, {k} as k from qs_bound)"
        ).toPandas()
        for _, row in out.iterrows():
            v, r = row["x"], row["r"]
            if not np.isfinite(v):
                continue  # NaN/inf: NULL key or clamped — no bound claim
            if v == 0:
                assert r == 0.0
            elif 2.0 ** -QSKETCH_EMAX <= abs(v) < 2.0 ** (QSKETCH_EMAX + 1):
                assert abs(r - v) / abs(v) <= 1 / 128, (v, r)

    def test_key_monotone_in_value(self, spark):
        """okey ordering == value ordering (the rank-select depends on
        it): sort by key must equal sort by value at bin granularity."""
        k = qsketch_key_sql("x")
        vals = np.sort(
            np.array(
                [v for v in _values() if np.isfinite(v)], dtype=float
            )
        )
        pdf = pd.DataFrame({"x": vals})
        spark.createDataFrame(pdf).createOrReplaceTempView("qs_mono")
        keys = spark.sql(
            f"select {k} as k from qs_mono order by x"
        ).toPandas()["k"].to_numpy()
        assert (np.diff(keys) >= 0).all()


class TestMergeIndependence:
    def test_partitioning_independent_build(self, spark):
        """The same rows bucketed two different ways produce the SAME
        merged quantiles — the defining mergeability property, and what
        makes the streaming fold equal the one-shot build."""
        from betfair_database_spark.rollup import (
            merge_partials,
            summarize_spec,
        )

        rng = np.random.default_rng(7)
        pdf = pd.DataFrame(
            {
                "g": rng.choice(["a", "b"], 4000),
                "v": rng.lognormal(2, 3, 4000)
                * rng.choice([-1.0, 1.0, 1.0], 4000),
                "b1": rng.integers(0, 4, 4000),
                "b2": rng.integers(0, 13, 4000),
            }
        )
        pdf.loc[:50, "v"] = None  # nulls excluded on every path
        df = spark.createDataFrame(pdf)
        spec = {
            "dims": [{"alias": "g", "expr": None}],
            "aggs": [{"alias": "q", "op": "qsketch", "col": "v"}],
        }
        aggs = [
            ("approx_percentile", "v", "p10", 0.1),
            ("approx_percentile", "v", "p50", 0.5),
            ("approx_percentile", "v", "p99", 0.99),
        ]
        out1 = (
            merge_partials(summarize_spec(df, spec, part_col="b1"), spec,
                           ["g"], aggs)
            .toPandas().sort_values("g").reset_index(drop=True)
        )
        out2 = (
            merge_partials(summarize_spec(df, spec, part_col="b2"), spec,
                           ["g"], aggs)
            .toPandas().sort_values("g").reset_index(drop=True)
        )
        assert out1.equals(out2)

    def test_multi_sketch_columns_one_spec(self, spark):
        """Two qsketch aggs in one spec: the stage-1 grain carries both
        okeys and the per-column fold merges the cross-product
        duplicates — each column's quantiles equal its single-column
        build."""
        from betfair_database_spark.rollup import (
            merge_partials,
            summarize_spec,
        )

        rng = np.random.default_rng(11)
        pdf = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], 3000),
                "u": rng.uniform(0, 1000, 3000),
                "w": rng.lognormal(0, 2, 3000),
                "b": rng.integers(0, 4, 3000),
            }
        )
        df = spark.createDataFrame(pdf)
        both = {
            "dims": [{"alias": "g", "expr": None}],
            "aggs": [
                {"alias": "qu", "op": "qsketch", "col": "u"},
                {"alias": "qw", "op": "qsketch", "col": "w"},
            ],
        }
        single_u = {
            "dims": [{"alias": "g", "expr": None}],
            "aggs": [{"alias": "qu", "op": "qsketch", "col": "u"}],
        }
        got = (
            merge_partials(
                summarize_spec(df, both, part_col="b"), both, ["g"],
                [("approx_percentile", "u", "p", 0.5),
                 ("approx_percentile", "w", "pw", 0.9)],
            )
            .toPandas().sort_values("g").reset_index(drop=True)
        )
        want_u = (
            merge_partials(
                summarize_spec(df, single_u, part_col="b"), single_u,
                ["g"], [("approx_percentile", "u", "p", 0.5)],
            )
            .toPandas().sort_values("g").reset_index(drop=True)
        )
        assert list(got["p"]) == list(want_u["p"])

    def test_streaming_fold_equals_one_shot(self, spark):
        """_spec_fold_partials over incrementally-unioned partials ==
        the one-shot summarize_spec, map-for-map — the property the
        streaming spec-rollup sink (spec_rollup_merge_batch) rests on."""
        from betfair_database_spark.rollup import (
            _spec_fold_partials,
            summarize_spec,
        )

        rng = np.random.default_rng(23)
        pdf = pd.DataFrame(
            {
                "g": rng.choice(["a", "b"], 2000),
                "v": rng.uniform(-500, 500, 2000),
                "b": rng.integers(0, 3, 2000),
            }
        )
        spec = {
            "dims": [{"alias": "g", "expr": None}],
            "aggs": [
                {"alias": "n", "op": "count", "col": None},
                {"alias": "q", "op": "qsketch", "col": "v"},
            ],
        }
        full = summarize_spec(
            spark.createDataFrame(pdf), spec, part_col="b"
        )
        half1 = summarize_spec(
            spark.createDataFrame(pdf.iloc[:900]), spec, part_col="b"
        )
        half2 = summarize_spec(
            spark.createDataFrame(pdf.iloc[900:]), spec, part_col="b"
        )
        folded = (
            half1.unionByName(half2)
            .groupBy("b", "g")
            .agg(*_spec_fold_partials(spec))
        )

        def canon(df):
            rows = []
            for r in df.collect():
                m = r["_p_q"] or {}
                rows.append(
                    (r["b"], r["g"], r["_p_n"], tuple(sorted(m.items())))
                )
            return sorted(rows)

        assert canon(folded) == canon(full)


class TestScanGuards:
    def test_bad_entry_with_qsketch_raises(self, spark):
        from betfair_database_spark.database import _qsketch_scan_sql

        with pytest.raises(ValueError, match="group dims or"):
            _qsketch_scan_sql(
                ["approx_percentile(v, 0.5) AS p", "v + 1"],
                [], "t", None,
            )

    def test_unaliased_co_aggregate_raises(self, spark):
        from betfair_database_spark.database import _qsketch_scan_sql

        with pytest.raises(ValueError, match="AS alias"):
            _qsketch_scan_sql(
                ["approx_percentile(v, 0.5) AS p", "sum(v)"],
                [], "t", None,
            )
