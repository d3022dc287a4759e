"""a_hll_set_intersection: inclusion-exclusion over HLL sketches must
land inside the composed error envelope and obey sketch algebra."""

from __future__ import annotations

from finance_etl_pipeline_spark.plans import all_queries


def test_intersection_estimate_envelope(spark, sf_dir):
    q = all_queries()["a_hll_set_intersection"]
    rows = q.fn(spark, sf_dir).collect()
    assert rows, "no event-type pairs?"
    for r in rows:
        # union can never exceed the sum nor undercut either side
        assert r.est_union <= r.est_a + r.est_b
        assert r.est_union >= max(r.est_a, r.est_b) * 0.9
        # inclusion-exclusion inherits ~3 relative errors of the
        # union size (Spark's default lgK=12 HLL is ~1.6% rsd);
        # 10% of the union is a conservative composed envelope
        tol = max(0.10 * r.est_union, 8.0)
        assert abs(r.est_intersection - r.exact_intersection) <= tol, (
            r.type_a,
            r.type_b,
            r.est_intersection,
            r.exact_intersection,
        )


def test_sliding_panes(spark, sf_dir):
    q = all_queries()["e_sliding_uniques_hll"]
    rows = q.fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_panes <= 7
        # HLL at Spark's default lgK=12 is ~1.6% rsd; 5% + floor is a
        # conservative envelope for a 7-way union
        tol = max(0.05 * r.exact_uniques_7d, 5.0)
        assert abs(r.est_uniques_7d - r.exact_uniques_7d) <= tol, (
            r.anchor,
            r.est_uniques_7d,
            r.exact_uniques_7d,
        )
