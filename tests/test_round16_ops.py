"""Round-16 additions.

Covers the two ANN dial ladders:

plans/vector.py::similarity_lsh_plane_ladder — recall@3 at 4/8/16
hyperplanes (nested prefixes of the same plane family): per-query
recall monotone non-INCREASING in plane count (each added plane
refines the bucket partition, shrinking the candidate pool under
exact-cosine scoring), middle rung row-identical to
similarity_lsh_recall, no non-broadcast cartesian.

plans/vector.py::similarity_ivf_nprobe_ladder — the IVF
accuracy/cost dial registered as one relation (recall@3 at
nprobe = 1, 2, 4 over the same 8-cell coarse quantizer):

- per-query MONOTONICITY: recall never decreases as nprobe grows
  (the candidate pool only grows, candidates are scored by exact
  cosine with the brute-force tie rule, and any candidate that could
  evict an exact-top-3 member from the ANN top-3 must itself be an
  exact-top-3 member — see the query docstring);
- rung consistency: the nprobe=2 rung is row-identical to the
  standalone similarity_ivf_recall contract (same machinery, so a
  drift between them means the ladder forked the plan);
- shape: one row per (nprobe, query), all three rungs present, and
  the full-probe ceiling nprobe=cells would equal the exact scan —
  approximated here by asserting recall at the top rung is >= the
  bottom rung's (strict improvement is data-dependent, the fixture
  does improve);
- plan: no non-broadcast cartesian anywhere in the 3-rung union.

The DuckDB value-hash itself is covered by the registry-wide sweep
in tests/test_queries_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eye_of_sauron_spark.plans.vector import (
    _IVF_LADDER_NPROBES,
    _LSH_LADDER_PLANES,
    similarity_ivf_nprobe_ladder,
    similarity_ivf_recall,
    similarity_lsh_plane_ladder,
    similarity_lsh_recall,
)


def _ladder_rows(spark, sf_dir):
    return {
        (r["nprobe"], r["query_id"]): (r["n_hits"], r["recall"])
        for r in similarity_ivf_nprobe_ladder(spark, sf_dir).collect()
    }


def test_ladder_shape_and_monotone_recall(spark, sf_dir):
    rows = _ladder_rows(spark, sf_dir)
    nprobes = sorted({np for np, _ in rows})
    assert nprobes == sorted(_IVF_LADDER_NPROBES)
    qids = {q for _, q in rows}
    # every rung covers every query exactly once (rows is a dict keyed
    # by (nprobe, qid), so cardinality == rungs x queries implies it)
    assert len(rows) == len(nprobes) * len(qids) and len(qids) > 0
    for q in qids:
        seq = [rows[(np, q)][1] for np in nprobes]
        assert all(a <= b + 1e-12 for a, b in zip(seq, seq[1:])), (q, seq)


def test_ladder_middle_rung_matches_registered_contract(spark, sf_dir):
    rows = _ladder_rows(spark, sf_dir)
    standalone = {
        r["query_id"]: (r["n_hits"], r["recall"])
        for r in similarity_ivf_recall(spark, sf_dir).collect()
    }
    mid = {q: v for (np, q), v in rows.items() if np == 2}
    assert mid == standalone


def test_ladder_top_rung_improves_on_fixture(spark, sf_dir):
    """Data-dependent but pinned: on the shipped fixture the widest
    probe strictly beats the narrowest on MEAN recall (if a fixture
    regeneration ever flattens this, the ladder has lost its point —
    investigate rather than relax)."""
    df = (
        similarity_ivf_nprobe_ladder(spark, sf_dir)
        .groupBy("nprobe")
        .agg(F.avg("recall").alias("m"))
    )
    means = {r["nprobe"]: r["m"] for r in df.collect()}
    lo, hi = min(_IVF_LADDER_NPROBES), max(_IVF_LADDER_NPROBES)
    assert means[hi] > means[lo]


def test_ladder_plan_no_unbroadcast_cartesian(spark, sf_dir):
    plan = (
        similarity_ivf_nprobe_ladder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan


# --------------------------------------------- LSH plane-count ladder


def _lsh_ladder_rows(spark, sf_dir):
    return {
        (r["n_planes"], r["query_id"]): (r["n_hits"], r["recall"])
        for r in similarity_lsh_plane_ladder(spark, sf_dir).collect()
    }


def test_lsh_ladder_shape_and_monotone_nonincreasing(spark, sf_dir):
    rows = _lsh_ladder_rows(spark, sf_dir)
    planes = sorted({p for p, _ in rows})
    assert planes == sorted(_LSH_LADDER_PLANES)
    qids = {q for _, q in rows}
    assert len(rows) == len(planes) * len(qids) and len(qids) > 0
    for q in qids:
        seq = [rows[(p, q)][1] for p in planes]
        assert all(a >= b - 1e-12 for a, b in zip(seq, seq[1:])), (q, seq)


def test_lsh_ladder_middle_rung_matches_registered_contract(spark, sf_dir):
    rows = _lsh_ladder_rows(spark, sf_dir)
    standalone = {
        r["query_id"]: (r["n_hits"], r["recall"])
        for r in similarity_lsh_recall(spark, sf_dir).collect()
    }
    mid = {q: v for (p, q), v in rows.items() if p == 8}
    assert mid == standalone


def test_lsh_ladder_coarse_rung_improves_on_fixture(spark, sf_dir):
    """Mirror of the IVF pin with the direction flipped: on the
    shipped fixture the COARSEST bucketing (fewest planes, biggest
    candidate pools) strictly beats the finest on MEAN recall."""
    df = (
        similarity_lsh_plane_ladder(spark, sf_dir)
        .groupBy("n_planes")
        .agg(F.avg("recall").alias("m"))
    )
    means = {r["n_planes"]: r["m"] for r in df.collect()}
    lo, hi = min(_LSH_LADDER_PLANES), max(_LSH_LADDER_PLANES)
    assert means[lo] > means[hi]


def test_lsh_ladder_plan_no_unbroadcast_cartesian(spark, sf_dir):
    plan = (
        similarity_lsh_plane_ladder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
