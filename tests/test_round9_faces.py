"""Round-9 face pins: WCC star-contraction convergence margin and URL
canonicalization invariants."""
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.core import all_queries

SF = "/root/testdata/sf0.01"


def test_wcc_star_converges_with_margin(spark, monkeypatch):
    """graph_wcc_star runs 8 bounded alternating rounds and its oracle
    is the ground-truth fixpoint — so the gate only stays green while
    the rounds suffice. Pin the margin: the fixture must already be
    converged at 5 rounds (3 spare), and 8 rounds must change nothing
    (a fixed point, as star contraction guarantees)."""
    from process_nwb_spark.relational import graph_ops

    spec = all_queries()["graph_wcc_star"]

    def run(rounds):
        monkeypatch.setattr(graph_ops, "_WCC_ROUNDS", rounds)
        return (spec.fn(spark, SF).toPandas()
                .sort_values("node").reset_index(drop=True))

    r5, r8 = run(5), run(8)
    assert r5.equals(r8), "not converged by round 5 — margin eroded"
    assert r8.component.nunique() > 50          # many components
    assert int(r8.component_size.max()) > 50    # with multi-hop structure


def test_wcc_star_components_are_self_consistent(spark):
    """Component labels must be the component MIN and sizes must add up
    — internal consistency independent of the oracle."""
    pdf = all_queries()["graph_wcc_star"].fn(spark, SF).toPandas()
    grp = pdf.groupby("component")
    assert (grp["node"].min() == grp["node"].first().index).all()
    sizes = grp.size()
    assert all(pdf.component_size == pdf.component.map(sizes))


def test_url_canonicalize_collapses_all_variants(spark):
    pdf = all_queries()["fn_url_canonicalize"].fn(spark, SF).toPandas()
    assert len(pdf) > 0
    # one canonical per doc — every messy variant collapsed
    assert pdf.doc_id.is_unique
    even = pdf[pdf.doc_id % 2 == 0]
    odd = pdf[pdf.doc_id % 2 == 1]
    assert (even.n_variants == 3).all() and (odd.n_variants == 2).all()
    # canonical form: lowercase, no port, no utm, no fragment, no
    # trailing slash, params sorted
    for u in pdf.canonical_url:
        assert u == u.lower() and ":443" not in u and "utm_" not in u
        assert "#" not in u and "/?" not in u
        q = u.split("?", 1)[1].split("&")
        assert q == sorted(q)
