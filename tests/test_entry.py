"""Driver-contract and check-off-map consistency pins (no Spark session).

COVERAGE.md is the check-off map future rounds trust; its §2C headline
count drifted once (said 282 while the registry held 298), so the count
is now structural: this test recomputes it from `core.all_queries()`.
"""
import re
import os

import __spark_entry__ as entry
from process_nwb_spark.relational.core import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_count_matches_registry():
    reg = all_queries()
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(r"(\d+) queries, \*\*(\d+) SQL-oracled", text)
    assert m, "COVERAGE.md lost its '<N> queries, **<N> SQL-oracled' line"
    assert int(m.group(1)) == len(reg), (
        f"COVERAGE.md says {m.group(1)} queries, registry has {len(reg)}")
    n_oracled = sum(1 for s in reg.values() if s.oracle is not None)
    assert int(m.group(2)) == n_oracled, (
        f"COVERAGE.md says {m.group(2)} SQL-oracled, registry has {n_oracled}")


def test_driver_priority_names_resolve_and_are_unique():
    reg = all_queries()
    names = entry.DRIVER_PRIORITY
    assert len(set(names)) == len(names), "duplicate in DRIVER_PRIORITY"
    missing = [n for n in names if n not in reg]
    assert not missing, f"DRIVER_PRIORITY names not in registry: {missing}"


def test_r9_first_sampling_prefix_covers_the_driver_gap():
    """The r9 window's head must contain every face the driver has never
    sampled (the 14 r8b-late faces) plus the 4 faces whose semantics
    changed in r8b — green rows on these take cumulative driver coverage
    to 298/298."""
    never_sampled = {
        "agg_count_min_sketch", "alert_hysteresis_state", "dq_freshness_lag",
        "dq_join_cardinality", "dq_key_skew_profile", "fn_url_parse",
        "scd2_apply_changeset", "set_except_all", "set_intersect_all",
        "sql_group_by_all", "text_chunk_overlap", "text_kgram_dup_profile",
        "ts_lttb_downsample", "win_ratio_to_report"}
    modified_r8b = {"sub_not_exists_customers", "sub_scalar_threshold",
                    "join_anti", "set_except"}
    head = set(entry.DRIVER_PRIORITY[:50])
    assert never_sampled <= head
    assert modified_r8b <= head
