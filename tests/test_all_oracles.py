"""Hard gate over EVERY queries() entry vs its DuckDB twin.

The driver's CORRECTNESS gate caps at 50 rows; round 4's additions rotated
five round-3 oracles (word_hash, date_extract, date_extract_text,
candidate_routing, line_segments) past the cap, so regressions there were
no longer driver-visible. This test restores the guarantee: all entries —
including the rotated tail — must pass rows+schema+value-hash at sf0.01.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

ROTATED = {
    "word_hash", "date_extract", "date_extract_text",
    "candidate_routing", "line_segments",
}


def test_every_oracle_passes(spark):
    import __spark_entry__ as entry
    from check_oracles import SF_DIR, check

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    names = set(entry.queries())
    assert ROTATED <= names  # the rotated five are still defined
    failures, n_checked = check(spark)
    assert n_checked == len(names)  # every entry ran, none filtered
    assert n_checked >= 55
    assert failures == []
