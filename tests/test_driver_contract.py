"""Driver-contract invariants: the harness records only the FIRST 50
queries() entries (observed in round 1: 55 registered, 50 recorded), and a
capability without an oracle gets no value check — so the budget and the
oracle map are load-bearing and must not drift."""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as E


def test_exactly_fifty_entries_all_oracled():
    q = E.queries()
    o = E.oracle_sql()
    assert len(q) == 50, f"driver records only the first 50 entries, got {len(q)}"
    assert set(o) == set(q), (
        f"oracle/entry mismatch: missing={sorted(set(q) - set(o))} "
        f"orphans={sorted(set(o) - set(q))}"
    )


def test_golden_oracles_present_and_values_shaped():
    # the golden files must exist (oracle_sql silently degrades to rows-only
    # without them) and parse as VALUES selects
    for key in (
        "x33_extract_full_corpus",
        "x34_search_with_previews",
        "x41_preview_docs_pages",
        "x47_checkpoint_lineage",
        "x48_media_pipeline",
    ):
        sql = E.oracle_sql()[key]
        assert "VALUES" in sql and "SELECT" in sql, key
