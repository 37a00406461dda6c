"""Driver-contract shape guards (no Spark session needed).

The driver compares queries() against oracle_sql() at sf0.01; these
tests catch contract drift before the harness does: a query added
without an oracle must be a conscious rows-only decision (allowlist
below), and every oracle must target a registered table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# hash-seeded / iterative operators: rows-only BY DESIGN (documented in
# the module docstring). Growing this set should be a deliberate choice.
ROWS_ONLY = {
    "minhash_signatures",
    "cdc_chunks",
    "embedding_ann_lsh",
    "multimodal_features",
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_every_query_is_callable():
    qs = entry.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    qs = set(entry.queries())
    osql = entry.oracle_sql()
    extra = set(osql) - qs
    assert not extra, f"oracles without a query: {extra}"


def test_rows_only_set_is_exactly_the_allowlist():
    qs = set(entry.queries())
    osql = set(entry.oracle_sql())
    no_oracle = qs - osql
    assert no_oracle == ROWS_ONLY, (
        f"unexpected rows-only queries {no_oracle - ROWS_ONLY} "
        f"(add an oracle or extend the documented allowlist); "
        f"stale allowlist entries: {ROWS_ONLY - no_oracle}"
    )


def test_every_oracle_references_a_registered_table():
    for name, sql in entry.oracle_sql().items():
        low = sql.lower()
        assert "select" in low, name
        # constant-expectation oracles (VALUES lists pinning an exact
        # invariant, e.g. pipeline_resume's per-stage statuses) are the
        # one sanctioned tableless form
        assert any(t in low for t in TABLES) or "(values" in low, (
            f"{name}: no known table in SQL"
        )
