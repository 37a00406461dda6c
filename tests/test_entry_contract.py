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
# Round 5 graduated every remaining rows-only query to a derived-
# invariant oracle (minhash_signatures / cdc_chunks / embedding_ann_lsh
# / multimodal_features) — the set is now empty; seeded raw values are
# pytest-verified instead.
ROWS_ONLY: set[str] = set()

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
    import re

    for name, sql in entry.oracle_sql().items():
        low = sql.lower()
        assert "select" in low, name
        # constant-expectation oracles (VALUES lists pinning an exact
        # invariant, e.g. pipeline_resume's per-stage statuses) are the
        # one sanctioned tableless form. Word-boundary match: a raw
        # substring check would let 'partition'/'regional' satisfy the
        # 'part'/'region' table names.
        assert any(
            re.search(rf"\b{t}\b", low) for t in TABLES
        ) or "(values" in low, f"{name}: no known table in SQL"


def test_truth_sql_is_rendered_from_config():
    """Round-3 verdict item 1: the flagship ground-truth oracle must be
    a FUNCTION of the config, not a hardcoded twin. Changing
    shingle_k / jaccard_verify_threshold must change the rendered SQL
    (so a config drift breaks this test instead of silently
    desynchronizing the oracle from the pipeline it checks)."""
    from deduplication_spark.config import DedupConfig

    cfg = DedupConfig()
    sql = entry._near_dup_truth_sql(cfg)
    # the module-level constant the oracle_sql() dict serves IS the
    # rendering at the entry CFG
    assert sql == entry._NEAR_DUP_TRUTH_SQL
    # config constants appear where the semantics need them
    k = cfg.shingle_k
    assert f"t[i:i+{k - 1}]" in sql          # k-token slice (1-based incl.)
    assert f"len(t) - {k - 1}" in sql        # gram positions
    assert f"len(t) >= {k}" in sql           # min-token guard
    assert f">= {cfg.jaccard_verify_threshold!r}" in sql

    # a different config renders a DIFFERENT oracle
    other = DedupConfig(shingle_k=7, min_doc_tokens=7)
    sql7 = entry._near_dup_truth_sql(other)
    assert sql7 != sql
    assert "t[i:i+6]" in sql7 and "len(t) >= 7" in sql7
    loose = DedupConfig(jaccard_verify_threshold=0.7)
    assert ">= 0.7" in entry._near_dup_truth_sql(loose)
