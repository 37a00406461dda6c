"""Corpus generator determinism + class-shape tests (SURVEY.md §5.2)."""

from deduplication_spark.corpus import (
    CLASS_EXACT,
    CLASS_NEAR,
    CLASS_SUBSTRING,
    generate_corpus,
)


def test_deterministic():
    c1 = generate_corpus(300, with_jaccard=False)
    c2 = generate_corpus(300, with_jaccard=False)
    assert c1.documents["text"].tolist() == c2.documents["text"].tolist()
    assert c1.documents["url"].tolist() == c2.documents["url"].tolist()
    assert c1.truth_pairs.equals(c2.truth_pairs)


def test_class_fractions_and_truth():
    c = generate_corpus(1000)
    frac = c.documents["dup_class"].value_counts(normalize=True)
    assert frac["unique"] > 0.4
    assert 0.10 < frac[CLASS_EXACT] < 0.20
    assert 0.12 < frac[CLASS_NEAR] < 0.25
    # exact dups really are byte-identical to their source
    docs = c.documents.set_index("doc_id")
    exact = c.truth_pairs[c.truth_pairs["class"] == CLASS_EXACT]
    assert len(exact) > 0
    for _, r in exact.head(20).iterrows():
        assert docs.loc[r.doc_id_a, "text"] == docs.loc[r.doc_id_b, "text"]
        assert docs.loc[r.doc_id_a, "url"] != docs.loc[r.doc_id_b, "url"]
    assert (exact["true_jaccard"] == 1.0).all()
    # substring dups embed a >=512-char verbatim span
    sub = c.truth_pairs[c.truth_pairs["class"] == CLASS_SUBSTRING]
    for _, r in sub.head(10).iterrows():
        a = docs.loc[r.doc_id_a, "text"]
        b = docs.loc[r.doc_id_b, "text"]
        src, dst = (a, b) if r.doc_id_a < r.doc_id_b else (b, a)
        # the copied span is a contiguous substring of the source
        assert _longest_common_substring_at_least(src, dst, 512)
    # near dups are similar but not identical
    near = c.truth_pairs[c.truth_pairs["class"] == CLASS_NEAR]
    assert (near["true_jaccard"] > 0.3).all()
    assert (near["true_jaccard"] < 1.0).all()
    # truth clusters: roots are minimal members
    tc = c.truth_clusters
    assert (tc.groupby("truth_cluster_id")["doc_id"].min().index
            == tc.groupby("truth_cluster_id")["doc_id"].min().values).all()


def _longest_common_substring_at_least(a: str, b: str, n: int) -> bool:
    # spans are copied at token boundaries, so some token-aligned window
    # of b of >= n chars must appear verbatim in a
    toks = b.split(" ")
    for i in range(len(toks)):
        chars, j = 0, i
        while j < len(toks) and chars < n:
            chars += len(toks[j]) + 1
            j += 1
        if chars >= n and " ".join(toks[i:j]) in a:
            return True
    return False


def test_html_wraps_text():
    c = generate_corpus(50)
    r = c.documents.iloc[0]
    assert r.html == ("<html><body>" + r.text + "</body></html>").encode()
