"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the `documents(url, warc_ts, html, text, lang)` table from
BASELINE.json's input_hint, with injected duplicate classes mirroring the
reference's dedup regimes (high exact duplication at small units — see the
measured unique-block ratios in BASELINE.md) and records ground truth:

- truth_pairs(doc_id_a, doc_id_b, class, true_jaccard)
- truth_clusters(doc_id, truth_cluster_id)

Everything is seeded (seed 42 + doc_id); no wall clock, no external data.
`true_jaccard` is the exact Jaccard of k-word-shingle SETS (hash-free,
computed on raw token tuples), so the recall oracle is independent of the
pipeline's hash functions.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

import numpy as np
import pandas as pd

VOCAB_SIZE = 5000
CLASS_UNIQUE = "unique"
CLASS_EXACT = "exact"
CLASS_NEAR = "near"
CLASS_SUBSTRING = "substring"
CLASS_BOILERPLATE = "boilerplate"

# fractions per FIXTURES.md §1
_CLASS_CUM = [
    (CLASS_UNIQUE, 0.55),
    (CLASS_EXACT, 0.70),
    (CLASS_NEAR, 0.88),
    (CLASS_SUBSTRING, 0.95),
    (CLASS_BOILERPLATE, 1.00),
]

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)


def _build_vocab() -> np.ndarray:
    common = (
        "the a of to and in is for on with data query table row column "
        "join filter group sort hash scan merge spark stream batch value "
        "key order window part line customer small fast slow agg vector"
    ).split()
    words = common + [f"w{i:04d}" for i in range(VOCAB_SIZE - len(common))]
    return np.asarray(words, dtype=object)


def _zipf_cdf(n: int) -> np.ndarray:
    p = 1.0 / (np.arange(1, n + 1) + 10.0)
    return np.cumsum(p / p.sum())


@dataclass
class SyntheticCorpus:
    documents: pd.DataFrame
    truth_pairs: pd.DataFrame
    truth_clusters: pd.DataFrame


class _UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _shingle_set(tokens: list[str], k: int) -> set[tuple[str, ...]]:
    return {tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    shingle_k: int = 5,
    min_tokens: int = 50,
    max_tokens: int = 2000,
    with_jaccard: bool = True,
) -> SyntheticCorpus:
    vocab = _build_vocab()
    cdf = _zipf_cdf(VOCAB_SIZE)
    boiler_rng = np.random.default_rng(seed * 7919)
    boilerplates = [
        vocab[np.searchsorted(cdf, boiler_rng.random(400))].tolist()
        for _ in range(3)
    ]

    token_lists: list[list[str]] = []
    rows = []
    pair_rows = []
    n_base = max(10, n_docs // 50)  # first docs are forced unique

    for doc_id in range(n_docs):
        rng = np.random.default_rng(seed + doc_id)
        r = rng.random()
        cls = CLASS_UNIQUE
        if doc_id >= n_base:
            for name, cum in _CLASS_CUM:
                if r < cum:
                    cls = name
                    break

        def fresh(lo=min_tokens, hi=max_tokens):
            n = int(rng.integers(lo, hi + 1))
            return vocab[np.searchsorted(cdf, rng.random(n))].tolist()

        src = int(rng.integers(0, doc_id)) if doc_id > 0 else 0
        if cls == CLASS_UNIQUE:
            toks = fresh()
        elif cls == CLASS_EXACT:
            toks = list(token_lists[src])
            pair_rows.append((src, doc_id, cls))
        elif cls == CLASS_NEAR:
            toks = list(token_lists[src])
            rate = float(rng.uniform(0.01, 0.10))
            n_edit = max(1, int(len(toks) * rate))
            for _ in range(n_edit):
                op = rng.integers(0, 3)
                pos = int(rng.integers(0, len(toks)))
                w = vocab[int(np.searchsorted(cdf, rng.random()))]
                if op == 0 and len(toks) > min_tokens:
                    del toks[pos]
                elif op == 1:
                    toks.insert(pos, w)
                else:
                    toks[pos] = w
            pair_rows.append((src, doc_id, cls))
        elif cls == CLASS_SUBSTRING:
            toks = fresh(min_tokens, max_tokens // 2)
            # copy a token span whose joined char length is >= span_chars
            # (>= 512, up to ~2000); redraw the source until it is long
            # enough to supply the span in full.
            span_chars = int(rng.integers(512, 2001))
            src_toks = token_lists[src]
            for _ in range(20):
                if sum(len(t) + 1 for t in src_toks) - 1 >= span_chars:
                    break
                src = int(rng.integers(0, doc_id))
                src_toks = token_lists[src]
            if sum(len(t) + 1 for t in src_toks) - 1 < 512:
                # redraws exhausted without a source long enough for
                # even the MINIMUM catchable span (substring_min_len):
                # labeling such a pair 'substring' would assert recall
                # the tier never promised (its contract starts at 512
                # chars). Degrade the doc to unique — no truth pair.
                # Never taken at the shipped corpus scales (sources >=
                # 512 chars always exist); guards tiny/short-token
                # configurations.
                cls = CLASS_UNIQUE
            else:
                cum = np.cumsum([len(t) + 1 for t in src_toks])
                total = int(cum[-1])
                # clamp to what the source can actually supply in full
                span_chars = min(span_chars, total - 1)
                # valid starts leave >= span_chars characters after them
                start_char_budget = total - span_chars
                max_start = int(np.searchsorted(cum, start_char_budget))
                start = int(rng.integers(0, max(1, max_start)))
                end, chars = start, 0
                while end < len(src_toks) and chars < span_chars:
                    chars += len(src_toks[end]) + 1
                    end += 1
                span = src_toks[start:end]
                ins = int(rng.integers(0, len(toks) + 1))
                toks = toks[:ins] + span + toks[ins:]
                pair_rows.append((src, doc_id, cls))
        else:  # boilerplate skew: shared giant prefix, unique tail
            bp = boilerplates[int(rng.integers(0, 3))]
            toks = bp + fresh(50, 200)

        token_lists.append(toks)
        text = " ".join(toks)
        lang = ["en"] * 18 + ["ko", "de"]
        cat = ["news", "blog", "wiki", "shop"][doc_id % 4]
        rows.append(
            {
                "url": f"https://site{doc_id % 197}.example/{cat}/{doc_id}",
                "warc_ts": _EPOCH + _dt.timedelta(seconds=17 * doc_id),
                "html": ("<html><body>" + text + "</body></html>").encode(),
                "text": text,
                "lang": lang[(doc_id * 2654435761) % 20],
                "doc_id": doc_id,
                "dup_class": cls,
            }
        )

    # ground-truth jaccard per recorded pair (exact, hash-free)
    shingles = None
    if with_jaccard:
        shingles = {}
        need = {i for p in pair_rows for i in p[:2]}
        for i in need:
            shingles[i] = _shingle_set(token_lists[i], shingle_k)

    pairs = []
    uf = _UnionFind(n_docs)
    for a, b, cls in pair_rows:
        jac = _jaccard(shingles[a], shingles[b]) if with_jaccard else None
        pairs.append(
            {
                "doc_id_a": min(a, b),
                "doc_id_b": max(a, b),
                "class": cls,
                "true_jaccard": jac,
            }
        )
        uf.union(a, b)

    clusters = pd.DataFrame(
        {
            "doc_id": range(n_docs),
            "truth_cluster_id": [uf.find(i) for i in range(n_docs)],
        }
    )
    docs = pd.DataFrame(rows)
    truth_pairs = pd.DataFrame(
        pairs, columns=["doc_id_a", "doc_id_b", "class", "true_jaccard"]
    )
    return SyntheticCorpus(docs, truth_pairs, clusters)


def write_corpus(corpus: SyntheticCorpus, out_dir: str) -> None:
    import pathlib

    p = pathlib.Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    # Spark cannot read pandas' default nanosecond parquet timestamps —
    # coerce to microseconds.
    # Bounded row groups (r06): pandas' default writes ONE row group,
    # which caps every Spark scan of the file at one task regardless of
    # split config — a serial floor that silently dominated the scaling
    # drills on the optimized tree (parquet splits cannot cross row
    # groups). ~8k rows/group keeps even a 240k-doc corpus at 30+
    # scan-parallel units while staying far above tiny-row-group
    # overhead; real 100 TB corpora are many files and never hit this.
    corpus.documents.to_parquet(
        p / "documents.parquet",
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
        row_group_size=8192,
    )
    corpus.truth_pairs.to_parquet(p / "truth_pairs.parquet", index=False)
    corpus.truth_clusters.to_parquet(p / "truth_clusters.parquet", index=False)
