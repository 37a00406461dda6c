"""Micro-probe: does handing pyarrow numpy arrays (instead of Python
lists) for array<bigint> UDF output cut the enrich stage's
serialization cost?

The enrich UDF currently emits `sig64[i].tolist()` — at 240k docs x
128 perms that boxes ~30M Python ints per run. pyarrow can convert a
pandas object-Series of np.int64 arrays directly; if results are
identical, the kernels switch to zero-copy-ish output.

Usage: python tools/arrow_serialization_probe.py [n_docs]
Writes nothing; prints timings + equality verdict.

Measured result (24k docs, local[8], warm): list and ndarray output
are within noise of each other (identical checksums; the hashing
kernel dominates, Arrow conversion of either representation is a
small fraction). The production kernels therefore keep their current
list output — no change was justified by this probe.
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from deduplication_spark.corpus import generate_corpus
    from deduplication_spark.session import get_spark

    spark = get_spark(app_name="arrow_probe", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = generate_corpus(n_docs, with_jaccard=False)
    docs = spark.createDataFrame(corpus.documents[["doc_id", "text"]]).repartition(16)
    docs = docs.localCheckpoint(eager=True)

    from deduplication_spark.functions.text import _shingle_batch

    mul, add = np.uint64(0x9E3779B97F4A7C15), np.uint64(0x1234)

    def make(mode: str):
        @pandas_udf("array<bigint>")
        def shingles(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            err = np.seterr(over="ignore")
            try:
                for series in it:
                    s = _shingle_batch(series, 5, mul, add)
                    if mode == "ndarray":
                        yield pd.Series(
                            [np.asarray(v, dtype=np.int64) for v in s],
                            dtype=object,
                            index=s.index,
                        )
                    else:
                        yield s  # lists (current behavior)
            finally:
                np.seterr(**err)

        return shingles

    results = {}
    for mode in ("list", "ndarray", "list", "ndarray"):
        t0 = time.time()
        h = (
            docs.select(F.xxhash64(make(mode)(F.col("text")).cast("string")).alias("h"))
            .agg(F.bit_xor("h"))
            .collect()[0][0]
        )
        dt = time.time() - t0
        results.setdefault(mode, []).append(dt)
        print(f"{mode}: {dt:.2f}s checksum={h}")
    print({m: min(v) for m, v in results.items()})


if __name__ == "__main__":
    main()
