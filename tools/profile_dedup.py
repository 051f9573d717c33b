"""Stage-level profile of the cold dedup_clusters path at sf0.1 —
times each memoized intermediate separately, then the CC loop.

Usage: python tools/profile_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from df_spark.operators import dedup as D  # noqa: E402
from df_spark.operators.clustering import dedup_groups  # noqa: E402
from df_spark.session import get_spark  # noqa: E402
from df_spark.sources.tables import load_sdf  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_dedup", short_lived=True)
    docs = load_sdf(spark, sf_dir, "documents")
    docs.count()  # warm the scan

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    t = time.time()
    c = bench.jvm_cpu_seconds()

    def lap(label: str):
        nonlocal t, c
        now, cnow = time.time(), bench.jvm_cpu_seconds()
        print(f"{label:34s} {now - t:7.2f}s wall  {cnow - c:7.1f} cpu-s")
        t, c = now, cnow

    combined = D._shared_build(docs)
    n_docs = combined.count()
    lap(f"_shared_build ({n_docs} docs, words={len(D._build_words(combined))})")

    prof = D.shared_profile(docs)
    prof.count()
    lap("shared_profile (slice)")

    sigs = D.minhash_signatures(profile=prof)
    cand = D.lsh_candidate_pairs(sigs)
    n_cand = cand.count()
    lap(f"lsh_candidates ({n_cand})")

    pairs = D.minhash_near_dups(docs, min_jaccard=0.6)
    n_pairs = pairs.count()
    lap(f"verify ({n_pairs} pairs)")

    out = dedup_groups(pairs, docs)
    out.write.format("noop").mode("overwrite").save()
    lap("connected_components+out")


if __name__ == "__main__":
    main()
