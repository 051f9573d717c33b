"""Stage-level profile of the rarity-prefix family (prefix_sim_join +
containment_join) at sf0.1 — times the shared build, each candidate
stage, and each verify separately, in bench (alphabetical) order:
containment first, so it pays the shared ``_rarity_build`` exactly as
the suite attributes it.

Usage: python tools/profile_prefix.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from df_spark.operators import dedup as D  # noqa: E402
from df_spark.session import get_spark  # noqa: E402
from df_spark.sources.tables import load_sdf  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_prefix", short_lived=True)
    docs = load_sdf(spark, sf_dir, "documents")
    docs.count()  # warm the scan

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
        print(f"{label:44s} {now - t:7.2f}s wall  {cnow - c:7.1f} cpu-s")
        t, c = now, cnow

    pcols = ["source"]

    sh, arrays = D._rarity_build(docs, "doc_id", "text", 7, pcols)
    n_sh = sh.count()
    n_docs = arrays.count()
    lap(f"_rarity_build (sh={n_sh}, docs={n_docs})")

    cont = D.containment_pairs(docs, 0.8, partition_cols=pcols)
    n_cont = cont.count()
    lap(f"containment candidates+verify ({n_cont} out)")

    _, _, cand = D.prefix_candidate_pairs(docs, 0.7, partition_cols=pcols)
    n_cand = cand.count()
    lap(f"prefix candidates ({n_cand})")

    pairs = D.prefix_filtered_pairs(docs, 0.7, partition_cols=pcols)
    n_pairs = pairs.count()
    lap(f"prefix verify ({n_pairs} pairs)")


if __name__ == "__main__":
    main()
