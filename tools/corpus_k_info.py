#!/usr/bin/env python3
"""Print the embedding family's scale decision for a dataset: the
corpus size n, the derived cluster count K = corpus_k(n), and which
assignment path the build takes (literal-centroid codegen vs the
broadcast-join argmin) — the lever VERDICT r5 #2 asked to make
visible without reading code. Usage:

    python tools/corpus_k_info.py [--sf 0.01 ...]

One line per requested scale factor.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    sfs = [a for a in sys.argv[1:] if not a.startswith("--")] or ["0.001", "0.01", "0.1"]

    from datatransformertools_spark.operators.similarity import (
        K_LITERAL_MAX,
        TARGET_CELL,
        corpus_k,
    )
    from datatransformertools_spark.session import get_spark

    spark = get_spark("corpus-k-info")
    print(
        f"corpus_k = max(8, ceil(n / {TARGET_CELL}))  |  "
        f"literal-codegen ceiling K_LITERAL_MAX = {K_LITERAL_MAX}"
    )
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        k = corpus_k(spark, sf_dir)
        path = "literal (codegen projection)" if k <= K_LITERAL_MAX else "join (_cells_join broadcast argmin)"
        print(f"sf{sf}: n_vectors={n}  K={k}  avg_cell≈{n / k:.0f}  assignment={path}")


if __name__ == "__main__":
    main()
