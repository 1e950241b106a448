"""r14 multi-table LSH cost/recall sweep: tables in {1, 2, 4, 8} against
the brute-force truth at sf0.1 (2000 vectors, threshold 0.4, 6 planes).

The operator's guidance says "spend tables when the miss rate matters, not
by default" — this measures the actual dial: recall grows with T by
OR-amplification (1-(1-p)^T) while cost grows ~linearly in T (T bucket
computations + T labels-only candidate joins). Precision is structurally 1
(every candidate is exact-verified), so only recall and wall move.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from analyst_toolkit_spark.ingest import load_table  # noqa: E402
from analyst_toolkit_spark.llm import similarity as S  # noqa: E402
from analyst_toolkit_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
THRESHOLD, PLANES = 0.4, 6


def main() -> None:
    spark = get_spark("sweep_r14_multitable")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    truth = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_pairs(emb, threshold=THRESHOLD, mode="exact").collect()
    }
    print(f"true pairs at cosine>={THRESHOLD}: {len(truth)}", flush=True)
    # warm once, untimed
    S.lsh_multi_table_pairs(emb, 64, n_planes=PLANES, threshold=THRESHOLD, n_tables=1).count()
    print("n_tables,found,recall,sec", flush=True)
    for t in (1, 2, 4, 8):
        t0 = time.perf_counter()
        found = {
            (r["id_a"], r["id_b"])
            for r in S.lsh_multi_table_pairs(
                emb, 64, n_planes=PLANES, threshold=THRESHOLD, n_tables=t,
                pair_cap=50_000_000,
            ).collect()
        }
        sec = time.perf_counter() - t0
        assert found <= truth, "precision must be 1"
        print(f"{t},{len(found)},{len(found) / len(truth):.3f},{sec:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
