"""A/B: pure-Python BPE encode vs the native HF-`tokenizers` backend
(round-4 verdict item #3). Same synthetic Zipfian corpus, same
byte-level merge table, both through `count_tokens_udf` — the only
difference is the `backend` knob, so the delta is the Rust merge loop.

Prints one JSON line:
  {"bench": "bpe_backend_ab", "python_sec": ..., "native_sec": ...|null,
   "speedup": ...|null, "native_available": bool, "n_rows": ..., "sf": ...}

Where the library is absent (this sandbox) the native side records null
— the row documents the swap point exists and what the fallback costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ccdb_data_pipeline_spark.functions.bpe import (  # noqa: E402
    count_tokens_udf,
    learn_merges,
    native_backend_available,
)
from ccdb_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    n_rows = int(os.environ.get("BPE_AB_ROWS", "200000"))
    spark = build_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
        app_name="bpe-backend-ab",
    )
    # Zipfian-ish text: a small hot vocabulary + a long unique tail, the
    # shape the unique-word cache is designed for
    df = (
        spark.range(n_rows)
        .select(
            F.concat_ws(
                " ",
                F.concat(F.lit("word"), (F.col("id") % 50).cast("string")),
                F.concat(F.lit("term"), (F.col("id") % 500).cast("string")),
                F.concat(F.lit("tail"), F.col("id").cast("string")),
                F.lit("the quick brown fox héllo 東京"),
            ).alias("text")
        )
        .persist()
    )
    df.count()
    merges = learn_merges(
        {"the": 50, "quick": 30, "brown": 20, "word1": 40, "term2": 25,
         "héllo": 10, "東京": 8, "fox": 15},
        n_merges=24, byte_level=True,
    )

    def run(backend: str) -> float:
        udf = count_tokens_udf(merges, byte_level=True, backend=backend)
        t0 = time.monotonic()
        df.select(F.sum(udf(F.col("text")))).collect()
        return time.monotonic() - t0

    run("python")  # warm the JVM + python workers
    py = min(run("python") for _ in range(2))
    nat = None
    if native_backend_available():
        run("native")
        nat = min(run("native") for _ in range(2))
    print(json.dumps({
        "bench": "bpe_backend_ab",
        "python_sec": round(py, 3),
        "native_sec": round(nat, 3) if nat is not None else None,
        "speedup": round(py / nat, 2) if nat else None,
        "native_available": native_backend_available(),
        "n_rows": n_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
