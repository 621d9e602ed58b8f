"""Global row indexing — the reference's record counter re-expressed for
distributed data (reference: ``itertools.count()`` record index driving row
numbering and --limit in /root/reference/common/csv2json.py:30,45).

A naive ``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY collapses
the whole table into ONE task — a non-starter at 10^10 rows. The scalable
shape is the classic two-pass scheme:

  1. range-partition by the order key and sort within partitions (this is
     exactly what a sort would do anyway — no extra shuffle);
  2. count rows per partition (cheap: partial counts, tiny driver fold);
  3. add each partition's cumulative offset to its local 0-based ordinal
     (one map-side Arrow pass, offsets looked up by TaskContext partition id).

Total cost: one range shuffle + one metadata-sized count job — vs the
single-reducer sort the window form degenerates to.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_global_index(
    df: DataFrame,
    order_by: list[str],
    index_col: str = "row_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign a strict, gap-free, 1-based global ordinal under ``order_by``.

    Deterministic for a total order (pass a tie-breaking key set). The
    range-partitioned frame is persisted across the two passes so the
    sampling-based partitioner cannot re-draw boundaries between them.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_by])
        .sortWithinPartitions(*order_by)
        .persist()
    )
    _CACHED.append(part)
    counts = (
        part.withColumn("_pid", F.spark_partition_id()).groupBy("_pid").count().collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["count"]

    out_schema = T.StructType(
        [T.StructField(index_col, T.LongType(), False)] + list(part.schema.fields)
    )
    cols = [f.name for f in part.schema.fields]

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        nxt = offsets.get(pid, 0) + 1  # 1-based
        for b in batches:
            b = b.copy()
            b.insert(0, index_col, range(nxt, nxt + len(b)))
            nxt += len(b)
            yield b[[index_col] + cols]

    return part.mapInPandas(_index, schema=out_schema)


_CACHED: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist the range-partitioned intermediates behind
    ``with_global_index`` results once they have been consumed (same
    contract as operators.dedup_text.release_caches)."""
    while _CACHED:
        _CACHED.pop().unpersist()
