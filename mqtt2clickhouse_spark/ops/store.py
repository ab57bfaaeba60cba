"""Write-once materialization of derived state under /tmp.

One publish primitive for every store in the repo (graph edge view,
trained k-means quantizer, documents shingle table, MinHash signature
store): build into a private temp directory, then publish with an
ATOMIC ``os.rename`` — so a reader can never observe a half-written
store, and two concurrent builders race safely (exactly one rename
wins; the loser discards its build).  The plain
check-marker-then-overwrite pattern has a window where writer B's
``mode("overwrite")`` deletes writer A's in-flight output; with the
driver's smoke/correctness/bench stages all touching the same /tmp
keys, that window is worth closing.

A leftover directory WITHOUT Spark's ``_SUCCESS`` marker (a build that
crashed before publish could never exist here — publish is a rename of
a complete build — but an older store layout or a torn filesystem
might leave one) is treated as garbage: removed, then the rename is
retried once.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def _complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def materialize_once(df: DataFrame, path: str) -> DataFrame:
    """Ensure ``path`` holds the parquet materialization of ``df`` and
    return a DataFrame reading it.  Builds at most once per path per
    machine; concurrent callers are safe."""
    spark = df.sparkSession
    if not _complete(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.build.{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            if not _complete(path):
                # garbage at the destination (no _SUCCESS): replace it
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    # lost a rare second race — someone else published
                    shutil.rmtree(tmp, ignore_errors=True)
            else:
                # a concurrent builder published first; discard ours
                shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)
