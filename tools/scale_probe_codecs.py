"""Scaling probe: the codec kernels (GIF/LZW, baseline JPEG, the
round-9/10 container walks MP4 + MKV/EBML + Ogg, and the round-11
ingest archive tier ZIP / gzip / WARC / TAR).

Every op runs its full REAL encode->parse pipeline inside an
Arrow-batched ``mapInPandas`` kernel over an id-sliced documents scan
— the shard/partition is the unit of parallelism, so throughput
(items/sec) must RISE with data volume until the 32 cores saturate,
exactly like the other mapInPandas families (PNG/WAV/BMP probes in
earlier rounds).

Method: synthetic documents tables of n, 4n, 16n doc_ids (plus a
deterministic text column — warc_ingest_stats wraps the document's
own text) are written to a temp dir, and each op is timed end-to-end
(count() drain) at each multiplier after one untimed warm-up.

Run: python tools/scale_probe_codecs.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from k_means_hadoop_spark.operators.round8 import (
    gif_decode_stats,
    jpeg_decode_stats,
)
from k_means_hadoop_spark.operators.round9 import mp4_container_stats
from k_means_hadoop_spark.operators.round10 import (
    mkv_container_stats,
    ogg_container_stats,
)
from k_means_hadoop_spark.operators.round11 import (
    gzip_member_stats,
    tar_archive_stats,
    warc_ingest_stats,
    zip_container_stats,
)
from k_means_hadoop_spark.session import get_spark

BASE_N = 10_000  # ~1.4k planted images per op at 1x (the sf0.1 scale)
MULTS = (1, 4, 16)


def main() -> None:
    spark = get_spark("scale-probe-codecs")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'op':>18} {'mult':>5} {'images':>8} {'wall_s':>7} {'img/s':>8}")
    for mult in MULTS:
        tmp = tempfile.mkdtemp(prefix=f"codec_probe_{mult}x_")
        n_rows = BASE_N * mult
        pd.DataFrame(
            {
                "doc_id": range(n_rows),
                "text": [
                    f"synthetic document body {i} " * (1 + i % 5)
                    for i in range(n_rows)
                ],
            }
        ).to_parquet(os.path.join(tmp, "documents.parquet"), index=False)
        for name, fn in (("gif_decode_stats", gif_decode_stats),
                         ("jpeg_decode_stats", jpeg_decode_stats),
                         ("mp4_container_stats", mp4_container_stats),
                         ("mkv_container_stats", mkv_container_stats),
                         ("ogg_container_stats", ogg_container_stats),
                         ("zip_container_stats", zip_container_stats),
                         ("gzip_member_stats", gzip_member_stats),
                         ("warc_ingest_stats", warc_ingest_stats),
                         ("tar_archive_stats", tar_archive_stats)):
            fn(spark, tmp).count()  # warm-up (codegen + Arrow init)
            t0 = time.perf_counter()
            n = fn(spark, tmp).count()
            wall = time.perf_counter() - t0
            print(
                f"{name:>18} {mult:>5} {n:>8} {wall:>7.2f} {n / wall:>8.0f}"
            )


if __name__ == "__main__":
    main()
