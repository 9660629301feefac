"""Round-11 operators.

Reference parity context: the reference engine is the Hadoop K-Means
job (``/root/reference/KMeans.java``) plus its PCA notebook; everything
here is the beyond-reference analytics surface (SURVEY.md §2.9) built
Spark-first.  Each entry is a ``(spark_fn, duckdb_sql)`` pair merged
into the registry.

This round adds the ARCHIVE tier next to the media containers
(round-10 verdict item 5): ``zip_container_stats`` plants real ZIP
archives (``functions/codecs.py`` — local headers, central directory,
EOCD back-scan, stored + raw-DEFLATE members, per-member REFLECTED
CRC-32 0xEDB88320 complementing Ogg's unreflected 0x04C11DB7) and
``gzip_member_stats`` plants multi-member gzip streams (RFC 1952 —
the Common Crawl WARC/WET shape: one member per record, FNAME headers,
CRC-32 + ISIZE trailers); both prove encode→parse by roundtrip
against closed-form oracles.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.relational import _t


def _pickle_round11_by_value() -> None:
    """Ship THIS module's kernels (and codecs) inside the plan — the
    multimodal.py portability fix, so workers never need the repo on
    sys.path (the round-8 convention)."""
    import sys

    from pyspark import cloudpickle

    from k_means_hadoop_spark.operators.multimodal import _pickle_by_value

    _pickle_by_value()
    cloudpickle.register_pickle_by_value(sys.modules[__name__])


# ------------------------------------------------- ZIP archive stats
#
# Planted spec per doc_id d (the doc_id % 7 slices are all taken by
# the media containers — 0/3/5 images, 1/2 MP4, 4 MKV, 6 Ogg — so the
# archive tier slices doc_id % 11 == 7; overlap with a media slice is
# harmless because every plant derives its bytes from doc_id
# arithmetic independently):
#   nm = 2 + d%3 members; member i (0-based), name 'm{i}.bin':
#     STORED when (d+i)%2 == 0: 30 + (d+i)%23 bytes of
#       (d*13 + i*17 + j) % 256 (high-entropy, kept verbatim);
#     DEFLATE when (d+i)%2 == 1: the byte (d*13 + i*17) % 256 repeated
#       100 + (d+i)%50 times (a run DEFLATE must shrink — the kernel
#       asserts compressed_size < size for every deflated member).
# The kernel encodes the archive, re-parses it through the EOCD
# back-scan + central-directory walk (which verifies every member's
# reflected CRC-32, inflated size, and central-vs-local consistency),
# and checks EVERY member's name, method, and payload byte against the
# plant; the oracle computes the same stats from the arithmetic.  A
# hash match therefore certifies the archive layer end to end.
# Compressed sizes are NOT closed-form (they depend on the DEFLATE
# encoder), so the output carries only plant-derivable columns plus
# the kernel-verified parse_ok.


def _zip_plant(did: int) -> list[dict]:
    """The planted archive spec for doc_id ``did`` (shared by the
    kernel and the roundtrip pins in tests/test_round11_ops.py)."""
    members = []
    for i in range(2 + did % 3):
        if (did + i) % 2 == 0:
            data = bytes(
                ((did * 13 + i * 17 + j) % 256)
                for j in range(30 + (did + i) % 23)
            )
            method = "stored"
        else:
            data = bytes([(did * 13 + i * 17) % 256]) * (100 + (did + i) % 50)
            method = "deflate"
        members.append({"name": f"m{i}.bin", "data": data, "method": method})
    return members


def zip_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, parse_ok, n_members, stored_members, deflated_members,
    total_uncompressed, member_names) — REAL ZIP encode→parse roundtrip
    with per-member reflected CRC-32 verification over planted archives
    (spec in ``_zip_plant``)."""
    import pandas as pd

    from k_means_hadoop_spark.functions import codecs
    from k_means_hadoop_spark.partitioning import fan_out

    _pickle_round11_by_value()
    # fan_out: one small input split would serialize the kernel on a
    # single core (the round-8 codec-kernel lesson)
    ids = fan_out(
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 11 == 7)
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                want = _zip_plant(did)
                blob = codecs.encode_zip(want)
                try:
                    p = codecs.parse_zip(blob)
                    ok = (
                        p["n_members"] == len(want)
                        and p["comment"] == b""
                        and [m["name"] for m in p["members"]]
                        == [m["name"] for m in want]
                        and [m["method"] for m in p["members"]]
                        == [m["method"] for m in want]
                        and [m["data"] for m in p["members"]]
                        == [m["data"] for m in want]
                        and all(
                            m["compressed_size"] < len(m["data"])
                            for m in p["members"]
                            if m["method"] == "deflate"
                        )
                        and codecs.sniff_format(blob) == "zip"
                    )
                    rows.append(
                        (
                            did,
                            bool(ok),
                            p["n_members"],
                            sum(
                                1
                                for m in p["members"]
                                if m["method"] == "stored"
                            ),
                            sum(
                                1
                                for m in p["members"]
                                if m["method"] == "deflate"
                            ),
                            p["total_uncompressed"],
                            ",".join(m["name"] for m in p["members"]),
                        )
                    )
                except ValueError:
                    rows.append((did, False, 0, 0, 0, 0, ""))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "parse_ok",
                    "n_members",
                    "stored_members",
                    "deflated_members",
                    "total_uncompressed",
                    "member_names",
                ],
            )

    return ids.mapInPandas(
        _batches,
        schema=(
            "media_id bigint, parse_ok boolean, n_members int,"
            " stored_members int, deflated_members int,"
            " total_uncompressed bigint, member_names string"
        ),
    )


# Closed form: nm = 2 + d%3 members; member i is stored iff (d+i)%2=0
# with 30 + (d+i)%23 bytes, else deflated with 100 + (d+i)%50
# uncompressed bytes; nm <= 4, so range(4) with an i < nm filter
# covers every member exactly (the MP4/MKV oracle pattern).
ZIP_STATS_SQL = """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 3 AS nm
  FROM documents WHERE doc_id % 11 = 7),
m AS (
  SELECT d.doc_id, d.nm, i.range AS i,
         CASE WHEN (d.doc_id + i.range) % 2 = 0
              THEN 30 + (d.doc_id + i.range) % 23
              ELSE 100 + (d.doc_id + i.range) % 50 END AS usize,
         ((d.doc_id + i.range) % 2 = 0) AS is_stored
  FROM d CROSS JOIN range(4) i WHERE i.range < d.nm),
agg AS (
  SELECT doc_id,
         count(*)::INT AS n_members,
         SUM(CASE WHEN is_stored THEN 1 ELSE 0 END)::INT AS stored_members,
         SUM(CASE WHEN is_stored THEN 0 ELSE 1 END)::INT AS deflated_members,
         SUM(usize)::BIGINT AS total_uncompressed,
         string_agg('m' || i || '.bin', ',' ORDER BY i) AS member_names
  FROM m GROUP BY doc_id)
SELECT doc_id AS media_id, true AS parse_ok, n_members, stored_members,
       deflated_members, total_uncompressed, member_names
FROM agg
"""


# ------------------------------------------------ gzip member stats
#
# Planted spec per doc_id d (slice doc_id % 11 == 3 — the archive tier
# next to ZIP's % 11 == 7): nm = 1 + d%3 members concatenated as one
# multi-member gzip stream (the Common Crawl WARC/WET shape: one
# member per record); member i carries the byte (d*7 + i*11) % 256
# repeated 80 + (d+i)%40 times (a run DEFLATE must shrink) and is
# NAMED 'r{i}.warc' (FNAME flag) when (d+i)%2 == 0, anonymous
# otherwise.  The kernel encodes, re-parses through the member walk
# (which verifies each member's reflected CRC-32 and ISIZE trailer),
# and checks every member's name and payload byte against the plant;
# the oracle computes the same stats from the arithmetic.  Compressed
# sizes are encoder-dependent, so the output carries plant-derivable
# columns plus the kernel-verified parse_ok only.


def _gzip_plant(did: int) -> list[dict]:
    """The planted multi-member stream spec for doc_id ``did`` (shared
    by the kernel and the roundtrip pins in tests/test_round11_ops.py)."""
    members = []
    for i in range(1 + did % 3):
        m = {
            "data": bytes([(did * 7 + i * 11) % 256])
            * (80 + (did + i) % 40)
        }
        if (did + i) % 2 == 0:
            m["name"] = f"r{i}.warc"
        members.append(m)
    return members


def gzip_member_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, parse_ok, n_members, named_members,
    total_uncompressed, member_names) — REAL multi-member gzip
    encode→parse roundtrip with per-member reflected CRC-32 + ISIZE
    verification over planted streams (spec in ``_gzip_plant``)."""
    import pandas as pd

    from k_means_hadoop_spark.functions import codecs
    from k_means_hadoop_spark.partitioning import fan_out

    _pickle_round11_by_value()
    ids = fan_out(
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 11 == 3)
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                want = _gzip_plant(did)
                blob = codecs.encode_gzip(want)
                try:
                    p = codecs.parse_gzip(blob)
                    ok = (
                        p["n_members"] == len(want)
                        and [m["name"] for m in p["members"]]
                        == [m.get("name") for m in want]
                        and [m["data"] for m in p["members"]]
                        == [m["data"] for m in want]
                        and codecs.sniff_format(blob) == "gzip"
                    )
                    rows.append(
                        (
                            did,
                            bool(ok),
                            p["n_members"],
                            sum(
                                1
                                for m in p["members"]
                                if m["name"] is not None
                            ),
                            p["total_uncompressed"],
                            ",".join(
                                m["name"] or "-" for m in p["members"]
                            ),
                        )
                    )
                except ValueError:
                    rows.append((did, False, 0, 0, 0, ""))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "parse_ok",
                    "n_members",
                    "named_members",
                    "total_uncompressed",
                    "member_names",
                ],
            )

    return ids.mapInPandas(
        _batches,
        schema=(
            "media_id bigint, parse_ok boolean, n_members int,"
            " named_members int, total_uncompressed bigint,"
            " member_names string"
        ),
    )


# Closed form: nm = 1 + d%3 members; member i has 80 + (d+i)%40 bytes
# and a name iff (d+i)%2 = 0; nm <= 3, so range(3) with an i < nm
# filter covers every member exactly.
GZIP_STATS_SQL = """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 3 AS nm
  FROM documents WHERE doc_id % 11 = 3),
m AS (
  SELECT d.doc_id, i.range AS i,
         (80 + (d.doc_id + i.range) % 40) AS usize,
         ((d.doc_id + i.range) % 2 = 0) AS named
  FROM d CROSS JOIN range(3) i WHERE i.range < d.nm),
agg AS (
  SELECT doc_id,
         count(*)::INT AS n_members,
         SUM(CASE WHEN named THEN 1 ELSE 0 END)::INT AS named_members,
         SUM(usize)::BIGINT AS total_uncompressed,
         string_agg(
           CASE WHEN named THEN 'r' || i || '.warc' ELSE '-' END,
           ',' ORDER BY i) AS member_names
  FROM m GROUP BY doc_id)
SELECT doc_id AS media_id, true AS parse_ok, n_members, named_members,
       total_uncompressed, member_names
FROM agg
"""


# ------------------------------------------------ WARC ingest stats
#
# The full Common Crawl ingest composition, layer by layer: per
# document (slice doc_id % 11 == 5) build a 2-record WARC — a
# 'warcinfo' record with the fixed 32-byte payload
# b'software: k-means-hadoop-spark\r\n' and a 'response' record whose
# payload is the DOCUMENT'S OWN TEXT bytes — wrap one gzip member per
# record (the .warc.gz convention), then parse back DOWN the stack:
# gzip member walk (CRC-32 + ISIZE verified) → WARC record parse
# (version, headers, Content-Length bound, trailer verified) → field
# + payload-byte comparison against the plant.  Unlike the arithmetic
# plants, this oracle depends on the REAL table: the response payload
# length is length(text) (bytes == chars on the ASCII-pinned
# fixtures), so a wrong text roundtrip anywhere in the stack flips
# the driver hash.

_WARCINFO_PAYLOAD = b"software: k-means-hadoop-spark\r\n"  # 32 bytes


def warc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, parse_ok, n_records, response_payload_bytes,
    total_payload_bytes, record_types) — .warc.gz encode→parse
    roundtrip (gzip member walk + WARC record parse, both fully
    verified) where the response payload is the document's own
    text."""
    import pandas as pd

    from k_means_hadoop_spark.functions import codecs
    from k_means_hadoop_spark.partitioning import fan_out

    _pickle_round11_by_value()
    docs = fan_out(
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 11 == 5)
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                rid = f"<urn:uuid:{did:08x}>"
                # encode INSIDE the try: a non-ASCII text (or a header
                # an encoder rejects) must emit parse_ok=False like
                # every other malformed case, not fail the Spark task
                # (UnicodeEncodeError IS a ValueError subclass)
                try:
                    body = str(text).encode("ascii")
                    info = codecs.encode_warc_record(
                        [("WARC-Type", "warcinfo"), ("WARC-Record-ID", rid)],
                        _WARCINFO_PAYLOAD,
                    )
                    resp = codecs.encode_warc_record(
                        [("WARC-Type", "response"), ("WARC-Record-ID", rid)],
                        body,
                    )
                    blob = codecs.encode_gzip([{"data": info}, {"data": resp}])
                    g = codecs.parse_gzip(blob)
                    # parse each member ONCE; the one-record-per-member
                    # check reads the same parse result
                    parsed = [codecs.parse_warc(m["data"]) for m in g["members"]]
                    recs = [p["records"][0] for p in parsed]
                    ok = (
                        g["n_members"] == 2
                        and all(p["n_records"] == 1 for p in parsed)
                        and recs[0]["headers"]["WARC-Type"] == "warcinfo"
                        and recs[0]["payload"] == _WARCINFO_PAYLOAD
                        and recs[1]["headers"]["WARC-Type"] == "response"
                        and recs[1]["payload"] == body
                        and all(
                            r["headers"]["WARC-Record-ID"] == rid
                            and r["version"] == "WARC/1.0"
                            and int(r["headers"]["Content-Length"])
                            == len(r["payload"])
                            for r in recs
                        )
                    )
                    rows.append(
                        (
                            did,
                            bool(ok),
                            len(recs),
                            len(recs[1]["payload"]),
                            sum(len(r["payload"]) for r in recs),
                            ",".join(r["headers"]["WARC-Type"] for r in recs),
                        )
                    )
                except ValueError:
                    rows.append((did, False, 0, 0, 0, ""))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "parse_ok",
                    "n_records",
                    "response_payload_bytes",
                    "total_payload_bytes",
                    "record_types",
                ],
            )

    return docs.mapInPandas(
        _batches,
        schema=(
            "media_id bigint, parse_ok boolean, n_records int,"
            " response_payload_bytes bigint, total_payload_bytes bigint,"
            " record_types string"
        ),
    )


# The oracle reads the REAL table: response bytes = length(text)
# (bytes == characters on the ASCII-pinned fixtures), warcinfo adds
# the fixed 32-byte payload.
WARC_STATS_SQL = """
SELECT doc_id AS media_id, true AS parse_ok, 2::INT AS n_records,
       length(text)::BIGINT AS response_payload_bytes,
       (32 + length(text))::BIGINT AS total_payload_bytes,
       'warcinfo,response' AS record_types
FROM documents WHERE doc_id % 11 = 5
"""


# ------------------------------------------------- TAR archive stats
#
# Planted spec per doc_id d (slice doc_id % 11 == 9): nm = 2 + d%2
# members; member i, name 'f{i}.dat', carries 40 + (d+i)%30 bytes of
# (d*17 + i*23 + j) % 256.  Every payload is under one block, so the
# archive is exactly 2*nm + 2 blocks (header + data per member, two
# terminator blocks) — closed-form for the oracle.  The kernel
# encodes, re-parses through the ustar walk (which verifies every
# header checksum, octal size, padding, and the terminator), and
# checks every member's name and payload byte against the plant.


def _tar_plant(did: int) -> list[dict]:
    """The planted archive spec for doc_id ``did`` (shared by the
    kernel and the roundtrip pins in tests/test_round11_ops.py)."""
    return [
        {
            "name": f"f{i}.dat",
            "data": bytes(
                ((did * 17 + i * 23 + j) % 256)
                for j in range(40 + (did + i) % 30)
            ),
        }
        for i in range(2 + did % 2)
    ]


def tar_archive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, parse_ok, n_members, total_payload_bytes,
    archive_blocks, member_names) — POSIX ustar encode→parse roundtrip
    with per-header checksum verification over planted archives (spec
    in ``_tar_plant``)."""
    import pandas as pd

    from k_means_hadoop_spark.functions import codecs
    from k_means_hadoop_spark.partitioning import fan_out

    _pickle_round11_by_value()
    ids = fan_out(
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 11 == 9)
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                want = _tar_plant(did)
                blob = codecs.encode_tar(want)
                try:
                    p = codecs.parse_tar(blob)
                    ok = (
                        p["n_members"] == len(want)
                        and [m["name"] for m in p["members"]]
                        == [m["name"] for m in want]
                        and [m["data"] for m in p["members"]]
                        == [m["data"] for m in want]
                        and all(
                            m["size"] == len(m["data"])
                            for m in p["members"]
                        )
                    )
                    rows.append(
                        (
                            did,
                            bool(ok),
                            p["n_members"],
                            p["total_payload_bytes"],
                            p["archive_blocks"],
                            ",".join(m["name"] for m in p["members"]),
                        )
                    )
                except ValueError:
                    rows.append((did, False, 0, 0, 0, ""))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "parse_ok",
                    "n_members",
                    "total_payload_bytes",
                    "archive_blocks",
                    "member_names",
                ],
            )

    return ids.mapInPandas(
        _batches,
        schema=(
            "media_id bigint, parse_ok boolean, n_members int,"
            " total_payload_bytes bigint, archive_blocks bigint,"
            " member_names string"
        ),
    )


# Closed form: nm = 2 + d%2; member i carries 40 + (d+i)%30 bytes
# (< 512, so one data block each); archive blocks = 2*nm + 2.
TAR_STATS_SQL = """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 2 AS nm
  FROM documents WHERE doc_id % 11 = 9),
m AS (
  SELECT d.doc_id, d.nm, i.range AS i,
         (40 + (d.doc_id + i.range) % 30) AS usize
  FROM d CROSS JOIN range(3) i WHERE i.range < d.nm),
agg AS (
  SELECT doc_id,
         count(*)::INT AS n_members,
         SUM(usize)::BIGINT AS total_payload_bytes,
         (2 * count(*) + 2)::BIGINT AS archive_blocks,
         string_agg('f' || i || '.dat', ',' ORDER BY i) AS member_names
  FROM m GROUP BY doc_id)
SELECT doc_id AS media_id, true AS parse_ok, n_members,
       total_payload_bytes, archive_blocks, member_names
FROM agg
"""


ROUND11_QUERIES: dict = {
    "zip_container_stats": (zip_container_stats, ZIP_STATS_SQL),
    "gzip_member_stats": (gzip_member_stats, GZIP_STATS_SQL),
    "warc_ingest_stats": (warc_ingest_stats, WARC_STATS_SQL),
    "tar_archive_stats": (tar_archive_stats, TAR_STATS_SQL),
}
