"""ISO-BMFF metadata walk (sources/multimodal.py::sniff_mp4_metadata):
struct-built ground truth — canonical layout, moov after free boxes,
mvhd behind sibling boxes, v1 declared NULL, junk/truncation."""

import struct


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mvhd(timescale, duration, version=0):
    if version == 0:
        payload = (b"\x00\x00\x00\x00" + b"\x00" * 8
                   + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    else:
        payload = (b"\x01\x00\x00\x00" + b"\x00" * 16
                   + struct.pack(">IQ", timescale, duration) + b"\x00" * 80)
    return _box(b"mvhd", payload)


def _mp4(timescale=600, duration=1200, pre_boxes=(), moov_pre=(),
         version=0, brand=b"isom"):
    ftyp = _box(b"ftyp", brand + b"\x00\x00\x02\x00" + brand)
    moov_kids = b"".join(_box(t, p) for t, p in moov_pre)
    moov_kids += _mvhd(timescale, duration, version)
    moov = _box(b"moov", moov_kids)
    pre = b"".join(_box(t, p) for t, p in pre_boxes)
    return ftyp + pre + moov


CASES = [
    ("canonical", _mp4(), ("mp4", "isom", 600, 2000)),
    ("avc_brand_90k", _mp4(timescale=90000, duration=45000, brand=b"avc1"),
     ("mp4", "avc1", 90000, 500)),
    ("free_boxes_first",
     _mp4(pre_boxes=((b"free", b"xx"), (b"skip", b"yyyy"))),
     ("mp4", "isom", 600, 2000)),
    ("mvhd_behind_siblings",
     _mp4(moov_pre=((b"udta", b"meta"), (b"iods", b"abc"))),
     ("mp4", "isom", 600, 2000)),
    ("v1_declared_null", _mp4(version=1), ("mp4", "isom", None, None)),
    ("no_moov", _box(b"ftyp", b"isom\x00\x00\x02\x00isom")
     + _box(b"free", b"x"), ("mp4", "isom", None, None)),
    ("junk", b"\x00\x01\x02\x03garbagegarbage",
     ("unknown", None, None, None)),
    ("truncated_moov", _mp4()[:40], ("mp4", "isom", None, None)),
]


def test_mp4_metadata_cases(spark):
    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_mp4_metadata,
    )

    df = spark.createDataFrame(
        [(n, c) for n, c, _ in CASES], "name string, content binary"
    )
    got = {
        r["name"]: (r["fmt"], r["major_brand"], r["timescale"],
                    r["duration_ms"])
        for r in sniff_mp4_metadata(df).collect()
    }
    for name, _, want in CASES:
        assert got[name] == want, (name, got[name], want)


def test_box_walk_bounded(spark):
    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_mp4_metadata,
    )

    deep = _mp4(pre_boxes=tuple((b"free", b"x") for _ in range(9)))
    df = spark.createDataFrame([("deep", deep)], "name string, content binary")
    r = sniff_mp4_metadata(df).collect()[0]
    # 9 filler boxes push moov past the 8-box bound → NULLs, no error
    assert r["fmt"] == "mp4" and r["timescale"] is None
