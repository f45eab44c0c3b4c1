"""Binary metadata without codecs (sources/multimodal.py): magic-byte
sniffing, PNG/GIF header dimensions, and the r6 JPEG SOF segment walk —
all truncation-safe."""


def test_sniff_and_dimensions(spark):
    import struct

    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_and_dimensions,
    )

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"x"
    rows = [("png", png), ("gif", gif), ("jpg", b"\xff\xd8\xff\xe0r"),
            ("pdf", b"%PDF-1.7"), ("junk", b"\x00\x01garbage"),
            ("short", b"\x89PNG\r\n\x1a\n\x00")]  # truncated header
    df = spark.createDataFrame(rows, "asset_id string, content binary")
    got = {r["asset_id"]: (r["fmt"], r["width"], r["height"])
           for r in sniff_and_dimensions(df).collect()}
    assert got == {
        "png": ("png", 640, 480),
        "gif": ("gif", 320, 200),          # little-endian parsed
        "jpg": ("jpeg", None, None),       # truncated after APP0 marker
        "pdf": ("pdf", None, None),
        "junk": ("unknown", None, None),
        "short": ("png", None, None),      # truncated → NULL, no failure
    }


def _jpeg(segments: list[bytes]) -> bytes:
    return b"\xff\xd8" + b"".join(segments)


def _seg(marker: int, payload: bytes) -> bytes:
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def test_jpeg_sof_walk(spark):
    """ITU T.81 segment walk: SOF0 after APP0/DQT/COM segments, SOF2
    (progressive), fill bytes before a marker, SOF past max-segments,
    SOS before any SOF, and truncated SOF payloads — dims exactly where
    a real decoder would find them, NULL everywhere else, no failures."""
    import struct

    from augmented_codebase_indexer_spark.sources.multimodal import (
        _JPEG_MAX_SEGMENTS,
        sniff_and_dimensions,
    )

    sof0 = _seg(0xC0, b"\x08" + struct.pack(">HH", 300, 500) + b"\x03")
    sof2 = _seg(0xC2, b"\x08" + struct.pack(">HH", 77, 99) + b"\x01")
    app0 = _seg(0xE0, b"JFIF\x00")
    dqt = _seg(0xDB, b"\x00" * 3)
    com = _seg(0xFE, b"hello world")
    rows = [
        ("baseline", _jpeg([app0, dqt, sof0])),
        ("progressive", _jpeg([app0, com, sof2])),
        ("immediate_sof", _jpeg([sof0])),
        ("fill_bytes", _jpeg([app0, b"\xff\xff\xff" + dqt[1:], sof0])),
        ("sos_first", _jpeg([app0, _seg(0xDA, b"\x01"), sof0])),
        ("sof_truncated", _jpeg([app0])[:-1] + _seg(0xC0, b"")[:5]),
        ("too_many_segments", _jpeg([com] * (_JPEG_MAX_SEGMENTS + 2) + [sof0])),
        ("garbage_walk", b"\xff\xd8\xff\xe0\x00\x02\x12\x34"),
    ]
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in rows], "asset_id string, content binary"
    )
    got = {r["asset_id"]: (r["fmt"], r["width"], r["height"])
           for r in sniff_and_dimensions(df).collect()}
    assert got["baseline"] == ("jpeg", 500, 300)
    assert got["progressive"] == ("jpeg", 99, 77)
    assert got["immediate_sof"] == ("jpeg", 500, 300)
    assert got["fill_bytes"] == ("jpeg", 500, 300)
    # SOS ends the header scan — dims after it are entropy-coded noise
    assert got["sos_first"] == ("jpeg", None, None)
    assert got["sof_truncated"] == ("jpeg", None, None)
    assert got["too_many_segments"] == ("jpeg", None, None)
    assert got["garbage_walk"] == ("jpeg", None, None)
