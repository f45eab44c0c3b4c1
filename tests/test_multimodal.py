"""Binary metadata without codecs (sources/multimodal.py): magic-byte
sniffing and PNG/GIF header dimensions, truncation-safe."""


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
        "jpg": ("jpeg", None, None),       # needs a scan, not a header
        "pdf": ("pdf", None, None),
        "junk": ("unknown", None, None),
        "short": ("png", None, None),      # truncated → NULL, no failure
    }
