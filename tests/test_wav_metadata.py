"""RIFF/WAVE metadata walk (sources/multimodal.py::sniff_wav_metadata):
canonical layout, chunk reordering/LIST skipping, odd-size padding,
truncation, junk — against bytes built with struct (the ground truth)."""

import struct


def _wav(sr=8000, ch=1, bits=16, n_samples=100, pre_chunks=(), truncate=0):
    block = ch * bits // 8
    data = b"\x00" * (n_samples * block)
    chunks = b""
    for cid, payload in pre_chunks:
        chunks += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunks += b"\x00"
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * block, block, bits)
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    riff = b"WAVE" + chunks
    out = b"RIFF" + struct.pack("<I", len(riff)) + riff
    return out[: len(out) - truncate] if truncate else out


CASES = [
    # (name, bytes, expected (fmt, sample_rate, channels, bits, duration_ms))
    ("canonical", _wav(), ("wav", 8000, 1, 16, 12)),
    ("stereo_44k", _wav(sr=44100, ch=2, n_samples=44100),
     ("wav", 44100, 2, 16, 1000)),
    ("list_first", _wav(pre_chunks=((b"LIST", b"INFO"),)),
     ("wav", 8000, 1, 16, 12)),
    ("odd_chunk_pad", _wav(pre_chunks=((b"junk", b"xyz"),)),
     ("wav", 8000, 1, 16, 12)),
    ("truncated_data", _wav(truncate=10), ("wav", 8000, 1, 16, None)),
    ("zip_junk", b"PK\x03\x04" + b"\x00" * 40,
     ("unknown", None, None, None, None)),
    ("riff_but_avi", b"RIFF" + struct.pack("<I", 20) + b"AVI " + b"\x00" * 16,
     ("unknown", None, None, None, None)),
    ("too_short", b"RIFF\x04\x00", ("unknown", None, None, None, None)),
]


def test_wav_metadata_cases(spark):
    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_wav_metadata,
    )

    df = spark.createDataFrame(
        [(name, content) for name, content, _ in CASES],
        "name string, content binary",
    )
    got = {
        r["name"]: (
            r["fmt"], r["sample_rate"], r["channels"], r["bits"],
            r["duration_ms"],
        )
        for r in sniff_wav_metadata(df).collect()
    }
    for name, _, want in CASES:
        assert got[name] == want, (name, got[name], want)


def test_many_chunks_bounded(spark):
    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_wav_metadata,
    )

    # 9 filler chunks push fmt past the 8-chunk walk bound → NULLs, no error
    filler = tuple((b"fill", b"ab") for _ in range(9))
    df = spark.createDataFrame(
        [("deep", _wav(pre_chunks=filler))], "name string, content binary"
    )
    r = sniff_wav_metadata(df).collect()[0]
    assert r["fmt"] == "wav" and r["sample_rate"] is None
    assert r["duration_ms"] is None
