"""Feed parsing (operators/feeds.py): RSS and Atom item forms, link
coalescing, date parsing with weekday/zone stripping, NULL surfacing."""

from augmented_codebase_indexer_spark.operators.feeds import parse_feed

RSS = (
    "<rss><channel>"
    "<item><title>A</title><link>https://f.example/a</link>"
    "<pubDate>Fri, 02 Jan 2026 03:04:05 GMT</pubDate></item>"
    "<item><title>B</title><link>https://f.example/b</link>"
    "<pubDate>not a date</pubDate></item>"
    "<item><title>NoLink</title></item>"
    "</channel></rss>"
)
ATOM = (
    "<feed>"
    '<entry><title>C</title><link href="https://f.example/c"/>'
    "<updated>03 Jan 2026 10:00:00</updated></entry>"
    "</feed>"
)
EPOCH_A = 1767323045  # 2026-01-02 03:04:05 UTC
EPOCH_C = 1767434400  # 2026-01-03 10:00:00 UTC


def test_rss_and_atom_items(spark):
    feeds = spark.createDataFrame(
        [("rss.example", RSS), ("atom.example", ATOM)],
        "feed_url string, xml string",
    )
    got = {(r["feed_url"], r["item_idx"]):
           (r["link"], r["title"], r["published_epoch"])
           for r in parse_feed(feeds).collect()}
    assert got == {
        ("rss.example", 1): ("https://f.example/a", "A", EPOCH_A),
        ("rss.example", 2): ("https://f.example/b", "B", None),  # bad date
        # item 3 has no link → dropped
        ("atom.example", 1): ("https://f.example/c", "C", EPOCH_C),
    }


def test_numeric_zones_and_single_digit_days(spark):
    """ADVICE r5: RFC-1123 numeric zones ('+0000' — very common in RSS
    pubDate) and single-digit days must parse; non-UTC numeric offsets
    apply the REAL offset, not a strip-and-assume-UTC."""
    rss = (
        "<rss><channel>"
        "<item><title>Z0</title><link>u1</link>"
        "<pubDate>Fri, 02 Jan 2026 03:04:05 +0000</pubDate></item>"
        "<item><title>IST</title><link>u2</link>"
        "<pubDate>Fri, 02 Jan 2026 08:34:05 +0530</pubDate></item>"
        "<item><title>D1</title><link>u3</link>"
        "<pubDate>2 Jan 2026 03:04:05 GMT</pubDate></item>"
        "<item><title>D1Z</title><link>u4</link>"
        "<pubDate>2 Jan 2026 03:04:05 +0000</pubDate></item>"
        "</channel></rss>"
    )
    feeds = spark.createDataFrame([("f", rss)], "feed_url string, xml string")
    got = {r["link"]: r["published_epoch"] for r in parse_feed(feeds).collect()}
    # all four stamps name the same instant (08:34:05+05:30 == 03:04:05Z)
    assert got == {"u1": EPOCH_A, "u2": EPOCH_A, "u3": EPOCH_A, "u4": EPOCH_A}
