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
