"""augmented_codebase_indexer_spark — PySpark-native knowledge-graph construction.

A brand-new engine with the capabilities of the reference
(AperturePlus/augmented-codebase-indexer, a single-node async-Python
parse→chunk→embed→index→search system), re-expressed as triple extraction
over a table of Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
      → extract text (vectorized Arrow UDF, byte-identical vs pure-Python oracle)
      → mention detection (regex + broadcast gazetteer)
      → pattern-OpenIE triple extraction
      → entity linking (exact broadcast join + MinHash-LSH candidates + cosine scorer)
      → canonicalization (connected components, salted iterative joins)
      → materialize node/edge tables (subject-hash bucketed)
    with per-partition lineage, metrics and checkpoint-based resumability.

Everything is DataFrame-first: built-in pyspark.sql.functions in the hot
path, Arrow-batched pandas UDFs where Python is unavoidable, and driver
loops over DataFrame self-joins for the iterative graph algorithms.
"""

__version__ = "0.1.0"
