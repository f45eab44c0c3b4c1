"""Web-table extraction — relational rows from HTML ``<table>`` markup.

HTML tables are the second great structured-markup source after
JSON-LD: the WebTables program (Cafarella et al., VLDB'08 "WebTables:
exploring the power of tables on the web") showed the crawl contains
~100M genuine relations. The reference's analog is signature/field
extraction from parsed code; the web form recovers (header → value)
pairs per data row.

* :func:`extract_table_cells` — three chained ``posexplode`` levels
  (table → tr → td/th), each a ``regexp_extract_all`` on the PREVIOUS
  level's fragment, all inside whole-stage codegen: the html payload
  never crosses an exchange, and the output is (url, table_idx,
  row_idx, col_idx, cell) with 1-based indexes. Subset (documented):
  tags may carry attributes (``<table class=…>``); nested tables,
  colspan/rowspan, and thead/tbody grouping are out of scope — the
  cells of a nested table surface under the OUTER table's cell regex
  only if marked up flat.
* :func:`table_relations` — WebTables relation recovery under the
  simplest header model: row 1 is the header (real WebTables adds a
  header-detection classifier; documented simplification). One slim
  (url, table_idx, col_idx)-keyed join maps each data cell to its
  column header.

All outputs are strings/BIGINT — the DuckDB mirrors are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TBL_RE = r"(?s)<table[^>]*>(.*?)</table>"
_TR_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
_TD_RE = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"


def extract_table_cells(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → (url, table_idx, row_idx, col_idx, cell), 1-based."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    tables = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(html_str, F.lit(_TBL_RE), F.lit(1))
        ).alias("tpos", "tbl"),
    )
    rows = tables.select(
        "url",
        (F.col("tpos") + 1).cast("long").alias("table_idx"),
        F.posexplode(
            F.regexp_extract_all("tbl", F.lit(_TR_RE), F.lit(1))
        ).alias("rpos", "tr"),
    )
    return rows.select(
        "url",
        "table_idx",
        (F.col("rpos") + 1).cast("long").alias("row_idx"),
        F.posexplode(
            F.regexp_extract_all("tr", F.lit(_TD_RE), F.lit(1))
        ).alias("cpos", "cell"),
    ).select(
        "url",
        "table_idx",
        "row_idx",
        (F.col("cpos") + 1).cast("long").alias("col_idx"),
        F.trim("cell").alias("cell"),
    )


def table_relations(cells: DataFrame) -> DataFrame:
    """(url, table_idx, row_idx, col_idx, cell) → (url, table_idx,
    row_idx, header, value) — each data cell (row_idx > 1) paired with
    its column's row-1 header. Cells past the header width drop (ragged
    rows; WebTables discards them too)."""
    header = cells.filter(F.col("row_idx") == 1).select(
        "url", "table_idx", "col_idx", F.col("cell").alias("header")
    )
    data = cells.filter(F.col("row_idx") > 1)
    return data.join(header, ["url", "table_idx", "col_idx"]).select(
        "url", "table_idx", "row_idx", "header", F.col("cell").alias("value")
    )


def table_relations_sql(cells_sql: str) -> str:
    """DuckDB mirror over a closed-form (url, table_idx, row_idx,
    col_idx, cell) relation."""
    return f"""
    WITH c AS ({cells_sql}),
    h AS (SELECT url, table_idx, col_idx, cell AS header
          FROM c WHERE row_idx = 1),
    d AS (SELECT * FROM c WHERE row_idx > 1)
    SELECT d.url, CAST(d.table_idx AS BIGINT) AS table_idx,
           CAST(d.row_idx AS BIGINT) AS row_idx,
           h.header, d.cell AS value
    FROM d JOIN h ON h.url = d.url AND h.table_idx = d.table_idx
                 AND h.col_idx = d.col_idx
    """


def column_types(relations: DataFrame) -> DataFrame:
    """→ (header, n_values, top_type, n_top, majority_type): corpus-wide
    column typing over the recovered (header, value) pairs — the schema
    half of WebTables (VLDB'08 §4: the attribute-correlation statistics
    database starts from per-column types).  Every value is classified
    with the SAME regex-gated rules as triple objects
    (`operators/literals.py::_typing_exprs` — bool/integer/decimal/
    date/entity, no bare casts), then each header takes its modal type;
    ``majority_type`` is the modal type only under a STRICT integer
    majority ``2·n_top > n_values`` (else 'mixed' — a column half ids,
    half prose is not an integer column).

    Scale shape: one codegen typing projection fused into the scan, one
    (header, type) groupBy (map-side combined, ≤5 rows per header), one
    header-keyed argmax via min(struct) — no window, no text wider than
    the header string over any exchange.
    """
    from augmented_codebase_indexer_spark.operators.literals import (
        _typing_exprs,
    )

    typed = relations.selectExpr("header", "value AS obj").selectExpr(
        "header", f"{_typing_exprs('spark')['obj_type']} AS obj_type"
    )
    per_type = typed.groupBy("header", "obj_type").agg(
        F.count("*").cast("long").alias("c")
    )
    return (
        per_type.groupBy("header")
        .agg(
            F.sum("c").alias("n_values"),
            F.min(F.struct((-F.col("c")).alias("nc"),
                           F.col("obj_type").alias("t"))).alias("w"),
        )
        .selectExpr(
            "header", "n_values", "w.t AS top_type", "-w.nc AS n_top",
            "CASE WHEN 2 * (-w.nc) > n_values THEN w.t "
            "ELSE 'mixed' END AS majority_type",
        )
    )


def column_types_sql(relations_sql: str) -> str:
    """DuckDB mirror: same typing rules, same strict-majority gate,
    same min-struct tie-break (lexicographically smallest type wins a
    count tie in both engines)."""
    from augmented_codebase_indexer_spark.operators.literals import (
        _typing_exprs,
    )

    obj_type = _typing_exprs("duckdb")["obj_type"]
    return f"""
    WITH typed AS (
      SELECT header, {obj_type} AS obj_type
      FROM (SELECT header, value AS obj FROM ({relations_sql}))),
    per_type AS (
      SELECT header, obj_type, CAST(count(*) AS BIGINT) AS c
      FROM typed GROUP BY header, obj_type),
    agg AS (
      SELECT header, sum(c) AS n_values,
             min(ROW(-c, obj_type)) AS w
      FROM per_type GROUP BY header)
    SELECT header, n_values, w[2] AS top_type, -w[1] AS n_top,
           CASE WHEN 2 * (-w[1]) > n_values THEN w[2]
                ELSE 'mixed' END AS majority_type
    FROM agg
    """
