"""Politeness fetch scheduling — Crawl-delay parsing plus slot→timestamp
assignment over the frontier queue, and the per-host drain report.

Completes the crawl chain frontier → budget → SCHEDULE: the frontier
(`operators/frontier.py`) assigns each url its 1-based per-host fetch
slot, the budget apportions fleet capacity (`operators/budget.py`), and
this stage turns slots into actual fetch timestamps a rate-limited
fetcher executes — one url per host per delay window (the Mercator
frontier discipline, Heydon & Najork WWW'99).

* :func:`parse_crawl_delays` — the de-facto ``Crawl-delay:`` directive
  (not in RFC 9309 but honored by Bing/Yandex): per domain, the delay of
  the governing user-agent group under the SAME exact-agent-else-``*``
  precedence as `operators/robots.py::apply_robots` (cited there; group
  attachment is the identical gaps-and-islands window). Values are
  regex-gated (``^[0-9]{1,6}([.][0-9]{1,3})?$``) then assembled in
  integer MILLISECONDS (int part × 1000 + zero-padded fraction) — no
  float, no bare cast (TRY_CAST after the gate, per the cross-engine
  cast discipline); junk values → NULL → caller default. Multiple
  delay lines in the governing group take the minimum (deterministic).
* :func:`fetch_schedule` — queue(url, host, slot) × delays: per url,
  ``fetch_epoch_ms = start + (slot−1)·delay_ms``. Hosts without a
  parsed delay get ``default_delay_ms``.
* :func:`host_drain` — the schedule folded to per-host drain time and
  the count of urls that do NOT fit a crawl window — the feedback
  number the budget stage consumes next cycle (a host with overflow
  needs fewer queued urls or a longer window, never a politeness
  violation).

Scale shape at 10^10 queued urls: delays are O(domains) and ride the
counted broadcast guard; the schedule is one broadcast join + one
codegen projection (slots already exist — no new window); the drain
report is one host-keyed aggregate with map-side combine. Everything
gated is strings/BIGINT/boolean.

Reference anchor: the reference's watch scheduler debounces per-path
event storms (`src/aci/core/debouncer.py`); this is the polite-crawler
form — rate limiting per origin host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .guards import guarded_broadcast

_DELAY_GATE = "^[0-9]{1,6}([.][0-9]{1,3})?$"


def parse_crawl_delays(
    robots: DataFrame,
    agent: str = "aci-bot",
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, robots_txt) → (domain, delay_ms) for domains whose
    governing group declares a parseable Crawl-delay; everything else is
    simply absent (caller coalesces to its default)."""
    agent = agent.lower()
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "raw"),
    ).select(
        "domain", "ln",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "domain", "ln",
        F.lower(F.trim(F.regexp_extract(
            "line", r"(?i)^(user-agent|crawl-delay)\s*:", 1))).alias("directive"),
        F.trim(F.regexp_extract(
            "line", r"(?i)^(?:user-agent|crawl-delay)\s*:(.*)$", 1)).alias("value"),
    ).filter(F.col("directive") != "")
    w = Window.partitionBy("domain").orderBy("ln")
    grouped = parsed.withColumn(
        "is_ua", (F.col("directive") == "user-agent").cast("int")
    ).withColumn(
        "starts",
        ((F.col("is_ua") == 1)
         & (F.coalesce(F.lag("is_ua").over(w), F.lit(0)) == 0)).cast("int"),
    ).withColumn("grp", F.sum("starts").over(w)).filter(F.col("grp") > 0)
    agents = (
        grouped.filter(F.col("is_ua") == 1)
        .select("domain", "grp", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    delays = grouped.filter(
        (F.col("is_ua") == 0)
        & F.col("value").rlike(_DELAY_GATE)
    ).selectExpr(
        "domain", "grp",
        "try_cast(regexp_extract(value, '^([0-9]{1,6})', 1) AS BIGINT)"
        " * 1000"
        " + try_cast(rpad(regexp_extract(value, '[.]([0-9]{1,3})', 1),"
        " 3, '0') AS BIGINT) AS delay_ms",
    ).filter(F.col("delay_ms").isNotNull())
    tagged = agents.join(delays, ["domain", "grp"]).filter(
        F.col("agent").isin(agent, "*")
    )
    has_exact = tagged.filter(F.col("agent") == agent).select("domain").distinct()
    governing = tagged.join(has_exact, "domain", "left_semi").filter(
        F.col("agent") == agent
    ).unionByName(
        tagged.join(has_exact, "domain", "left_anti").filter(F.col("agent") == "*")
    )
    return governing.groupBy("domain").agg(F.min("delay_ms").alias("delay_ms"))


def fetch_schedule(
    queue: DataFrame,
    delays: DataFrame,
    start_epoch_ms: int = 1_700_000_000_000,
    default_delay_ms: int = 1000,
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """queue(url, host, slot) × delays(domain, delay_ms) →
    (url, host, slot, delay_ms, fetch_epoch_ms)."""
    d = guarded_broadcast(
        delays.select(F.col("domain").alias("host"),
                      F.col("delay_ms").alias("_delay")),
        broadcast_max_rows,
    )
    return (
        queue.join(d, "host", "left")
        .selectExpr(
            "url", "host", "slot",
            f"coalesce(_delay, {default_delay_ms}) AS delay_ms",
        )
        .selectExpr(
            "url", "host", "slot", "delay_ms",
            f"{start_epoch_ms} + (slot - 1) * delay_ms AS fetch_epoch_ms",
        )
    )


def host_drain(schedule: DataFrame, window_ms: int) -> DataFrame:
    """schedule → (host, n_urls, delay_ms, drain_ms, overflow_urls,
    fits_window): the per-host drain report the next budget cycle
    consumes. ``drain_ms`` is the last fetch's offset; ``overflow_urls``
    counts urls whose offset falls at/after the crawl window."""
    return (
        schedule.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.max("delay_ms").alias("delay_ms"),
            F.max((F.col("slot") - 1) * F.col("delay_ms")).alias("drain_ms"),
            F.sum(
                F.when((F.col("slot") - 1) * F.col("delay_ms")
                       >= F.lit(window_ms), 1).otherwise(0)
            ).cast("long").alias("overflow_urls"),
        )
        .withColumn("fits_window", F.col("overflow_urls") == 0)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def parse_crawl_delays_oracle_sql(
    robots_sql: str, agent: str = "aci-bot"
) -> str:
    """Mirror of :func:`parse_crawl_delays` over a (domain, robots_txt)
    relation (gaps-and-islands group attachment, gated integer-ms
    assembly, exact-agent-else-* precedence, min per domain)."""
    agent = agent.lower()
    return f"""
    WITH robots AS ({robots_sql}),
    lines AS (
      SELECT domain, ln - 1 AS ln,
             trim(regexp_replace(raw, '#.*$', '')) AS line
      FROM (SELECT domain,
                   unnest(string_split(robots_txt, chr(10))) AS raw,
                   unnest(range(1, len(string_split(robots_txt, chr(10))) + 1))
                     AS ln
            FROM robots)),
    parsed AS (
      SELECT domain, ln,
             lower(trim(regexp_extract(line,
               '(?i)^(user-agent|crawl-delay)\\s*:', 1))) AS directive,
             trim(regexp_extract(line,
               '(?i)^(?:user-agent|crawl-delay)\\s*:(.*)$', 1)) AS value
      FROM lines
      WHERE regexp_matches(line, '(?i)^(user-agent|crawl-delay)\\s*:')),
    flagged AS (
      SELECT *, CASE WHEN directive = 'user-agent' THEN 1 ELSE 0 END AS is_ua
      FROM parsed),
    starts AS (
      SELECT *,
             CASE WHEN is_ua = 1 AND coalesce(lag(is_ua) OVER
               (PARTITION BY domain ORDER BY ln), 0) = 0
               THEN 1 ELSE 0 END AS s
      FROM flagged),
    grouped AS (
      SELECT *, sum(s) OVER (PARTITION BY domain ORDER BY ln
                             ROWS UNBOUNDED PRECEDING) AS grp
      FROM starts WHERE TRUE),
    agents AS (
      SELECT DISTINCT domain, grp, lower(value) AS agent
      FROM grouped WHERE is_ua = 1 AND grp > 0),
    delays AS (
      SELECT domain, grp,
             TRY_CAST(regexp_extract(value, '^([0-9]{{1,6}})', 1) AS BIGINT)
               * 1000
             + TRY_CAST(rpad(regexp_extract(value, '[.]([0-9]{{1,3}})', 1),
                             3, '0') AS BIGINT) AS delay_ms
      FROM grouped
      WHERE is_ua = 0 AND grp > 0
        AND regexp_matches(value, '^[0-9]{{1,6}}([.][0-9]{{1,3}})?$')),
    tagged AS (
      SELECT a.domain, a.agent, d.delay_ms
      FROM agents a JOIN delays d ON a.domain = d.domain AND a.grp = d.grp
      WHERE d.delay_ms IS NOT NULL AND a.agent IN ('{agent}', '*')),
    has_exact AS (SELECT DISTINCT domain FROM tagged WHERE agent = '{agent}'),
    governing AS (
      SELECT t.* FROM tagged t JOIN has_exact USING (domain)
      WHERE t.agent = '{agent}'
      UNION ALL
      SELECT t.* FROM tagged t ANTI JOIN has_exact USING (domain)
      WHERE t.agent = '*')
    SELECT domain, min(delay_ms) AS delay_ms FROM governing GROUP BY domain
    """


def fetch_schedule_oracle_sql(
    queue_sql: str,
    robots_sql: str,
    agent: str = "aci-bot",
    start_epoch_ms: int = 1_700_000_000_000,
    default_delay_ms: int = 1000,
) -> str:
    """Mirror of :func:`fetch_schedule` composed over the crawl-delay
    parse mirror; queue_sql must expose (url, host, slot)."""
    dl = parse_crawl_delays_oracle_sql(robots_sql, agent)
    return f"""
    WITH queue AS ({queue_sql}),
    dl AS ({dl}),
    j AS (
      SELECT q.url, q.host, q.slot,
             coalesce(d.delay_ms, {default_delay_ms}) AS delay_ms
      FROM queue q LEFT JOIN dl d ON q.host = d.domain)
    SELECT url, host, slot, delay_ms,
           {start_epoch_ms} + (slot - 1) * delay_ms AS fetch_epoch_ms
    FROM j
    """


def host_drain_oracle_sql(schedule_sql: str, window_ms: int) -> str:
    """Mirror of :func:`host_drain`."""
    return f"""
    WITH s AS ({schedule_sql}),
    agg AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
             max(delay_ms) AS delay_ms,
             max((slot - 1) * delay_ms) AS drain_ms,
             CAST(coalesce(sum(CASE WHEN (slot - 1) * delay_ms
                                    >= {window_ms} THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS overflow_urls
      FROM s GROUP BY host)
    SELECT host, n_urls, delay_ms, drain_ms, overflow_urls,
           overflow_urls = 0 AS fits_window
    FROM agg
    """
