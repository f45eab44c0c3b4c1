"""robots.txt compliance — the crawl-politeness gate a web corpus
pipeline runs before anything else touches a page (RFC 9309, the Robots
Exclusion Protocol; the reference's nearest analog is its ignore-pattern
plumbing, ``core/file_scanner/scanner.py``'s deny rules — i.e. a
declarative per-tree exclusion list applied before ingestion).

Two relational stages, both pure DataFrame ops (no UDF, no driver loop):

* :func:`parse_robots` — (domain, robots_txt) → one rule row per
  Allow/Disallow line, tagged with the user-agent group that governs it.
  Group attachment is gaps-and-islands over line numbers (the same
  window shape as ``temporal.scd2_intervals``): a run of consecutive
  ``User-agent:`` lines opens a group; every rule line belongs to the
  most recent run. One (domain) partition per window — a robots file is
  KBs, so partitions are tiny and bounded.
* :func:`apply_robots` — URLs × rules: RFC 9309 precedence. Per RFC: if
  a group for the SPECIFIC agent exists, ONLY that group applies (else
  the ``*`` group); the most specific (longest-pattern) matching rule
  wins; on an allow/disallow tie at equal length, allow wins; no
  matching rule (or no robots.txt for the domain) means allowed.
  Patterns support the de-facto ``*`` wildcard and ``$`` end anchor by
  compiling to SQL ``LIKE`` (identical semantics in Spark and DuckDB:
  ``*``→``%``, literal ``%_\\`` escaped, ``$`` drops the trailing
  ``%``). Specificity = pattern length, RFC's "octets in the rule".

Scale shape at 10^10 urls: rules are O(domains × rules-per-file) — tiny
next to the URL table — and ship through the counted broadcast guard;
the match is then a broadcast equi-join on domain with the LIKE
predicate evaluated in codegen, so candidate rows stay in their input
partition. The verdict is a groupBy + min over a sort-key struct (NOT a
per-url window): it partial-aggregates map-side, so exactly ONE combined
row per url crosses the exchange. Everything in the gated output is
strings/booleans/BIGINTs — no float anywhere. Callers pass DISTINCT url
rows (exact-duplicate rows collapse in the verdict groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .domains import host_sql_expr
from .guards import guarded_broadcast

# host (group 1) and path (group 2) of an absolute http(s) url; the path
# default "/" matches RFC 9309's empty-path normalization
_URL_PATH_RE = r"^https?://([^/?#]+)([^?#]*)"


def _path_col(url) -> F.Column:
    p = F.regexp_extract(url, _URL_PATH_RE, 2)
    return F.when(p == "", F.lit("/")).otherwise(p)


def parse_robots(robots: DataFrame, domain_col: str = "domain",
                 text_col: str = "robots_txt") -> DataFrame:
    """(domain, robots_txt) → (domain, agent, rule, pattern, pat_len).

    ``agent`` is lowercased; ``rule`` ∈ {'allow', 'disallow'}; empty
    ``Disallow:`` lines are dropped per RFC (an empty pattern matches
    nothing). Comments (#...) and unknown directives are ignored. A rule
    line before any User-agent line has no governing group and is
    dropped (RFC: rules outside a group are invalid)."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "raw"),
    ).select(
        "domain", "ln",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "domain", "ln",
        F.lower(F.trim(F.regexp_extract("line", r"(?i)^(user-agent|allow|disallow)\s*:", 1))).alias("directive"),
        F.trim(F.regexp_extract("line", r"(?i)^(?:user-agent|allow|disallow)\s*:(.*)$", 1)).alias("value"),
    ).filter(F.col("directive") != "")
    # gaps-and-islands: a User-agent line NOT preceded (at the previous
    # kept directive) by another User-agent line starts a new group; the
    # running sum of starts is the group id every following rule joins
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
    rules = grouped.filter(
        (F.col("is_ua") == 0) & (F.col("value") != "")
    ).select(
        "domain", "grp",
        F.col("directive").alias("rule"),
        F.col("value").alias("pattern"),
        F.length("value").cast("long").alias("pat_len"),
    )
    return agents.join(rules, ["domain", "grp"]).select(
        "domain", "agent", "rule", "pattern", "pat_len"
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "aci-bot",
    url_col: str = "url",
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """Verdict per URL row: (…urls columns…, robots_allowed boolean,
    matched_rule, matched_pattern).

    RFC 9309 precedence, fully relational: pick the governing group
    (exact-agent rules if the domain has any, else ``*``), keep rules
    whose compiled LIKE pattern matches the url path, take the winner by
    (pat_len desc, allow-before-disallow, pattern); unmatched urls
    (including domains with no robots.txt at all) are allowed."""
    from .domains import host_col

    agent = agent.lower()
    # compile robots patterns to LIKE patterns relationally (builtins
    # only — identical rewrite in the oracle): escape LIKE
    # metacharacters, * → %, trailing $ anchors (no trailing %)
    rl = rules.filter(F.col("agent").isin(agent, "*")).withColumn(
        "anchored", F.col("pattern").endswith("$")
    ).withColumn(
        "body",
        F.when(F.col("anchored"),
               F.expr("substring(pattern, 1, length(pattern) - 1)"))
        .otherwise(F.col("pattern")),
    ).withColumn(
        "like_pat",
        F.concat(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(F.col("body"), r"\\", r"\\\\"),
                        "%", r"\\%"),
                    "_", r"\\_"),
                r"\*", "%"),
            F.when(F.col("anchored"), F.lit("")).otherwise(F.lit("%")),
        ),
    ).drop("anchored", "body")
    # RFC: if an exact-agent group exists for a domain, ONLY it applies
    has_exact = rl.filter(F.col("agent") == agent).select("domain").distinct()
    governing = rl.join(has_exact, "domain", "left_semi").filter(
        F.col("agent") == agent
    ).unionByName(
        rl.join(has_exact, "domain", "left_anti").filter(F.col("agent") == "*")
    )
    governing = guarded_broadcast(
        governing.select("domain", "rule", "pattern", "pat_len", "like_pat"),
        broadcast_max_rows,
    )
    u = urls.withColumn("_dom", host_col(F.col(url_col))).withColumn(
        "_path", _path_col(F.col(url_col))
    )
    # Column.like only takes a literal; the column-pattern LIKE is SQL
    cand = u.join(
        governing, F.expr("_dom = domain AND _path LIKE like_pat"), "left"
    )
    # winner = min over a sort-key struct: (−pat_len, rule, pattern) ≡
    # longest pattern first, then allow before disallow ('allow' <
    # 'disallow'), then pattern text so equal-length same-verdict
    # duplicates pick the same matched_pattern on both engines. A
    # groupBy+min (NOT a window): the broadcast join leaves every url's
    # candidate rows in their input partition, so the min partial-
    # aggregates map-side and exactly ONE combined row per url crosses
    # the exchange — a per-url window would instead shuffle and sort
    # every candidate row. The unmatched left-join row carries a null
    # pat_len → sentinel sort key that loses to any real rule.
    big = 1 << 62
    pick = F.struct(
        F.coalesce(-F.col("pat_len"), F.lit(big)).alias("neg_len"),
        F.coalesce(F.col("rule"), F.lit("~none")).alias("rule"),
        F.coalesce(F.col("pattern"), F.lit("")).alias("pattern"),
    )
    out_cols = [c for c in urls.columns]
    return (
        cand.groupBy(*out_cols)
        .agg(F.min(pick).alias("best"))
        .select(
            *out_cols,
            F.col("best.rule").isin("allow", "~none").alias("robots_allowed"),
            F.when(F.col("best.rule") == "~none", F.lit("no_match"))
            .otherwise(F.col("best.rule")).alias("matched_rule"),
            F.when(F.col("best.rule") == "~none", F.lit(None).cast("string"))
            .otherwise(F.col("best.pattern")).alias("matched_pattern"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def parse_robots_oracle_sql(robots_sql: str) -> str:
    """Mirror of :func:`parse_robots` over a (domain, robots_txt) CTE."""
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
               '(?i)^(user-agent|allow|disallow)\\s*:', 1))) AS directive,
             trim(regexp_extract(line,
               '(?i)^(?:user-agent|allow|disallow)\\s*:(.*)$', 1)) AS value
      FROM lines
      WHERE regexp_matches(line, '(?i)^(user-agent|allow|disallow)\\s*:')),
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
      FROM starts),
    agents AS (
      SELECT DISTINCT domain, grp, lower(value) AS agent
      FROM grouped WHERE is_ua = 1 AND grp > 0),
    rules AS (
      SELECT domain, grp, directive AS rule, value AS pattern,
             CAST(length(value) AS BIGINT) AS pat_len
      FROM grouped WHERE is_ua = 0 AND value <> '' AND grp > 0)
    SELECT a.domain, a.agent, r.rule, r.pattern, r.pat_len
    FROM agents a JOIN rules r ON a.domain = r.domain AND a.grp = r.grp
    """


def apply_robots_oracle_sql(
    urls_sql: str, robots_sql: str, agent: str = "aci-bot"
) -> str:
    """Mirror of :func:`apply_robots` (urls CTE must expose url)."""
    agent = agent.lower()
    return f"""
    WITH urls AS ({urls_sql}),
    all_rules AS ({parse_robots_oracle_sql(robots_sql)}),
    rl0 AS (
      SELECT *,
        CASE WHEN pattern LIKE '%$' THEN substring(pattern, 1, length(pattern) - 1)
             ELSE pattern END AS body,
        (pattern LIKE '%$') AS anchored
      FROM all_rules WHERE agent IN ('{agent}', '*')),
    rl AS (
      SELECT domain, agent, rule, pattern, pat_len,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(body,
          '\\\\', '\\\\\\\\', 'g'), '%', '\\\\%', 'g'), '_', '\\\\_', 'g'),
          '\\*', '%', 'g')
        || CASE WHEN anchored THEN '' ELSE '%' END AS like_pat
      FROM rl0),
    has_exact AS (SELECT DISTINCT domain FROM rl WHERE agent = '{agent}'),
    governing AS (
      SELECT rl.* FROM rl JOIN has_exact USING (domain)
      WHERE rl.agent = '{agent}'
      UNION ALL
      SELECT rl.* FROM rl ANTI JOIN has_exact USING (domain)
      WHERE rl.agent = '*'),
    u AS (
      SELECT urls.*,
        -- ADVICE r5: mirror domains.host_col EXACTLY (strip ':port' and
        -- leading 'userinfo@'), not the authority regex '[^/?#]+' which
        -- keeps both and can match a different robots domain
        {host_sql_expr("url")} AS _dom,
        CASE WHEN regexp_extract(url, '^https?://([^/?#]+)([^?#]*)', 2) = ''
             THEN '/' ELSE regexp_extract(url,
               '^https?://([^/?#]+)([^?#]*)', 2) END AS _path
      FROM urls),
    cand AS (
      SELECT u.*, g.rule, g.pattern, g.pat_len
      FROM u LEFT JOIN governing g
        ON u._dom = g.domain AND u._path LIKE g.like_pat ESCAPE '\\'),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY url
        ORDER BY pat_len DESC NULLS LAST, rule ASC, pattern ASC) AS rn
      FROM cand)
    SELECT * EXCLUDE (rn, rule, pattern, pat_len, _dom, _path),
           coalesce(rule, 'allow') = 'allow' AS robots_allowed,
           coalesce(rule, 'no_match') AS matched_rule,
           pattern AS matched_pattern
    FROM ranked WHERE rn = 1
    """


def robots_sitemaps(
    robots: DataFrame,
    domain_col: str = "domain",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """→ (domain, sitemap_url): the ``Sitemap:`` directives of each
    robots.txt (sitemaps.org protocol §"informing search engine
    crawlers"; RFC 9309 passes unknown lines through — Sitemap is the
    canonical one). This is the missing link in the crawl chain:
    robots_sitemaps → operators/sitemaps.parse_sitemap →
    changed-since recrawl, so URL discovery starts from the politeness
    file the crawler fetched anyway.

    Per the protocol: the directive is case-insensitive, its value is an
    ABSOLUTE url (relative values are ignored as malformed), it is
    independent of user-agent groups (can appear anywhere in the file),
    and duplicates collapse. One codegen split+explode per file — no
    shuffle beyond the final distinct."""
    line = F.explode(
        F.split(F.col(txt_col), "\r?\n")
    ).alias("line")
    lines = robots.select(F.col(domain_col).alias("domain"), line)
    url = F.trim(
        F.regexp_extract(
            F.col("line"), r"(?i)^\s*sitemap\s*:\s*(.*?)\s*$", 1
        )
    )
    return (
        lines.select("domain", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike("^https?://"))
        .distinct()
    )


def robots_sitemaps_oracle_sql(robots_sql: str) -> str:
    """DuckDB mirror: same line split, same case-insensitive directive,
    same absolute-url gate."""
    return f"""
    WITH r AS ({robots_sql}),
    lines AS (
      SELECT domain, unnest(string_split_regex(robots_txt, '\r?\n')) AS line
      FROM r),
    vals AS (
      SELECT domain,
             trim(regexp_extract(line, '(?i)^\\s*sitemap\\s*:\\s*(.*?)\\s*$', 1))
               AS sitemap_url
      FROM lines)
    SELECT DISTINCT domain, sitemap_url
    FROM vals
    WHERE regexp_matches(sitemap_url, '^https?://')
    """
