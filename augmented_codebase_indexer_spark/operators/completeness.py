"""Class-completeness estimation — capture-recapture over multi-source
entity sightings.

"How complete is the KG's coverage of class C?" is unanswerable by
counting alone: the entities nobody extracted are invisible. The
species-richness literature answers it from the CAPTURE-FREQUENCY
profile (Chao, Scand. J. Stat. 1984; applied to KGs by Luggen et al.
ISWC'19 non-parametric class-completeness estimation, and to
crowdsourced enumeration by Trushkowsky et al. ICDE'13): treat each
(entity, source) observation as a capture, let ``f1``/``f2`` be the
number of entities captured by exactly one/two distinct sources, and
estimate the true class size with the bias-corrected Chao1 lower bound

    chao1 = S_obs + f1·(f1−1) / (2·(f2+1))

which is defined even when ``f2 = 0`` (the raw form f1²/(2·f2) is
not). ``completeness = S_obs / chao1`` is then the fraction of the
class the pipeline has already seen, and the Good-Turing mass
``f1 / N`` (Good, Biometrika 1953) estimates the probability the NEXT
capture is a never-seen entity — the "is another crawl round worth
it" signal the crawl-budget tier wants per class.

Integer discipline: captures dedup to distinct (class, entity, src);
every output is BIGINT by construction. The Chao1 correction term is
computed in UNITS (``f1·(f1−1) DIV (2·(f2+1))``) — truncating at unit
grain keeps the largest intermediate at f1², safe to f1 ≈ 3·10^9,
where a micro-grain intermediate would overflow BIGINT at f1 ≈ 10^6.
``completeness_micro`` divides by the unit-grain estimate, so its
truncation error is < 1/chao1 relative — sub-micro for any class
large enough for the estimator to be meaningful.

Scale shape at 10^12 documents: sightings dedup at (class, entity,
src) grain, then ONE (class, entity) aggregate (map-side combined —
source ids die at the combiner) and ONE class-grain fold to
class-vocabulary rows. No window, no join.

Reference anchor: the reference reports per-kind symbol counts as
index-coverage statistics (`core/symbols`); this adds the estimator
for what those counts are missing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def class_completeness(sightings: DataFrame) -> DataFrame:
    """sightings(class, entity, src) → one row per class:
    (class, s_obs, n_captures, f1, f2, chao1_est, completeness_micro,
    unseen_mass_micro)."""
    cap = sightings.select("class", "entity", "src").distinct()
    per_ent = cap.groupBy("class", "entity").agg(
        F.count("*").cast("long").alias("n_src")
    )
    prof = per_ent.groupBy("class").agg(
        F.count("*").cast("long").alias("s_obs"),
        F.sum("n_src").alias("n_captures"),
        F.sum((F.col("n_src") == 1).cast("long")).alias("f1"),
        F.sum((F.col("n_src") == 2).cast("long")).alias("f2"),
    )
    chao = "s_obs + f1 * (f1 - 1) DIV (2 * (f2 + 1))"
    return prof.selectExpr(
        "class", "s_obs", "n_captures", "f1", "f2",
        f"{chao} AS chao1_est",
        f"s_obs * {MICRO} DIV ({chao}) AS completeness_micro",
        f"f1 * {MICRO} DIV n_captures AS unseen_mass_micro",
    )


def class_completeness_oracle_sql(sightings_sql: str) -> str:
    """DuckDB mirror of :func:`class_completeness` — identical integer
    arithmetic (``//`` is DuckDB's truncating DIV)."""
    chao = "s_obs + f1 * (f1 - 1) // (2 * (f2 + 1))"
    return f"""
    WITH cap AS (SELECT DISTINCT class, entity, src FROM ({sightings_sql})),
    per_ent AS (
      SELECT class, entity, CAST(count(*) AS BIGINT) AS n_src
      FROM cap GROUP BY class, entity),
    prof AS (
      SELECT class,
             CAST(count(*) AS BIGINT) AS s_obs,
             sum(n_src) AS n_captures,
             CAST(sum(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN n_src = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM per_ent GROUP BY class)
    SELECT class, s_obs, n_captures, f1, f2,
           {chao} AS chao1_est,
           s_obs * {MICRO} // ({chao}) AS completeness_micro,
           f1 * {MICRO} // n_captures AS unseen_mass_micro
    FROM prof
    """
